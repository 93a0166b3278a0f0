"""End-to-end serving-tier accuracy gates (VERDICT r2 #1).

The north-star target couples throughput WITH accuracy (``BASELINE.json``:
>= 10 img/s AND abs-rel depth deviation < 1e-3; reference acceptance gate
``/root/reference/example/correctness.rs:887-897``).  The serving tiers
(tanh-GELU, int8-static ViT linears, bf16 dequant epilogue) approximate —
these tests hold their END-TO-END depth drift to measured, calibrated
bounds so a regression in quantization, calibration, activation forms, or
tail fusion fails a hard gate instead of hiding behind a faster headline:

* ``bench.py``'s DEFAULT tier must be one whose measured drift record
  (``benchmarks/tier_drift.json``, produced on hardware by
  ``tools/tier_drift.py``) passes the <1e-3 clause.
* the thin-leg serving-tier drift is recomputed here on CPU at the real
  flagship geometry (HF-oracle-weighted thin model,
  ``tests/hf_depth_pro_oracle.py``) and held to ~4x the round-3 measured
  values — tight enough that a broken per-channel scale or calibration
  order shows up, loose enough for toolchain jitter.

Caveat recorded in BENCH.md: random weights produce small pre-activation
ranges, so both the tanh and int8 drifts measured offline UNDERESTIMATE
real-checkpoint drift; re-running ``tools/tier_drift.py`` against imported
upstream weights is on the real-weights-day checklist (PARITY.md).
"""

import importlib.util
import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

# round-3 thin-leg measurements (tools/tier_drift.py --leg thin --platform
# cpu, BENCH.md round 3): serving tier f32_tanh_int8_fused inv_mean_abs
# 6.3e-7, abs_rel_mean 4.9e-5, fov_deg_abs 2.0e-6.  Bounds ~4x.
CALIBRATED_BOUNDS = {
    "inv_mean_abs": 3e-6,
    "abs_rel_mean": 2e-4,
    "fov_deg_abs": 1e-4,
}


def _load_module(name: str, path: Path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bench():
    return _load_module("bench", REPO / "bench.py")


def test_drift_record_exists_with_required_stats():
    record = json.loads((REPO / "benchmarks" / "tier_drift.json").read_text())
    assert "thin" in record
    for name, leg in record.items():
        assert leg["baseline"] == "f32_erf_unfused"
        assert "_erf" in leg["parity_tier"]
        keys = ["inv_mean_abs", "inv_max_abs", "abs_rel_mean"]
        if not name.startswith("da3"):
            keys.append("fov_deg_abs")  # DA3 reports conf_mean_abs instead
        for tier, stats in leg["tiers"].items():
            for key in keys:
                assert key in stats, (name, tier, key)
                assert key in stats["vs_parity"], (name, tier, key)


def test_bench_default_tier_is_accuracy_gated(bench, monkeypatch):
    """The headline bench may only default to a tier whose measured drift
    passes the north-star clause; with no passing tier (or no record) it
    must fall back to the exact-GELU parity tier."""
    monkeypatch.delenv("BENCH_INT8", raising=False)
    monkeypatch.delenv("BDT_GELU", raising=False)
    mode, gelu, suffix, reason = bench.select_tier()

    record = json.loads((REPO / "benchmarks" / "tier_drift.json").read_text())
    tiers = record["thin"]["tiers"]  # the f32-resolution leg gates (bench.select_tier)
    selected = [row for row in bench.TIER_LADDER if (row[0], row[1]) == (mode, gelu)]
    if "parity tier" in reason:
        assert (mode, gelu, suffix) == ("0", "erf", "")
    else:
        assert selected, f"selected tier ({mode}, {gelu}) not in ladder"
        name = selected[0][2].replace("bf16", "f32")
        assert bench.tier_passes_accuracy(tiers[name]), (name, tiers[name], reason)
    # and no FASTER ladder row than the selected one passes the gate
    for row in bench.TIER_LADDER:
        if (row[0], row[1]) == (mode, gelu):
            break
        rec = tiers.get(row[2].replace("bf16", "f32"))
        assert rec is None or not bench.tier_passes_accuracy(rec), (
            f"faster tier {row[2]} passes the gate but was not selected"
        )


def test_env_override_still_wins(bench, monkeypatch):
    monkeypatch.setenv("BENCH_INT8", "static")
    mode, gelu, suffix, reason = bench.select_tier()
    assert (mode, gelu, suffix) == ("static", "tanh", "_int8")
    assert reason == "env override"
    monkeypatch.setenv("BENCH_INT8", "0")
    monkeypatch.setenv("BDT_GELU", "tanh")
    assert bench.select_tier()[:3] == ("0", "tanh", "_tanh")


def test_thin_serving_tier_drift_within_calibrated_bounds():
    """Recompute the serving tier's end-to-end drift (f32 exact baseline vs
    tanh+int8-static+fused tier) on CPU at flagship geometry and hold it to
    the calibrated bounds.  ~3 thin-model forwards."""
    sys.path.insert(0, str(REPO / "tools"))
    td = _load_module("tier_drift_tool", REPO / "tools" / "tier_drift.py")

    base = td.build_base("thin")
    x = td.load_input(REPO / "assets" / "image" / "test.png", base.config.img_size)
    ref = td.run_tier(base, "f32_erf", x)
    tier = td.run_tier(base, "f32_tanh_int8_fused", x)
    d = td.drift(ref, tier)
    for key, bound in CALIBRATED_BOUNDS.items():
        assert d[key] <= bound, f"{key}={d[key]:.3e} exceeds calibrated bound {bound:.0e} ({d})"


def test_width_scaling_drift_sweep_bounds_the_extrapolation():
    """VERDICT r3 #3: the headline gate's decisive int8 number was measured
    on an embed-dim-32 thin model; per-channel int8 outlier behavior grows
    with width, so the committed record must show the drift TREND over
    32→256 and the largest width must still clear the north-star clause
    with margin.

    The sweep legs are O(1)-signal conditioned (``--o1-signal``): a
    random-init thin model's output scale collapses toward zero at larger
    widths (w64 raw: rel coverage 5e-6 — abs-rel becomes a ~10-pixel
    artifact), so every width is conditioned into the same O(1) positive
    inverse-depth / ~50° FOV regime real checkpoints occupy, and the
    cross-width comparison is made in ONE fixed regime."""
    record = json.loads((REPO / "benchmarks" / "tier_drift.json").read_text())
    widths = sorted(int(k[6:]) for k in record if k.startswith("thin_w"))
    # the sweep must span at least 32→256 (committed: 32/64/128/256/512)
    assert widths[0] == 32 and widths[-1] >= 256, widths
    for w in widths:
        leg = record[f"thin_w{w}"]
        assert leg.get("o1_signal") is True, f"thin_w{w} not O(1)-conditioned"
        serving = leg["tiers"]["f32_tanh_int8_fused"]
        # the rel guard must actually cover the image in this regime —
        # otherwise the abs-rel stat is a few-pixel artifact again
        assert serving["rel_coverage"] > 0.5, (w, serving["rel_coverage"])
    largest = record[f"thin_w{widths[-1]}"]["tiers"]["f32_tanh_int8_fused"]
    drift = largest["vs_parity"]["abs_rel_mean"]
    # The REAL ViT-L width (w1024) is now measured directly: 7.2e-4 abs-rel
    # — the clause holds by 1.39x at the real width, no extrapolation left.
    # Gate: the scale-free clause stat must pass at the widest leg (the
    # absolute inv stat scales with the arbitrary O(1)-conditioning target;
    # see core/tiers.tier_passes_accuracy).
    assert drift < 1e-3, (
        f"width-{widths[-1]} serving-tier drift {drift:.2e} breaks the "
        "north-star <1e-3 clause at the widest measured width — the int8 "
        "tier may no longer carry the headline"
    )
    if widths[-1] >= 1024:
        # real-width point: record the thin margin explicitly so a future
        # regression that halves it fails loudly here, not silently in docs
        assert drift == pytest.approx(7.21e-4, rel=0.5)


# round-3 DA3 measurements (tools/tier_drift.py --model da3 --leg thin,
# metric-large 518², excited layerscale): f32_tanh_int8 inv_mean_abs 1.2e-4,
# abs_rel_mean 1.4e-4.  Bounds ~4x — still inside the 1e-3 clause.
DA3_CALIBRATED_BOUNDS = {"inv_mean_abs": 5e-4, "abs_rel_mean": 6e-4}


def test_da3_serving_tier_drift_within_calibrated_bounds():
    """Same gate for the DA3 family: the real metric-large config at 518²
    (affordable on CPU), f32 exact baseline vs the tanh+int8-static serving
    tier.  Random init keeps layerscale at its 1e-5 DINOv2 init, which
    zeroes every block's contribution — build_base excites it to O(0.1-1)
    (trained-checkpoint scale) so approximation error actually flows."""
    sys.path.insert(0, str(REPO / "tools"))
    td = _load_module("tier_drift_tool_da3", REPO / "tools" / "tier_drift.py")

    base = td.build_base("thin", "da3")
    x = td.load_input(REPO / "assets" / "image" / "test.png", base.config.image_size, "da3")
    ref = td.run_tier(base, "f32_erf", x, model="da3")
    tier = td.run_tier(base, "f32_tanh_int8", x, model="da3")
    d = td.drift_da3(ref, tier)
    for key, bound in DA3_CALIBRATED_BOUNDS.items():
        assert d[key] <= bound, f"{key}={d[key]:.3e} exceeds calibrated bound {bound:.0e} ({d})"


def test_outlier_stress_record_mixed_tier_recovers_the_gate():
    """The committed outlier-stress frontier (VERDICT r4 #1b, BENCH.md round
    5; produced by ``tools/tier_drift.py --outliers``):

    * concentrated outliers (the real trained-ViT pattern): full int8
      BREAKS the <1e-3 clause and the int8mix12 rung RECOVERS it — the
      graceful-degradation path exists and is measured;
    * uniform worst case (every block poisoned at 64x): no int8 variant
      recovers — honesty that the fallback there is tanh-only;
    * moderate outliers (16x): full int8 still holds.

    Also pins the file separation: stress legs must never sit in the gate
    record the tier selector reads."""
    stress = json.loads((REPO / "benchmarks" / "outlier_stress.json").read_text())
    gate = json.loads((REPO / "benchmarks" / "tier_drift.json").read_text())
    assert not any("_out" in k for k in gate), "stress legs leaked into the gate record"

    def rel(leg, tier):
        return stress[leg]["tiers"][tier]["vs_parity"]["abs_rel_mean"]

    # concentrated: break -> recover
    assert rel("thin_w256_out8x64b2", "f32_tanh_int8_fused") > 1e-3
    assert rel("thin_w256_out8x64b2", "f32_tanh_int8mix12_fused") < 1e-3
    assert (
        rel("thin_w256_out8x64b2", "f32_tanh_int8mix12_fused")
        < 0.5 * rel("thin_w256_out8x64b2", "f32_tanh_int8_fused")
    )
    # uniform worst case: nothing recovers (every int8 variant over the line)
    uni = stress["thin_w256_out8x64"]["tiers"]
    for tier, r in uni.items():
        if "int8" in tier:
            assert r["vs_parity"]["abs_rel_mean"] > 1e-3, tier
    # moderate magnitude: full int8 holds
    assert rel("thin_w256_out8x16", "f32_tanh_int8_fused") < 1e-3
    # every stress leg is o1-conditioned and labeled with its injection
    for leg, r in stress.items():
        assert r.get("o1_signal") and "outliers" in r, leg
