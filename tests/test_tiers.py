"""Shared accuracy-gated tier selection (burn_depth_tpu/core/tiers.py).

One gate, one ladder, three consumers — bench.py, the README status
generator, and the serving CLIs' --tier auto.  These tests pin (a) the
gate semantics against the committed drift record, (b) the fallback
behavior with no/failing records, and (c) the family mapping and the CLI
helper's quantize/env effects."""

import json
from pathlib import Path

import pytest

from burn_depth_tpu.core.tiers import (
    DA3_TIER_NAMES,
    TIER_LADDER,
    apply_tier_choice,
    family_of,
    select_serving_tier,
)

REPO = Path(__file__).resolve().parent.parent


def _record():
    return json.loads((REPO / "benchmarks" / "tier_drift.json").read_text())


def test_committed_record_selects_gated_tiers_per_family():
    rec = _record()
    dp = select_serving_tier("depth_pro", rec)
    assert dp.tier_name in [n for _m, _g, n, _s in TIER_LADDER]
    assert dp.drift is not None and dp.drift <= 1e-3
    for family in ("da3", "da3_small"):
        c = select_serving_tier(family, rec)
        assert c.tier_name in DA3_TIER_NAMES
        assert c.drift is not None and c.drift <= 1e-3
    # measured-ms ranking with simpler-tier tie-break: DA3-small's int8 is
    # speed-NEUTRAL (8.3 vs 8.3 ms committed), so auto must pick bf16+tanh
    # (no startup quantization for zero gain) — BENCH.md round-3 guidance
    small = select_serving_tier("da3_small", rec)
    assert small.tier_name == "bf16_tanh" and not small.int8


def test_no_record_falls_back_to_parity():
    c = select_serving_tier("depth_pro", record={})
    assert c.tier_name.endswith("erf_fused") and not c.int8 and c.gelu == "erf"
    assert c.drift is None and "parity" in c.reason


def test_failing_gate_falls_back_to_parity_without_fabricated_drift():
    rec = _record()
    # poison every thin-leg tier so nothing passes
    bad = json.loads(json.dumps(rec))
    for leg in bad:
        if "tiers" in bad[leg]:
            for t in bad[leg]["tiers"].values():
                t.setdefault("vs_parity", {})["abs_rel_mean"] = 1.0
    c = select_serving_tier("depth_pro", bad)
    assert not c.int8 and c.gelu == "erf"
    assert c.drift is None  # never a fabricated zero-drift "pass"
    assert "no tier passed" in c.reason


def test_widest_thin_leg_gates_depth_pro():
    rec = json.loads(json.dumps(_record()))
    # committed record passes; poisoning ONLY the widest thin_w leg must
    # knock the int8 tier out (width-scaling guard, BENCH.md round 4)
    widest = max(int(k[6:]) for k in rec if k.startswith("thin_w"))
    wide = rec[f"thin_w{widest}"]["tiers"]
    wide["f32_tanh_int8_fused"]["vs_parity"]["abs_rel_mean"] = 1.0
    c = select_serving_tier("depth_pro", rec)
    assert c.tier_name != "bf16_tanh_int8_fused"


def test_unknown_family_rejected():
    with pytest.raises(ValueError):
        select_serving_tier("resnet", _record())


def test_family_of_maps_configs():
    class Head:
        dual_head = True

    class Cfg:
        head = Head()

    class Model:
        config = Cfg()

    class Wrapper:  # AnyDepthModel shape
        model = Model()

    assert family_of(Model()) == "da3_small"
    assert family_of(Wrapper()) == "da3_small"
    Head.dual_head = False
    assert family_of(Model()) == "da3"

    class DP:
        class config:
            img_size = 1536

    assert family_of(DP()) == "depth_pro"


def test_apply_tier_choice_auto_quantizes_when_gated_tier_is_int8(monkeypatch):
    calls = []

    class Head:
        dual_head = False

    class Cfg:
        head = Head()

    class FakeModel:
        config = Cfg()

        def quantize_vit(self):
            calls.append("quantize")
            return self

    monkeypatch.delenv("BDT_GELU", raising=False)
    out = apply_tier_choice(FakeModel(), "auto", log=lambda _m: None)
    # committed record gates da3 to the int8+tanh tier
    assert calls == ["quantize"]
    assert out is not None
    import os

    assert os.environ.get("BDT_GELU") == "tanh"
    monkeypatch.delenv("BDT_GELU", raising=False)


def test_apply_tier_choice_parity_and_default(monkeypatch):
    class FakeModel:
        def quantize_vit(self):  # pragma: no cover - must NOT be called
            raise AssertionError("parity/default must not quantize")

    m = FakeModel()
    assert apply_tier_choice(m, "default", log=lambda _m: None) is m
    monkeypatch.delenv("BDT_GELU", raising=False)
    assert apply_tier_choice(m, "parity", log=lambda _m: None) is m
    import os

    assert os.environ.get("BDT_GELU") == "erf"
    monkeypatch.delenv("BDT_GELU", raising=False)
    with pytest.raises(ValueError):
        apply_tier_choice(m, "nonsense", log=lambda _m: None)


def test_mixed_rung_selected_when_full_int8_fails_the_gate():
    """Graceful degradation (VERDICT r4 #1): when full int8 drifts over the
    clause (the trained-outlier scenario) but a measured int8mix rung
    passes, selection must step DOWN to the mix rung — not all the way off
    the int8 cliff to tanh-only."""
    rec = json.loads(json.dumps(_record()))
    thin = rec["thin"]["tiers"]
    widest = max(int(k[6:]) for k in rec if k.startswith("thin_w") and k[6:].isdigit())
    wide = rec[f"thin_w{widest}"]["tiers"]

    # the int8 family breaks the gate at the real width (pfc4 is int8 minus
    # a few linears — trained outliers that break one break both)
    wide["f32_tanh_int8_fused"]["vs_parity"]["abs_rel_mean"] = 2e-3
    wide["f32_tanh_int8pfc4_fused"]["vs_parity"]["abs_rel_mean"] = 2e-3
    # ...but the measured mix4 rung passes on both legs
    thin["f32_tanh_int8mix4_fused"] = {
        "vs_parity": {"abs_rel_mean": 2e-4, "inv_mean_abs": 2e-4}
    }
    wide["f32_tanh_int8mix4_fused"] = {
        "vs_parity": {"abs_rel_mean": 5e-4, "inv_mean_abs": 8e-4}
    }
    rec["flagship"]["tiers"]["bf16_tanh_int8mix4_fused"] = {"ms": 180.0}

    c = select_serving_tier("depth_pro", rec)
    assert c.tier_name == "bf16_tanh_int8mix4_fused" and c.int8

    from burn_depth_tpu.core.tiers import tier_exclude_k

    assert tier_exclude_k(c.tier_name) == 4
    assert tier_exclude_k("bf16_tanh_int8_fused") == 0
    assert tier_exclude_k("bf16_tanh_fused") == 0


def test_apply_tier_choice_mixed_rung_passes_exclude_k(monkeypatch):
    import burn_depth_tpu.core.tiers as tiers_mod

    choice = tiers_mod.TierChoice(
        "bf16_tanh_int8mix4_fused", True, "tanh", 5e-4, "test"
    )
    monkeypatch.setattr(tiers_mod, "select_serving_tier", lambda fam: choice)

    calls = {}

    class Head:
        dual_head = False

    class Cfg:
        head = Head()

    class FakeModel:
        config = Cfg()

        def quantize_vit(self, **kw):
            calls.update(kw)
            return self

    monkeypatch.delenv("BDT_GELU", raising=False)
    tiers_mod.apply_tier_choice(FakeModel(), "auto", log=lambda _m: None)
    assert calls == {"exclude_k": 4}
    monkeypatch.delenv("BDT_GELU", raising=False)
