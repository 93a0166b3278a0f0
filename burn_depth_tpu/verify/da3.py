"""DA3 parity replay (reference ``example/da3_small_correctness.rs`` and the
DA3-large path of ``correctness.rs:991-1118``).

Golden schema = ``tools/correctness_da3.py`` dumps: ``depth``,
``metric_input``, ``depth_confidence``, ``ray``, ``ray_confidence``,
``pose_encoding``, ``extrinsics``, ``intrinsics``,
``backbone_tokens.stage{i}``, ``aux_stage_necks.stage{i}``, ``aux_logits``,
``aux_head_input``.

Bisection layers: full pass from the embedded ``metric_input`` (bit-identical
input, ``da3_small_correctness.rs:68-88``), then head-only replay from the
golden backbone tokens (``:279-326``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from burn_depth_tpu.verify.stats import ParityReport, StageStats, compute_stats

# correctness.rs:1109-1118 — DA3 hard gate.
DA3_THRESHOLDS = {"mean_abs": 1e-3, "max_abs": 5e-3, "max_rel": 1e-2}


def run_da3_parity(
    model,
    golden: dict[str, np.ndarray],
    thresholds: Optional[dict] = None,
) -> ParityReport:
    th = {**DA3_THRESHOLDS, **(thresholds or {})}
    rel_floor = th.get("rel_floor", 1e-6)
    stages: list[StageStats] = []
    failures: list[str] = []
    skipped: list[str] = []

    def compare(name, ours, golden_arr=None, gate=False):
        g = golden.get(name) if golden_arr is None else golden_arr
        if g is None:
            skipped.append(name)
            return
        if ours is None:
            skipped.append(f"{name} (model emits none)")
            return
        s = compute_stats(
            name, np.asarray(ours, np.float32), np.asarray(g, np.float32), rel_floor=rel_floor
        )
        stages.append(s)
        if gate and not s.within(th["mean_abs"], th["max_abs"], th["max_rel"]):
            failures.append(
                f"{name}: mean={s.mean_abs:.6f} max={s.max_abs:.6f} rel={s.max_rel:.6f} "
                f"exceeds ({th['mean_abs']}, {th['max_abs']}, {th['max_rel']})"
            )

    x = jnp.asarray(golden["metric_input"])
    inf, trace = model.infer_with_trace(x)

    # Every compared stage gates — the reference applies its tolerances
    # per-feature, not just on depth (``correctness.rs:875,887-897`` and the
    # per-stage stats of ``da3_small_correctness.rs:89-138``).
    compare("depth", inf.depth, gate=True)
    compare("depth_confidence", inf.depth_confidence, gate=True)
    compare("ray", inf.aux, gate=True)
    compare("ray_confidence", inf.aux_confidence, gate=True)
    compare("pose_encoding", inf.pose_encoding, gate=True)
    compare("extrinsics", inf.extrinsics, gate=True)
    compare("intrinsics", inf.intrinsics, gate=True)

    for i, tok in enumerate(trace.backbone_tokens):
        compare(f"backbone_tokens.stage{i}", tok, gate=True)
    if trace.aux_stage_necks is not None:
        for i, neck in enumerate(trace.aux_stage_necks):
            compare(f"aux_stage_necks.stage{i}", neck, gate=True)
    compare("aux_logits", trace.aux_logits, gate=True)
    compare("aux_head_input", trace.aux_head_input, gate=True)

    # --- head-only replay from golden backbone tokens --------------------
    # (the reference's bisection layer, ``da3_small_correctness.rs:279-326``)
    n_stages = len(trace.backbone_tokens)
    token_keys = [f"backbone_tokens.stage{i}" for i in range(n_stages)]
    if all(k in golden for k in token_keys) and "depth" in golden:
        h, w = x.shape[-2:]
        tokens = [jnp.asarray(golden[k]) for k in token_keys]
        head_out = model.infer_from_tokens(tokens, int(h), int(w))
        compare("head_only_depth", head_out.depth, golden_arr=golden["depth"], gate=True)
        if head_out.depth_confidence is not None and "depth_confidence" in golden:
            compare(
                "head_only_depth_confidence",
                head_out.depth_confidence,
                golden_arr=golden["depth_confidence"],
                gate=True,
            )
        if head_out.aux is not None and "ray" in golden:
            compare("head_only_ray", head_out.aux, golden_arr=golden["ray"], gate=True)
        if head_out.aux_confidence is not None and "ray_confidence" in golden:
            compare(
                "head_only_ray_confidence",
                head_out.aux_confidence,
                golden_arr=golden["ray_confidence"],
                gate=True,
            )

    return ParityReport(stages=stages, failures=failures, skipped=skipped)
