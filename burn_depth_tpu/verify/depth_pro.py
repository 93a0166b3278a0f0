"""Depth Pro parity replay (reference ``example/correctness.rs:287-904``).

Golden schema = the dump of ``tools/correctness_depth_pro.py`` (identical to
the reference tool's): ``network_input``, ``encoder_feature_{0..4}``, the
split/merge/latent encoder intermediates, ``decoder_feature``,
``decoder_lowres_feature``, ``decoder_fusion_{i}``, head stage taps,
``canonical_inverse_depth``, ``metric_depth``, ``fovx``, ``fovy``.

Replay layers (the reference's bisection strategy, ``correctness.rs:713-715``):

1. full pass from ``network_input`` (exact-input handoff — preprocessing is
   excluded from the comparison, like ``DA3_LOAD_INPUT``),
2. decoder-only from the *golden* encoder features (isolates the decoder),
3. stage-by-stage stats on every dumped intermediate.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from burn_depth_tpu.verify.stats import ParityReport, StageStats, compute_stats

# correctness.rs:887-897 (depth + per-feature bounds) — the hard gate.
DEPTH_PRO_THRESHOLDS = {
    "mean_abs": 1e-3,
    "max_abs": 5e-3,
    "max_rel": 5e-3,
    "fov_deg": 1e-3,
}

# golden key → encoder debug-dict key
_ENC_DBG_KEYS = {
    "encoder_split_x0": "split_x0",
    "encoder_split_x1": "split_x1",
    "encoder_split_x2": "split_x2",
    "encoder_latent0_tokens": "latent0_tokens",
    "encoder_latent1_tokens": "latent1_tokens",
    "encoder_latent0_merge_input": "latent0_merge_input",
    "encoder_latent1_merge_input": "latent1_merge_input",
    "encoder_merge_latent0": "latent0",
    "encoder_merge_latent1": "latent1",
    "encoder_x0_tokens": "x0_tokens",
    "encoder_x1_tokens": "x1_tokens",
    "encoder_x2_tokens": "x2_tokens",
    "encoder_merge_x0": "merged_x0",
    "encoder_merge_x1": "merged_x1",
    "encoder_merge_x2": "merged_x2",
}


def _head_debug(params: dict, x: jnp.ndarray) -> dict:
    """Head stage taps matching the golden keys (dump tool hooks on the
    Sequential: conv0, deconv, conv1-pre-relu, relu, conv_out-pre-relu)."""
    from burn_depth_tpu.ops.activations import relu
    from burn_depth_tpu.ops.conv import conv2d, conv_transpose2d

    p = params
    taps = {}
    x = conv2d(x, p["conv0"]["weight"], p["conv0"]["bias"], padding=1)
    taps["head_conv0"] = x
    x = conv_transpose2d(x, p["deconv"]["weight"], p["deconv"]["bias"], stride=2)
    taps["head_deconv"] = x
    x = conv2d(x, p["conv1"]["weight"], p["conv1"]["bias"], padding=1)
    taps["head_conv1"] = x
    x = relu(x)
    taps["head_relu"] = x
    x = conv2d(x, p["conv_out"]["weight"], p["conv_out"]["bias"])
    taps["head_pre_out"] = x
    taps["canonical_inverse_depth"] = relu(x)
    return taps


def run_depth_pro_parity(
    model,
    golden: dict[str, np.ndarray],
    thresholds: Optional[dict] = None,
) -> ParityReport:
    th = {**DEPTH_PRO_THRESHOLDS, **(thresholds or {})}
    rel_floor = th.get("rel_floor", 1e-6)
    stages: list[StageStats] = []
    failures: list[str] = []
    skipped: list[str] = []

    def compare(name, ours, gate=False, fov=False):
        if name not in golden:
            skipped.append(name)
            return
        s = compute_stats(name, np.asarray(ours, np.float32), golden[name], rel_floor=rel_floor)
        stages.append(s)
        if fov:
            if s.max_abs > th["fov_deg"]:
                failures.append(f"{name}: |diff|={s.max_abs:.6f} > {th['fov_deg']} deg")
        elif gate and not s.within(th["mean_abs"], th["max_abs"], th["max_rel"]):
            failures.append(
                f"{name}: mean={s.mean_abs:.6f} max={s.max_abs:.6f} rel={s.max_rel:.6f} "
                f"exceeds ({th['mean_abs']}, {th['max_abs']}, {th['max_rel']})"
            )

    x = jnp.asarray(golden["network_input"])

    # --- full pass with debug taps --------------------------------------
    canonical, feats, lowres, fusion_outputs, fov_deg, enc_dbg = model._forward_internal(
        model.params, x, debug=True
    )
    enc = model.params["encoder"]
    from burn_depth_tpu.models.depth_pro import encoder as enc_mod

    features, _ = enc_mod.encoder_forward(
        enc, enc["patch_encoder"], enc["image_encoder"], x, model.config
    )
    for i, f in enumerate(features):
        compare(f"encoder_feature_{i}", f, gate=True)
    for gkey, dkey in _ENC_DBG_KEYS.items():
        compare(gkey, enc_dbg[dkey])
    compare("decoder_feature", feats)
    compare("decoder_lowres_feature", lowres)
    for i, f in enumerate(fusion_outputs):
        compare(f"decoder_fusion_{i}", f)

    for name, tap in _head_debug(model.params["head"], feats).items():
        compare(name, tap, gate=(name == "canonical_inverse_depth"))

    if fov_deg is not None:
        compare("fovx", fov_deg, fov=True)
        if "fovy" in golden:
            from burn_depth_tpu.models.depth_pro.model import fovy_from_fovx_rad

            h, w = x.shape[-2:]
            fovy_deg = fovy_from_fovx_rad(fov_deg * (jnp.pi / 180.0), h, w) * (180.0 / jnp.pi)
            golden_fovy_deg = golden["fovy"] * (180.0 / np.pi)
            s = compute_stats("fovy", np.asarray(fovy_deg, np.float32), golden_fovy_deg)
            stages.append(s)
            if s.max_abs > th["fov_deg"]:
                failures.append(f"fovy: |diff|={s.max_abs:.6f} > {th['fov_deg']} deg")

    # --- metric depth (same infer math on the network input) -------------
    if "metric_depth" in golden:
        out = model._infer_fn(model.params, x)
        if golden["metric_depth"].shape[-2:] == tuple(x.shape[-2:]):
            compare("metric_depth", out.depth, gate=True)
        else:
            # golden was produced at the original image size; restore with the
            # CLI's half-pixel bilinear (the reference does the same when
            # replaying, example/inference.rs:183-250) — report-only since the
            # resize itself is outside the gated graph.
            from burn_depth_tpu.cli.infer import resize_depth_field

            gh, gw = golden["metric_depth"].shape[-2:]
            ours = resize_depth_field(np.asarray(out.depth[0], np.float32), gh, gw)[None]
            stages.append(compute_stats("metric_depth(restored)", ours, golden["metric_depth"]))

    # --- decoder isolation from golden encoder features ------------------
    # (compare_decoder_with_reference, correctness.rs:714: feeds TORCH encoder
    # features into our decoder so decoder bugs are separable from encoder drift)
    if all(f"encoder_feature_{i}" in golden for i in range(5)) and "decoder_feature" in golden:
        g_feats = [jnp.asarray(golden[f"encoder_feature_{i}"]) for i in range(5)]
        d_feats, _, _ = model.decoder_from_features(g_feats)
        stages.append(
            compute_stats(
                "decoder_only_feature", np.asarray(d_feats, np.float32), golden["decoder_feature"]
            )
        )

    return ParityReport(stages=stages, failures=failures, skipped=skipped)
