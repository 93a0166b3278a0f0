"""Depth Pro DPT-style multires conv decoder.

Reference: ``src/model/depth_pro/layers/decoder.rs``.  5-level top-down fusion:
level 4 (lowest res) is projected and fused without a lateral; levels 3→0 fuse
the running features with a projected lateral, deconv-upsampling at every
level except 0.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from burn_depth_tpu.ops.activations import relu
from burn_depth_tpu.ops.conv import (
    conv2d,
    conv2d_nhwc,
    conv_transpose2d,
    conv_transpose2d_nhwc,
    conv_weight_to_hwio,
    convt_weight_to_hwio,
)


def init_decoder(rng: jax.Array, dims_encoder: Sequence[int], dim_decoder: int, dtype=jnp.float32) -> dict:
    """``MultiresConvDecoder::new`` (``decoder.rs:151-193``): projection convs
    (identity at level 0 when dims match, else 1x1; 3x3 for levels ≥ 1, all
    bias-free) + per-level fusion blocks (deconv everywhere but level 0)."""
    from burn_depth_tpu.models.da3.dpt import _conv_init, _convT_init

    n = len(dims_encoder)
    keys = iter(jax.random.split(rng, 8 * n + 2))
    convs: list[Optional[dict]] = []
    if dims_encoder[0] != dim_decoder:
        convs.append(_conv_init(next(keys), dim_decoder, dims_encoder[0], 1, 1, bias=False, dtype=dtype))
    else:
        convs.append(None)
    for dim in dims_encoder[1:]:
        convs.append(_conv_init(next(keys), dim_decoder, dim, 3, 3, bias=False, dtype=dtype))

    fusions = []
    for index in range(n):
        fusion = {
            "resnet1": {
                "conv1": _conv_init(next(keys), dim_decoder, dim_decoder, 3, 3, dtype=dtype),
                "conv2": _conv_init(next(keys), dim_decoder, dim_decoder, 3, 3, dtype=dtype),
            },
            "resnet2": {
                "conv1": _conv_init(next(keys), dim_decoder, dim_decoder, 3, 3, dtype=dtype),
                "conv2": _conv_init(next(keys), dim_decoder, dim_decoder, 3, 3, dtype=dtype),
            },
            "deconv": (
                _convT_init(next(keys), dim_decoder, dim_decoder, 2, 2, bias=False, dtype=dtype)
                if index != 0
                else None
            ),
            "out_conv": _conv_init(next(keys), dim_decoder, dim_decoder, 1, 1, dtype=dtype),
        }
        fusions.append(fusion)
    return {"convs": convs, "fusions": fusions}


def decoder_to_nhwc(params: dict) -> dict:
    """Serving-layout transform: convert every decoder conv weight to HWIO
    and mark with the ``weight_hwio`` key.  ``decoder_forward`` detects the
    layout and runs NHWC end-to-end (the TPU's native feature-minor conv
    layout) with one transpose at entry/exit; checkpoints keep torch NCHW."""

    def cv(p):
        return None if p is None else {"weight_hwio": conv_weight_to_hwio(p["weight"]), "bias": p.get("bias")}

    def cvt(p):
        return None if p is None else {"weight_hwio": convt_weight_to_hwio(p["weight"]), "bias": p.get("bias")}

    return {
        "convs": [cv(c) for c in params["convs"]],
        "fusions": [
            {
                "resnet1": {"conv1": cv(f["resnet1"]["conv1"]), "conv2": cv(f["resnet1"]["conv2"])},
                "resnet2": {"conv1": cv(f["resnet2"]["conv1"]), "conv2": cv(f["resnet2"]["conv2"])},
                "deconv": cvt(f["deconv"]),
                "out_conv": cv(f["out_conv"]),
            }
            for f in params["fusions"]
        ],
    }


def fold_decoder_outconv(params: dict) -> dict:
    """Serving transform: fold each fusion block's 1x1 ``out_conv`` into the
    preceding ``deconv`` (``decoder.rs:119-134`` applies them back-to-back
    with nothing between — one linear map).  ``W'[c,o',·,·] = Σ_o
    Wd[c,o,·,·]·Wout[o',o]``; the out_conv bias moves onto the deconv (plus
    ``Wout @ bd`` if the deconv ever carries one).  Removes a 256-ch 1x1 conv
    at the UPSAMPLED resolution per level (~100 GFLOP total at 1536²).
    Level 0 has no deconv and keeps its out_conv.  NCHW trees only."""
    f32 = jnp.float32

    def fold(fusion):
        if fusion["deconv"] is None or "weight" not in fusion["deconv"]:
            return fusion
        wd = fusion["deconv"]["weight"].astype(f32)  # [I, O, kh, kw]
        wout = fusion["out_conv"]["weight"].astype(f32)  # [O', O, 1, 1]
        dtype = fusion["deconv"]["weight"].dtype
        w_new = jnp.einsum("iokl,po->ipkl", wd, wout[:, :, 0, 0])
        b_new = fusion["out_conv"].get("bias")
        b_new = None if b_new is None else b_new.astype(f32)
        bd = fusion["deconv"].get("bias")
        if bd is not None:
            thru = jnp.einsum("po,o->p", wout[:, :, 0, 0], bd.astype(f32))
            b_new = thru if b_new is None else b_new + thru
        out = dict(fusion)
        out["deconv"] = {
            "weight": w_new.astype(dtype),
            "bias": None if b_new is None else b_new.astype(dtype),
        }
        out["out_conv"] = None
        return out

    return {"convs": params["convs"], "fusions": [fold(f) for f in params["fusions"]]}


def _pallas_conv3_mode() -> str:
    """``BDT_CONV3_PALLAS``: "1" routes every NHWC 3x3 through the Pallas
    kernel (in-context REJECTED, BENCH.md); "head0" routes only the depth
    head's 256->128 conv0 @768² — the one conv where the kernel beat XLA
    isolated (6.45 vs 9.07 ms) without the pathological 1536² O=32 case."""
    import os

    return os.environ.get("BDT_CONV3_PALLAS", "0")


def _pallas_conv3() -> bool:
    return _pallas_conv3_mode() == "1"


def _wino_conv3() -> bool:
    """``BDT_CONV3_WINO=1``: route NHWC 3x3 stride-1 convs through the
    Winograd F(2x2,3x3) Pallas kernel (``ops/winograd3x3_pallas.py``) —
    2.25x fewer MXU FLOPs; serving-tier numerics (bf16 transforms)."""
    import os

    return os.environ.get("BDT_CONV3_WINO", "0") == "1"


def _wino_kwargs() -> dict:
    """Tile/C-block knobs for the Winograd route: ``BDT_CONV3_WINO_TILE=HxW``
    (spatial tile) and ``BDT_CONV3_WINO_CBLK=N`` (C-blocked accumulation —
    the innermost-grid C walk that frees VMEM for larger tiles; see
    ``ops/winograd3x3_pallas.py``)."""
    import os

    kw: dict = {}
    tile = os.environ.get("BDT_CONV3_WINO_TILE")
    if tile:
        parts = tile.lower().split("x")
        if len(parts) != 2 or not all(p.isdigit() for p in parts):
            raise ValueError(
                f"BDT_CONV3_WINO_TILE={tile!r} — expected HxW, e.g. '16x128'"
            )
        kw["tile_h"], kw["tile_w"] = int(parts[0]), int(parts[1])
    cblk = os.environ.get("BDT_CONV3_WINO_CBLK")
    if cblk:
        if not cblk.isdigit() or int(cblk) <= 0:
            raise ValueError(
                f"BDT_CONV3_WINO_CBLK={cblk!r} — expected a positive integer"
            )
        kw["c_block"] = int(cblk)
    return kw


def _wino_ok(x: jnp.ndarray) -> bool:
    """Wino route gate: even spatial dims and >= BDT_CONV3_WINO_MIN (default
    384 — the isolated probe's crossover; small levels are cheap anyway and
    each extra shape costs a fresh Mosaic compile)."""
    import os

    mn = int(os.environ.get("BDT_CONV3_WINO_MIN", "384"))
    h, w = x.shape[1], x.shape[2]
    return h % 2 == 0 and w % 2 == 0 and min(h, w) >= mn


def _cv(x: jnp.ndarray, p: dict, padding=0) -> jnp.ndarray:
    if "weight_hwio" in p:
        w = p["weight_hwio"]
        is3 = w.shape[0] == 3 and w.shape[1] == 3 and padding == 1
        if is3 and _wino_conv3() and _wino_ok(x):
            from burn_depth_tpu.ops.winograd3x3_pallas import conv3x3_wino_pallas

            return conv3x3_wino_pallas(x, w, p.get("bias"), **_wino_kwargs())
        if is3 and _pallas_conv3():
            from burn_depth_tpu.ops.conv3x3_pallas import conv3x3_nhwc_pallas

            return conv3x3_nhwc_pallas(x, w, p.get("bias"))
        return conv2d_nhwc(x, w, p.get("bias"), padding=padding)
    return conv2d(x, p["weight"], p.get("bias"), padding=padding)


def _residual_block(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """``ResidualBlock`` (``decoder.rs:74-87``): relu→conv→relu→conv + skip.
    (No batch-norm variant is ever instantiated by the model.)

    NHWC + ``BDT_CONV3_PALLAS=1``: both convs run the Pallas 3x3 kernel with
    the relu pre-activations and the ``+ x`` skip fused into the kernel
    epilogues (``ops/conv3x3_pallas.py``) — no elementwise passes leave VMEM.
    """
    if "weight_hwio" in p["conv1"] and _wino_conv3() and _wino_ok(x):
        from burn_depth_tpu.ops.winograd3x3_pallas import conv3x3_wino_pallas

        out = conv3x3_wino_pallas(x, p["conv1"]["weight_hwio"], p["conv1"].get("bias"),
                                  relu_in=True, **_wino_kwargs())
        return conv3x3_wino_pallas(out, p["conv2"]["weight_hwio"], p["conv2"].get("bias"),
                                   relu_in=True, residual=x, **_wino_kwargs())
    if "weight_hwio" in p["conv1"] and _pallas_conv3():
        from burn_depth_tpu.ops.conv3x3_pallas import conv3x3_nhwc_pallas

        out = conv3x3_nhwc_pallas(x, p["conv1"]["weight_hwio"], p["conv1"].get("bias"),
                                  relu_in=True)
        return conv3x3_nhwc_pallas(out, p["conv2"]["weight_hwio"], p["conv2"].get("bias"),
                                   relu_in=True, residual=x)
    out = relu(x)
    out = _cv(out, p["conv1"], padding=1)
    out = relu(out)
    out = _cv(out, p["conv2"], padding=1)
    return out + x


def _fusion(p: dict, x0: jnp.ndarray, x1: Optional[jnp.ndarray]) -> jnp.ndarray:
    """``FeatureFusionBlock2d::forward`` (``decoder.rs:119-134``): note the
    lateral goes through resnet1, the running features do not."""
    x = x0
    if x1 is not None:
        x = x + _residual_block(p["resnet1"], x1)
    x = _residual_block(p["resnet2"], x)
    if p["deconv"] is not None:
        if "weight_hwio" in p["deconv"]:
            x = conv_transpose2d_nhwc(x, p["deconv"]["weight_hwio"], p["deconv"].get("bias"), stride=2)
        else:
            x = conv_transpose2d(x, p["deconv"]["weight"], p["deconv"].get("bias"), stride=2)
    if p["out_conv"] is None:  # folded into the deconv (fold_decoder_outconv)
        return x
    return _cv(x, p["out_conv"])


def decoder_forward(params: dict, encodings: Sequence[jnp.ndarray]):
    """``MultiresConvDecoder::forward_with_debug`` (``decoder.rs:195-222``).

    Returns ``(features, lowres_features, fusion_outputs)`` where
    ``fusion_outputs`` is per-level (level-0 first), matching the reference's
    debug taps used by the parity harness.
    """
    n = len(encodings)
    if n != len(params["convs"]):
        raise ValueError(f"got {n} encoder levels, expected {len(params['convs'])}")
    nhwc = any(c is not None and "weight_hwio" in c for c in params["convs"])
    if nhwc:
        encodings = [jnp.transpose(e, (0, 2, 3, 1)) for e in encodings]

    def project(level, x):
        conv = params["convs"][level]
        if conv is None:
            return x
        w = conv.get("weight_hwio", conv.get("weight"))
        k = w.shape[0] if "weight_hwio" in conv else w.shape[-1]
        return _cv(x, {**conv, "bias": None}, padding=(k - 1) // 2)

    features = project(n - 1, encodings[n - 1])
    lowres_features = features
    fusion_outputs = []
    features = _fusion(params["fusions"][n - 1], features, None)
    fusion_outputs.append(features)
    for level in range(n - 2, -1, -1):
        projected = project(level, encodings[level])
        features = _fusion(params["fusions"][level], features, projected)
        fusion_outputs.append(features)
    fusion_outputs.reverse()
    if nhwc:
        to_nchw = lambda t: jnp.transpose(t, (0, 3, 1, 2))  # noqa: E731
        features = to_nchw(features)
        lowres_features = to_nchw(lowres_features)
        fusion_outputs = [to_nchw(t) for t in fusion_outputs]
    return features, lowres_features, fusion_outputs
