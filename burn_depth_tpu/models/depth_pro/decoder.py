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
from burn_depth_tpu.ops.conv import conv2d, conv_transpose2d


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


def _residual_block(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """``ResidualBlock`` (``decoder.rs:74-87``): relu→conv→relu→conv + skip.
    (No batch-norm variant is ever instantiated by the model.)"""
    out = relu(x)
    out = conv2d(out, p["conv1"]["weight"], p["conv1"]["bias"], padding=1)
    out = relu(out)
    out = conv2d(out, p["conv2"]["weight"], p["conv2"]["bias"], padding=1)
    return out + x


def _fusion(p: dict, x0: jnp.ndarray, x1: Optional[jnp.ndarray]) -> jnp.ndarray:
    """``FeatureFusionBlock2d::forward`` (``decoder.rs:119-134``): note the
    lateral goes through resnet1, the running features do not."""
    x = x0
    if x1 is not None:
        x = x + _residual_block(p["resnet1"], x1)
    x = _residual_block(p["resnet2"], x)
    if p["deconv"] is not None:
        x = conv_transpose2d(x, p["deconv"]["weight"], stride=2)
    return conv2d(x, p["out_conv"]["weight"], p["out_conv"]["bias"])


def decoder_forward(params: dict, encodings: Sequence[jnp.ndarray]):
    """``MultiresConvDecoder::forward_with_debug`` (``decoder.rs:195-222``).

    Returns ``(features, lowres_features, fusion_outputs)`` where
    ``fusion_outputs`` is per-level (level-0 first), matching the reference's
    debug taps used by the parity harness.
    """
    n = len(encodings)
    if n != len(params["convs"]):
        raise ValueError(f"got {n} encoder levels, expected {len(params['convs'])}")

    def project(level, x):
        conv = params["convs"][level]
        if conv is None:
            return x
        pad = (conv["weight"].shape[-1] - 1) // 2
        return conv2d(x, conv["weight"], None, padding=pad)

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
    return features, lowres_features, fusion_outputs
