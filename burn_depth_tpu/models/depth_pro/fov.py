"""Depth Pro FOV (focal-length) network.

Reference: ``src/model/depth_pro/layers/fov.rs``.  A third ViT pass on the
0.25x input, projected and fused with downsampled decoder features, then a
4-conv head ending in a 6x6 valid conv → scalar fovx in degrees.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from burn_depth_tpu.ops.activations import relu
from burn_depth_tpu.ops.conv import conv2d
from burn_depth_tpu.ops.interpolate import resize_bilinear, resize_bilinear_scale
from burn_depth_tpu.ops.linear import linear


def init_fov(rng: jax.Array, num_features: int, fov_encoder_dim: Optional[int], dtype=jnp.float32) -> dict:
    """``FOVNetwork::new`` (``fov.rs:62-166``).  ``fov_encoder_dim`` is the ViT
    embed dim when the encoder variant is used (the default config)."""
    from burn_depth_tpu.models.da3.dpt import _conv_init
    from burn_depth_tpu.models.da3.camera import _linear_init

    keys = iter(jax.random.split(rng, 8))
    nf = num_features
    params: dict = {"downsample_blocks": [], "head_blocks": []}
    if fov_encoder_dim is not None:
        params["encoder_proj"] = _linear_init(next(keys), nf // 2, fov_encoder_dim, dtype)
        params["downsample_blocks"].append(_conv_init(next(keys), nf // 2, nf, 3, 3, dtype=dtype))
        head_dims = [(nf // 2, nf // 4), (nf // 4, nf // 8), (nf // 8, 1)]
    else:
        head_dims = [(nf, nf // 2), (nf // 2, nf // 4), (nf // 4, nf // 8), (nf // 8, 1)]
    for in_c, out_c in head_dims[:-1]:
        params["head_blocks"].append(_conv_init(next(keys), out_c, in_c, 3, 3, dtype=dtype))
    in_c, out_c = head_dims[-1]
    params["head_blocks"].append(_conv_init(next(keys), out_c, in_c, 6, 6, dtype=dtype))
    return params


def _ensure_min_spatial(x: jnp.ndarray, kh: int, kw: int) -> jnp.ndarray:
    """Resize guard for sub-kernel feature maps (``fov.rs:238-246``)."""
    h, w = x.shape[-2:]
    if h >= kh and w >= kw:
        return x
    return resize_bilinear(x, (max(h, kh), max(w, kw)), align_corners=False)


def _apply_blocks(blocks: list, x: jnp.ndarray, final_no_relu: bool) -> jnp.ndarray:
    """Conv(+relu) chain; strided 3x3 for all but the final 6x6 valid conv
    (``fov.rs:79-155,229-236``)."""
    for idx, p in enumerate(blocks):
        kh, kw = p["weight"].shape[-2:]
        x = _ensure_min_spatial(x, kh, kw)
        if kh == 6:
            x = conv2d(x, p["weight"], p["bias"])  # valid, stride 1
            if not final_no_relu:
                x = relu(x)
        else:
            x = conv2d(x, p["weight"], p["bias"], stride=2, padding=1)
            x = relu(x)
    return x


def fov_forward(
    params: dict,
    vit_params: Optional[dict],
    vit_cfg,
    x: jnp.ndarray,
    lowres_feature: jnp.ndarray,
    num_features: int,
    attn_impl: str = "auto",
    precomputed_tokens: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``FOVNetwork::forward`` (``fov.rs:168-236``) → ``[B]`` fovx degrees.

    ``precomputed_tokens``: fov-encoder patch tokens already computed by the
    stacked dual-encoder pass (``DepthPro.stack_dual_encoders``) — the ViT
    pass here is skipped.  Numerically identical: the stacked pass consumes
    the same 0.25x resize (the encoder pyramid's x2) the resize below
    produces, and XLA CSEs the duplicate resize anyway.
    """
    if vit_params is None and precomputed_tokens is None:
        out = _apply_blocks(params["head_blocks"], lowres_feature, final_no_relu=True)
        return out.reshape(out.shape[0])

    from burn_depth_tpu.vit.dinov2 import dinov2_forward

    features = lowres_feature
    for p in params["downsample_blocks"]:
        features = _ensure_min_spatial(features, 3, 3)
        features = relu(conv2d(features, p["weight"], p["bias"], stride=2, padding=1))

    # third ViT pass on the 0.25x image (fov.rs:189-227)
    if precomputed_tokens is not None:
        tokens = precomputed_tokens
    else:
        x_small = resize_bilinear_scale(x, (0.25, 0.25), align_corners=False)
        tokens = dinov2_forward(vit_params, x_small, vit_cfg, attn_impl=attn_impl).x_norm_patchtokens
    projected = linear(tokens, params["encoder_proj"]["weight"], params["encoder_proj"]["bias"])
    b, t, _ = projected.shape
    encoded = projected.transpose(0, 2, 1).reshape(features.shape)

    fused = features + encoded
    out = _apply_blocks(params["head_blocks"], fused, final_no_relu=True)
    return out.reshape(out.shape[0])
