"""Depth Pro multi-scale encoder: 3-scale pyramid → 35 batched 384² tiles →
ONE ViT pass → split/merge → 5 feature maps.

Reference: ``src/model/depth_pro/layers/encoder.rs``.  TPU-native design:

* the pyramid resizes, the 25+9+1 tile extraction, the batched ViT pass, the
  seam-trimmed merges, and the upsample stacks are all traced into one XLA
  program — the reference instead round-trips to host for every resize and
  loops per-patch slices on device (SURVEY.md §3.1 "process/device
  boundaries");
* split is a static gather: tile coordinates are Python ints at trace time, so
  XLA lowers the stack of slices to efficient copies; merge is a static
  concatenation of trimmed slices (``encoder.rs:234-282`` geometry: overlap
  0.25 → stride 288 → 5x5 grid, pad 3; overlap 0.5 → stride 192 → 3x3, pad 6).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from burn_depth_tpu.ops.conv import conv2d, conv_transpose2d
from burn_depth_tpu.ops.interpolate import resize_bilinear_scale


# --------------------------------------------------------------------------
# split / merge geometry (encoder.rs:10-39,190-282)
# --------------------------------------------------------------------------


def split_geometry(image_size: int, patch_size: int, overlap: float) -> tuple[int, int]:
    """``(steps, stride)`` for a square split (``encoder.rs:190-207``)."""
    stride = max(int(math.floor(patch_size * (1.0 - overlap))), 1)
    stride = min(stride, patch_size)
    if patch_size >= image_size:
        return 1, stride
    steps = 1 + -(-(image_size - patch_size) // stride)  # div_ceil
    return steps, stride


def feature_padding(patch_size: int, stride: int, feature_patch_size: int) -> int:
    """Seam trim in feature pixels (``encoder.rs:28-38``), integer-rounded."""
    if feature_patch_size == 0 or patch_size == 0:
        return 0
    denom = max(patch_size, 1)
    feature_stride = (stride * feature_patch_size + denom // 2) // denom
    return max(feature_patch_size - feature_stride, 0) // 2


def split(x: jnp.ndarray, patch_size: int, overlap: float) -> tuple[jnp.ndarray, int, int]:
    """Tile ``[B,C,S,S]`` into ``[B·(steps²), C, p, p]``, image-major
    (image-outer; tiles row-outer, col-inner per image — the tile walk of
    ``encoder.rs:208-231``).

    Image-major (NOT the reference's tile-major cat) keeps each image's
    tiles contiguous along dim 0, so a batch-sharded input stays local
    through the tile stack under data parallelism — tile-major stacking
    interleaves images and forces an all-to-all per scale (measured: 36
    all-to-alls + 544 collective-permutes in the DP-8 serving HLO).  At
    B=1 the two orders coincide, so single-chip numerics/goldens are
    unchanged."""
    size = x.shape[-1]
    steps, stride = split_geometry(size, patch_size, overlap)
    if steps == 1:
        return x, steps, stride
    tiles = []
    for j in range(steps):
        j0 = j * stride
        for i in range(steps):
            i0 = i * stride
            tiles.append(x[:, :, j0 : j0 + patch_size, i0 : i0 + patch_size])
    stacked = jnp.stack(tiles, axis=1)  # [B, steps², C, p, p]
    return stacked.reshape(x.shape[0] * steps * steps, *stacked.shape[2:]), steps, stride


def merge(x: jnp.ndarray, batch_size: int, padding: int) -> jnp.ndarray:
    """Reassemble an image-major tile stack ``[B·(steps²), C, h, w]`` trimming
    ``padding`` px at interior seams (``encoder.rs:234-282`` geometry; dim-0
    order is image-major to match :func:`split`)."""
    total, _, height, width = x.shape
    steps = int(round(math.sqrt(total / batch_size)))
    if steps <= 1:
        return x
    grid = x.reshape(batch_size, steps * steps, *x.shape[1:])
    rows = []
    for j in range(steps):
        row_patches = []
        for i in range(steps):
            idx = j * steps + i
            patch = grid[:, idx]
            top = 0 if j == 0 else padding
            bottom = height - (0 if j == steps - 1 else padding)
            left = 0 if i == 0 else padding
            right = width - (0 if i == steps - 1 else padding)
            row_patches.append(patch[:, :, top:bottom, left:right])
        rows.append(jnp.concatenate(row_patches, axis=3))
    return jnp.concatenate(rows, axis=2)


def reshape_feature(tokens: jnp.ndarray, width: int, height: int, cls_offset: int) -> jnp.ndarray:
    """``[B,T,D] → [B,D,height,width]`` dropping ``cls_offset`` leading tokens
    (``encoder.rs:284-319``)."""
    b, t, d = tokens.shape
    spatial = width * height
    offset = cls_offset if t - cls_offset >= spatial else t - spatial
    sel = tokens[:, offset : offset + spatial]
    return sel.reshape(b, height, width, d).transpose(0, 3, 1, 2)


# --------------------------------------------------------------------------
# ProjectUpsampleBlock (encoder.rs:41-84)
# --------------------------------------------------------------------------


def init_project_upsample(
    rng: jax.Array, dim_in: int, dim_out: int, upsample_layers: int, dim_int: int | None = None, dtype=jnp.float32
) -> dict:
    from burn_depth_tpu.models.da3.dpt import _conv_init, _convT_init

    inter = dim_int if dim_int is not None else dim_out
    keys = jax.random.split(rng, 1 + upsample_layers)
    ups = []
    for layer in range(upsample_layers):
        in_c = inter if layer == 0 else dim_out
        ups.append(_convT_init(keys[1 + layer], in_c, dim_out, 2, 2, bias=False, dtype=dtype))
    return {
        "projection": _conv_init(keys[0], inter, dim_in, 1, 1, bias=False, dtype=dtype),
        "upsample": ups,
    }


def project_upsample_forward(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    x = conv2d(x, p["projection"]["weight"])
    for layer in p["upsample"]:
        x = conv_transpose2d(x, layer["weight"], stride=2)
    return x


def _chunked_patch_pass(vit_params: dict, pyramid: jnp.ndarray, cfg, chunks: int):
    """The patch-encoder pass as a rematerialized ``lax.scan`` over tile
    chunks (``tile_chunks`` must divide the tile count — 5 or 7 for the
    flagship's 35).  Returns ``(patchtokens [N,T,D], [hook_tokens [N,T,D],
    ...])`` exactly as the single batched pass would."""
    from burn_depth_tpu.vit.dinov2 import dinov2_forward

    total = pyramid.shape[0]
    per = total // chunks
    tiles = pyramid.reshape(chunks, per, *pyramid.shape[1:])

    def body(carry, chunk):
        out = dinov2_forward(
            vit_params, chunk, cfg.patch_encoder, hook_ids=cfg.hook_ids, attn_impl=cfg.attn_impl
        )
        return carry, (out.x_norm_patchtokens, tuple(h.tokens for h in out.hooks))

    _, (patchtokens, hook_tokens) = jax.lax.scan(jax.checkpoint(body), None, tiles)
    patchtokens = patchtokens.reshape(total, *patchtokens.shape[2:])
    return patchtokens, [h.reshape(total, *h.shape[2:]) for h in hook_tokens]


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def init_encoder(rng: jax.Array, cfg, dtype=jnp.float32) -> dict:
    """``cfg`` is a DepthProConfig; builds the non-ViT encoder params
    (the two ViTs are initialized by the model, ``encoder.rs:125-184``)."""
    from burn_depth_tpu.models.da3.dpt import _conv_init, _convT_init

    keys = jax.random.split(rng, 8)
    dims = cfg.encoder_feature_dims
    embed = cfg.patch_encoder.embed_dim
    return {
        "upsample_latent0": init_project_upsample(keys[0], embed, cfg.decoder_features, 3, dims[0], dtype),
        "upsample_latent1": init_project_upsample(keys[1], embed, dims[0], 2, None, dtype),
        "upsample0": init_project_upsample(keys[2], embed, dims[1], 1, None, dtype),
        "upsample1": init_project_upsample(keys[3], embed, dims[2], 1, None, dtype),
        "upsample2": init_project_upsample(keys[4], embed, dims[3], 1, None, dtype),
        "upsample_lowres": _convT_init(keys[5], cfg.image_encoder.embed_dim, dims[3], 2, 2, bias=True, dtype=dtype),
        "fuse_lowres": _conv_init(keys[6], dims[3], dims[3] * 2, 1, 1, bias=True, dtype=dtype),
    }


def encoder_forward(
    params: dict,
    vit_params: dict,
    image_vit_params: dict,
    x: jnp.ndarray,
    cfg,
    debug: bool = False,
    stacked_image_fov: dict | None = None,
):
    """``DepthProEncoder::forward_with_debug`` (``encoder.rs:321-454``).

    Returns the 5 feature maps (+ a debug dict of the 16 intermediates when
    ``debug=True``, matching the reference's ``EncoderDebug`` taps).

    ``stacked_image_fov`` (serving, ``DepthPro.stack_dual_encoders``): a
    weight-stacked [image_encoder; fov_encoder] tree — the two B=1 384²
    passes run as ONE stacked pass and the fov patch tokens are returned as
    a third output (the fov head consumes them via ``precomputed_tokens``).
    """
    from burn_depth_tpu.vit.dinov2 import dinov2_forward, dinov2_forward_stacked

    batch = x.shape[0]
    patch_size = cfg.patch_encoder.img_size  # 384
    out_size = cfg.patch_encoder.grid_size  # 24

    x0 = x
    x1 = resize_bilinear_scale(x, (0.5, 0.5), align_corners=False)
    x2 = resize_bilinear_scale(x, (0.25, 0.25), align_corners=False)

    x0_tiles, steps0, stride0 = split(x0, patch_size, 0.25)
    x1_tiles, steps1, stride1 = split(x1, patch_size, 0.5)
    x2_tiles = x2

    n0, n1 = steps0 * steps0, steps1 * steps1
    total_tiles = n0 + n1 + 1
    # Image-major pyramid: each image's (n0+n1+1) tiles are contiguous on
    # dim 0, so a batch-sharded input stays local through the whole hot pass
    # under data parallelism (DP zero-collective audit,
    # __graft_entry__._dryrun_multichip_impl).  At B=1 this is the plain
    # scale-major concat the flagship serving path always ran.
    pyramid = jnp.concatenate(
        [
            x0_tiles.reshape(batch, n0, *x0_tiles.shape[1:]),
            x1_tiles.reshape(batch, n1, *x1_tiles.shape[1:]),
            x2_tiles[:, None],
        ],
        axis=1,
    ).reshape(batch * total_tiles, *x0_tiles.shape[1:])

    def _scale_group(stack: jnp.ndarray, start: int, count: int) -> jnp.ndarray:
        """Slice one scale's tiles out of an image-major [B·total, ...] stack."""
        g = stack.reshape(batch, total_tiles, *stack.shape[1:])
        return g[:, start : start + count].reshape(batch * count, *stack.shape[1:])

    # ONE batched ViT pass over all 35 tiles — the hot loop.
    chunks = getattr(cfg, "tile_chunks", 0)
    if chunks and chunks > 1 and pyramid.shape[0] % chunks == 0:
        # Training form: the 35-tile pass as a ``lax.scan`` over tile chunks
        # with per-chunk rematerialization.  Numerics are identical (tiles are
        # independent through the ViT); the XLA program carries ONE chunk-body
        # instead of 35 unrolled tiles, so the backward HLO shrinks by ~the
        # chunk count — this is what lets the flagship 1536² fine-tune compile
        # (the unrolled 35-tile backward exceeds the compile helper's
        # capacity, BENCH.md round-2 cont. 4).  Serving keeps the single
        # batched pass (``tile_chunks=0``): one big pass beats a serialized
        # scan on MXU utilization.
        patchtokens, hook_tokens = _chunked_patch_pass(vit_params, pyramid, cfg, chunks)
    else:
        out = dinov2_forward(
            vit_params, pyramid, cfg.patch_encoder, hook_ids=cfg.hook_ids, attn_impl=cfg.attn_impl
        )
        patchtokens = out.x_norm_patchtokens
        hook_tokens = [h.tokens for h in out.hooks]

    encodings = reshape_feature(patchtokens, out_size, out_size, 0)
    x0_enc = _scale_group(encodings, 0, n0)
    x1_enc = _scale_group(encodings, n0, n1)
    x2_enc = _scale_group(encodings, n0 + n1, 1)

    latent0_merge_input = reshape_feature(hook_tokens[0], out_size, out_size, 1)
    latent1_merge_input = reshape_feature(hook_tokens[1], out_size, out_size, 1)
    latent0_enc = _scale_group(latent0_merge_input, 0, n0)
    latent1_enc = _scale_group(latent1_merge_input, 0, n0)

    high_pad = feature_padding(patch_size, stride0, out_size)
    mid_pad = feature_padding(patch_size, stride1, out_size)

    merged_latent0 = merge(latent0_enc, batch, high_pad)
    merged_latent1 = merge(latent1_enc, batch, high_pad)
    merged_x0 = merge(x0_enc, batch, high_pad)
    merged_x1 = merge(x1_enc, batch, mid_pad)
    merged_x2 = x2_enc

    # global image encoder on the 384² thumbnail (encoder.rs:409-421)
    fov_tokens = None
    if stacked_image_fov is not None:
        both = dinov2_forward_stacked(
            stacked_image_fov, x2_tiles, cfg.image_encoder, attn_impl=cfg.attn_impl
        )
        image_patchtokens, fov_tokens = both[0], both[1]
    else:
        image_patchtokens = dinov2_forward(
            image_vit_params, x2_tiles, cfg.image_encoder, attn_impl=cfg.attn_impl
        ).x_norm_patchtokens
    global_features = reshape_feature(image_patchtokens, out_size, out_size, 0)
    global_features = conv_transpose2d(
        global_features, params["upsample_lowres"]["weight"], params["upsample_lowres"]["bias"], stride=2
    )
    upsampled_x2 = project_upsample_forward(params["upsample2"], merged_x2)
    global_features = conv2d(
        jnp.concatenate([upsampled_x2, global_features], axis=1),
        params["fuse_lowres"]["weight"],
        params["fuse_lowres"]["bias"],
    )

    features = [
        project_upsample_forward(params["upsample_latent0"], merged_latent0),
        project_upsample_forward(params["upsample_latent1"], merged_latent1),
        project_upsample_forward(params["upsample0"], merged_x0),
        project_upsample_forward(params["upsample1"], merged_x1),
        global_features,
    ]

    if not debug:
        return (features, None) if stacked_image_fov is None else (features, None, fov_tokens)
    dbg = {
        "latent0": merged_latent0,
        "latent1": merged_latent1,
        "latent0_tokens": latent0_enc,
        "latent1_tokens": latent1_enc,
        "latent0_merge_input": latent0_merge_input,
        "latent1_merge_input": latent1_merge_input,
        "x0_tokens": x0_enc,
        "x1_tokens": x1_enc,
        "x2_tokens": x2_enc,
        "split_x0": x0_tiles,
        "split_x1": x1_tiles,
        "split_x2": x2_tiles,
        "merged_x0": merged_x0,
        "merged_x1": merged_x1,
        "merged_x2": merged_x2,
    }
    return (features, dbg) if stacked_image_fov is None else (features, dbg, fov_tokens)
