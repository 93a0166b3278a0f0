"""Per-component timing of Depth Pro at flagship geometry (bf16 vs int8).

Timing pattern is the one bench.py proved sane through the axon tunnel: a
Python loop of K calls where each call's input depends on the previous
call's output (so nothing can be deduped), ONE block_until_ready at the end.
The earlier scan-of-K serialization made XLA compiles of the full model
pathologically slow (>20 min — killed) and was abandoned.

Run: BENCH_INT8=static python benchmarks/component_profile.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import benchmarks._cache  # noqa: F401  (persistent XLA compile cache)

import jax
import jax.numpy as jnp

from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig
from burn_depth_tpu.models.depth_pro import encoder as enc_mod
from burn_depth_tpu.models.depth_pro.decoder import decoder_forward
from burn_depth_tpu.models.depth_pro.fov import fov_forward
from burn_depth_tpu.models.depth_pro.model import _depth_head_forward
from burn_depth_tpu.vit.dinov2 import dinov2_forward

K = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(label, fn, params, x):
    """Time jit(fn) over K dependent calls (out feeds a tiny input nudge).

    ``params`` MUST ride as a jit argument: closing over the flagship param
    tree inlines ~0.7 GB of weights as HLO constants and makes XLA's
    constant-folding pass run for >30 min (both round-2 profile attempts
    died to this)."""
    jfn = jax.jit(fn)

    def chain(k):
        xi = x
        out = None
        for _ in range(k):
            out = jfn(params, xi)
            leaf = jax.tree_util.tree_leaves(out)[0]
            xi = x + (leaf.ravel()[0] * 1e-12).astype(x.dtype)
        jax.block_until_ready(out)

    chain(2)  # compile + warm
    t0 = time.perf_counter()
    chain(K)
    dt = (time.perf_counter() - t0) / K * 1e3
    log(f"{label:28s}: {dt:8.2f} ms")
    return dt


def main():
    int8_mode = os.environ.get("BENCH_INT8", "static")
    cfg = DepthProConfig.dinov2_l16_384()
    model = DepthPro.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if int8_mode != "0":
        calib = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cfg.img_size, cfg.img_size), jnp.bfloat16)
        model = model.quantize_vit(calibration_input=calib if int8_mode == "static" else None)
    params = model.params
    log(f"devices={jax.devices()}  int8={int8_mode}")

    enc = params["encoder"]
    size = cfg.img_size

    # 1. full infer (sanity tie-out with bench.py)
    x_full = jax.random.normal(jax.random.PRNGKey(2), (1, 3, size, size), jnp.bfloat16)
    timeit("full_infer", lambda p, x: model._infer_fn(p, x).depth, params, x_full)

    # 2. whole encoder (pyramid + 35-tile ViT + merges + projections)
    timeit(
        "encoder_forward",
        lambda p, x: enc_mod.encoder_forward(p, p["patch_encoder"], p["image_encoder"], x, cfg)[0],
        enc,
        x_full,
    )

    # 3. patch ViT alone on the 35-tile batch
    tiles = jax.random.normal(jax.random.PRNGKey(3), (35, 3, 384, 384), jnp.bfloat16)
    timeit(
        "patch_vit_35x384",
        lambda p, t: dinov2_forward(
            p, t, cfg.patch_encoder, hook_ids=cfg.hook_ids, attn_impl=cfg.attn_impl
        ).x_norm_patchtokens,
        enc["patch_encoder"],
        tiles,
    )

    # 4. decoder on representative features
    feat_shapes = jax.eval_shape(
        lambda x: enc_mod.encoder_forward(enc, enc["patch_encoder"], enc["image_encoder"], x, cfg)[0],
        jax.ShapeDtypeStruct(x_full.shape, x_full.dtype),
    )
    feats = [
        jax.random.normal(jax.random.PRNGKey(10 + i), s.shape, s.dtype) for i, s in enumerate(feat_shapes)
    ]
    log(f"  feature shapes: {[tuple(f.shape) for f in feats]}")

    def dec_fn(bundle, f0):
        dp, rest = bundle
        return decoder_forward(dp, [f0, *rest])[0]

    timeit("decoder", dec_fn, (params["decoder"], feats[1:]), feats[0])

    # 5. depth head
    dec_out_shape = jax.eval_shape(
        lambda f0: dec_fn((params["decoder"], feats[1:]), f0),
        jax.ShapeDtypeStruct(feats[0].shape, feats[0].dtype),
    )
    dh_in = jax.random.normal(jax.random.PRNGKey(20), dec_out_shape.shape, dec_out_shape.dtype)
    timeit("depth_head", lambda p, x: _depth_head_forward(p, x), params["head"], dh_in)

    # 6. fov head (incl. its own ViT pass at 384²)
    lowres_shape = jax.eval_shape(
        lambda x: enc_mod.encoder_forward(enc, enc["patch_encoder"], enc["image_encoder"], x, cfg)[0],
        jax.ShapeDtypeStruct(x_full.shape, x_full.dtype),
    )
    # lowres features = decoder's second output
    def lowres_fn(x):
        fs, _ = enc_mod.encoder_forward(enc, enc["patch_encoder"], enc["image_encoder"], x, cfg)
        return decoder_forward(params["decoder"], fs)[1]

    lr_shape = jax.eval_shape(lowres_fn, jax.ShapeDtypeStruct(x_full.shape, x_full.dtype))
    lowres = jax.random.normal(jax.random.PRNGKey(21), lr_shape.shape, lr_shape.dtype)
    if "fov" in params:
        timeit(
            "fov_head",
            lambda bundle, x: fov_forward(
                bundle[0], bundle[0].get("encoder"), cfg.fov_encoder, x, bundle[1],
                cfg.decoder_features, attn_impl=cfg.attn_impl,
            ),
            (params["fov"], lowres),
            x_full,
        )

    # 7. image encoder ViT (1x384²)
    img1 = jax.random.normal(jax.random.PRNGKey(22), (1, 3, 384, 384), jnp.bfloat16)
    timeit(
        "image_vit_1x384",
        lambda p, t: dinov2_forward(p, t, cfg.image_encoder, attn_impl=cfg.attn_impl).x_norm_patchtokens,
        enc["image_encoder"],
        img1,
    )


if __name__ == "__main__":
    main()
