"""Dissect the non-linear ~90 ms of the 35-tile ViT-L pass.

kernel_probe (round 2): the 24-block LINEAR stack runs 95.5 ms (127.7 T/s),
but the full patch ViT pass is ~188 ms — ~90 ms goes to attention + qkv
relayouts + LN/residual glue, i.e. ~12 TFLOP/s effective on the attention
math.  This probe times 24-block chains of increasing scope:

  linears   : LN+qkv(fold)+proj+LN+fc1+gelu+fc2 (kernel_probe's bf16 form)
  relayout  : linears + the real qkv [B,T,3D]->[3,B,H,T,hd] and
              [B,H,T,hd]->[B,T,D] transposes (attention itself replaced by v)
  attn_pal  : full real block (_block_forward) with the Pallas flash kernel
  attn_nop  : same, BDT_ATTN_NOPAD=1 (no 64->128 head-dim padding)
  attn_jnp  : full real block with jnp attention

Run: python benchmarks/attn_probe.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import benchmarks._cache  # noqa: F401

import jax
import jax.numpy as jnp
from jax import lax

from burn_depth_tpu.ops.activations import gelu
from burn_depth_tpu.ops.norm import layer_norm
from burn_depth_tpu.vit.dinov2 import DinoViTConfig, _block_forward, init_dinov2

B, T, D, H = 35, 577, 1024, 16
HD = D // H
HID = 4 * D
DEPTH = 24
ITERS = 3
# FLOPs incl. attention (2 matmuls of 2*B*H*T*T*HD each)
LIN_FLOPS = 2 * B * T * (D * 3 * D + D * D + D * HID + HID * D)
ATTN_FLOPS = 4 * B * H * T * T * HD
CFG = DinoViTConfig(img_size=384, patch_size=16, embed_dim=D, depth=DEPTH, num_heads=H)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def mk_block_params(key):
    p = init_dinov2(key, CFG)
    return p["blocks"][0]


def make_chain(form, bp):
    def block_linears(x, with_relayout):
        y = layer_norm(x, bp["norm1"]["weight"], bp["norm1"]["bias"], 1e-6)
        qkv = y @ bp["attn"]["qkv"]["weight"].T.astype(x.dtype) + bp["attn"]["qkv"]["bias"].astype(x.dtype)
        if with_relayout:
            qkv = qkv.reshape(B, T, 3, H, HD)
            q, k, v = (qkv.transpose(2, 0, 3, 1, 4)[i] for i in range(3))
            att = v  # stand in for attention output, keeps both transposes real
            y = att.transpose(0, 2, 1, 3).reshape(B, T, D)
        else:
            y = qkv[..., :D] + qkv[..., D : 2 * D] + qkv[..., 2 * D :]
        y = y @ bp["attn"]["proj"]["weight"].T.astype(x.dtype) + bp["attn"]["proj"]["bias"].astype(x.dtype)
        x = x + y
        y = layer_norm(x, bp["norm2"]["weight"], bp["norm2"]["bias"], 1e-6)
        y = y @ bp["mlp"]["fc1"]["weight"].T.astype(x.dtype) + bp["mlp"]["fc1"]["bias"].astype(x.dtype)
        y = gelu(y)
        y = y @ bp["mlp"]["fc2"]["weight"].T.astype(x.dtype) + bp["mlp"]["fc2"]["bias"].astype(x.dtype)
        return x + y

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(p, x, iters):
        def body(_, c):
            for i in range(DEPTH):
                if form == "linears":
                    c = block_linears(c, False)
                elif form == "relayout":
                    c = block_linears(c, True)
                else:
                    c = _block_forward(p, c, CFG, i, None, 1, "jnp" if form == "attn_jnp" else "pallas")
            return c

        return lax.fori_loop(0, iters, body, x)

    return chain


def run(label, chain, p, x, flops_per_block):
    out = chain(p, x, ITERS)
    _ = jax.device_get(jnp.ravel(out)[:8])
    t0 = time.perf_counter()
    out = chain(p, x, ITERS)
    _ = jax.device_get(jnp.ravel(out)[:8])
    dt = time.perf_counter() - t0
    nb = ITERS * DEPTH
    log(
        f"{label:10s}: {dt * 1e3 / nb:7.3f} ms/block  {dt * 1e3 / ITERS:7.1f} ms/24"
        f"  {flops_per_block * nb / dt / 1e12:6.1f} TFLOP/s"
    )


def main():
    log(f"devices={jax.devices()}")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, D), jnp.bfloat16)
    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, mk_block_params(key))

    import os

    import numpy as np

    # numeric cross-check: pad / nopad / jnp paths must agree.  Use the FULL
    # batch: B=2 creates a new head-group (g=4) kernel instance whose Mosaic
    # remote compile was observed to hang >18 min.
    xb = x
    os.environ["BDT_ATTN_NOPAD"] = "0"
    ref = np.asarray(_block_forward(bp, xb, CFG, 0, None, 1, "pallas"), np.float32)
    os.environ["BDT_ATTN_NOPAD"] = "1"
    nop = np.asarray(_block_forward(bp, xb, CFG, 0, None, 1, "pallas"), np.float32)
    jn = np.asarray(_block_forward(bp, xb, CFG, 0, None, 1, "jnp"), np.float32)
    log(f"nopad-vs-pad max abs {np.abs(nop - ref).max():.2e}; pallas-vs-jnp {np.abs(ref - jn).max():.2e}")
    os.environ["BDT_ATTN_NOPAD"] = "0"

    run("linears", make_chain("linears", bp), bp, x, LIN_FLOPS)
    run("relayout", make_chain("relayout", bp), bp, x, LIN_FLOPS)
    os.environ["BDT_ATTN_NOPAD"] = "0"
    run("attn_pal", make_chain("attn_pal", bp), bp, x, LIN_FLOPS + ATTN_FLOPS)
    os.environ["BDT_ATTN_NOPAD"] = "1"
    run("attn_nop", make_chain("attn_nop", bp), bp, x, LIN_FLOPS + ATTN_FLOPS)
    os.environ["BDT_ATTN_NOPAD"] = "0"
    os.environ["BDT_ATTN_EXP_BF16"] = "1"
    run("attn_eb16", make_chain("attn_eb16", bp), bp, x, LIN_FLOPS + ATTN_FLOPS)
    os.environ["BDT_ATTN_EXP_BF16"] = "0"
    run("attn_jnp", make_chain("attn_jnp", bp), bp, x, LIN_FLOPS + ATTN_FLOPS)


if __name__ == "__main__":
    main()
