"""Pallas TPU kernel: 3x3 stride-1 SAME conv in NHWC, fused epilogues.

Target: the DPT decoder's fusion stack (reference ``decoder.rs:47-141``) —
3x3 C=256 convs at up to 768² run at ~91 TFLOP/s under XLA's conv lowering
(BENCH.md component profile); this kernel formulates the conv as 9 shifted
``[th·tw, C] x [C, O]`` MXU matmuls with the weights VMEM-resident across the
whole grid and the f32 accumulator never leaving VMEM.

Halo handling: the input is SAME-padded once in HBM (rows AND columns — one
cheap elementwise pass; this Mosaic supports neither low ``pl.Element``
padding nor mixed Element/Blocked specs), and each grid cell fetches a
``(th+2, tw+2)`` window via element-granular ``pl.Element`` starts.

Fused epilogues (free VPU passes over the VMEM-resident accumulator):
* ``relu_in``  — relu on the *input* (the ResidualBlock's pre-activation,
  ``decoder.rs:74-87`` relu→conv ordering);
* ``residual`` — add a skip tensor to the output (the block's ``+ x``);
* ``relu_out`` — relu on the output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from jax._src.pallas.core import Element


def _kernel(x_ref, w_ref, o_ref, *, th: int, tw: int, relu_in: bool, relu_out: bool,
            bias_ref=None, res_ref=None):
    x = x_ref[0]  # [th+2, tw+2, C] (SAME-padded array, fully in-bounds)
    if relu_in:
        x = jnp.maximum(x, 0)
    w = w_ref[...]  # [3, 3, C, O]
    acc = None
    for dy in range(3):
        for dx in range(3):
            lhs = x[dy : dy + th, dx : dx + tw].reshape(th * tw, -1)
            part = jax.lax.dot_general(
                lhs, w[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    out = acc.reshape(th, tw, -1)
    if bias_ref is not None:
        out = out + bias_ref[...].astype(out.dtype)
    if res_ref is not None:
        out = out + res_ref[0].astype(out.dtype)
    if relu_out:
        out = jnp.maximum(out, 0)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu_in", "relu_out", "tile_h", "tile_w"))
def conv3x3_nhwc_pallas(
    x: jnp.ndarray,  # [N, H, W, C]
    w_hwio: jnp.ndarray,  # [3, 3, C, O]
    bias: jnp.ndarray | None = None,
    residual: jnp.ndarray | None = None,  # [N, H, W, O]
    relu_in: bool = False,
    relu_out: bool = False,
    tile_h: int = 8,
    tile_w: int = 0,
) -> jnp.ndarray:
    n, h, w, c = x.shape
    o = w_hwio.shape[-1]
    th = tile_h
    while th > 1 and h % th:
        th -= 1
    if tile_w <= 0:
        # budget ≤ ~10 MB incl. Mosaic double buffering:
        # 2·x[(th+2)(tw+2)C·2] + 2·w[9CO·2] + 2·out[th·tw·O·2] + acc f32
        tile_w = 256
    tw = tile_w
    while tw > 1 and w % tw:
        tw -= 1
    grid = (n, h // th, w // tw)

    # SAME-pad once in HBM: this Mosaic rejects low Element padding, so all
    # halo reads must be in-bounds on the padded array.  The fetched window's
    # second-to-last dim must be 8-divisible — round the window width up and
    # right-pad the array to keep the extra columns in-bounds.
    tb = -(-(tw + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + tb - (tw + 2)), (0, 0)))

    in_specs = [
        pl.BlockSpec(
            (Element(1), Element(th + 2), Element(tb), Element(c)),
            lambda i, j, k: (i, j * th, k * tw, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((3, 3, c, o), lambda i, j, k: (0, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [xp, w_hwio]
    kern_kw = dict(th=th, tw=tw, relu_in=relu_in, relu_out=relu_out)
    if bias is not None:
        in_specs.append(pl.BlockSpec((o,), lambda i, j, k: (0,), memory_space=pltpu.VMEM))
        args.append(bias)
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((1, th, tw, o), lambda i, j, k: (i, j, k, 0), memory_space=pltpu.VMEM)
        )
        args.append(residual)

    def kernel(*refs):
        x_ref, w_ref = refs[0], refs[1]
        idx = 2
        b_ref = r_ref = None
        if bias is not None:
            b_ref = refs[idx]
            idx += 1
        if residual is not None:
            r_ref = refs[idx]
            idx += 1
        _kernel(x_ref, w_ref, refs[-1], bias_ref=b_ref, res_ref=r_ref, **kern_kw)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, o), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, th, tw, o), lambda i, j, k: (i, j, k, 0), memory_space=pltpu.VMEM
        ),
    )(*args)
