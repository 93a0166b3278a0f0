"""Pallas TPU kernel: 3x3 stride-1 SAME conv in NHWC, fused epilogues.

Target: the DPT decoder's fusion stack (reference ``decoder.rs:47-141``) —
3x3 C=256 convs at up to 768² run at ~91 TFLOP/s under XLA's conv lowering
(BENCH.md component profile); this kernel formulates the conv as 9 shifted
``[th·W, C] x [C, O]`` MXU matmuls with the weights VMEM-resident across the
whole grid and the f32 accumulator never leaving VMEM.

Halo handling: the input block is ``th+2`` rows via ``pl.Element`` indexing
(element-granular start ``i·th - 1``, one row of zero padding at each edge);
the column halo is a VMEM ``jnp.pad`` inside the kernel (cheap VPU copy).

Fused epilogues (they are free VPU passes over the accumulator while it is
still in VMEM):
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


def _kernel(x_ref, w_ref, o_ref, *, th: int, n_tiles: int, relu_in: bool, relu_out: bool,
            bias_ref=None, res_ref=None):
    x = x_ref[0]  # [th+2, W, C]; rows 0 and th+1 are halo
    # Out-of-bounds halo rows (first/last tile) read back garbage — zero them.
    j = pl.program_id(1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=0)
    valid = jnp.logical_and(
        jnp.logical_or(j > 0, row_ids > 0),
        jnp.logical_or(j < n_tiles - 1, row_ids < th + 1),
    )
    x = jnp.where(valid, x, 0)
    if relu_in:
        x = jnp.maximum(x, 0)
    w = w_ref[...]  # [3, 3, C, O]
    hw = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))  # column halo in VMEM
    acc = None
    for dy in range(3):
        for dx in range(3):
            lhs = xp[dy : dy + th, dx : dx + hw].reshape(th * hw, -1)
            part = jax.lax.dot_general(
                lhs, w[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    out = acc.reshape(th, hw, -1)
    if bias_ref is not None:
        out = out + bias_ref[...].astype(out.dtype)
    if res_ref is not None:
        out = out + res_ref[0].astype(out.dtype)
    if relu_out:
        out = jnp.maximum(out, 0)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu_in", "relu_out", "tile_h"))
def conv3x3_nhwc_pallas(
    x: jnp.ndarray,  # [N, H, W, C]
    w_hwio: jnp.ndarray,  # [3, 3, C, O]
    bias: jnp.ndarray | None = None,
    residual: jnp.ndarray | None = None,  # [N, H, W, O]
    relu_in: bool = False,
    relu_out: bool = False,
    tile_h: int = 0,
) -> jnp.ndarray:
    n, h, w, c = x.shape
    o = w_hwio.shape[-1]
    if tile_h <= 0:
        # acc f32 [th, W, O] + input [th+2, W, C] bf16 within ~12 MB VMEM
        budget = 11 * 1024 * 1024
        th = max(1, budget // (w * o * 4 + w * c * 2 + w * o * 2))
        while th > 1 and h % th:
            th -= 1
        tile_h = th
    th = tile_h
    grid = (n, h // th)

    in_specs = [
        # Element semantics: index_map returns the INTERIOR element start;
        # the (1, 1) padding extends the fetched block one row beyond each
        # side (OOB rows carry unspecified values — masked in the kernel).
        pl.BlockSpec(
            (1, Element(th + 2, (1, 1)), w, c),
            lambda i, j: (i, j * th, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((3, 3, c, o), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, w_hwio]
    bias_ref = res_ref = None
    kern_kw = dict(th=th, n_tiles=h // th, relu_in=relu_in, relu_out=relu_out)
    if bias is not None:
        in_specs.append(pl.BlockSpec((o,), lambda i, j: (0,), memory_space=pltpu.VMEM))
        args.append(bias)
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((1, th, w, o), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
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
        out_specs=pl.BlockSpec((1, th, w, o), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
    )(*args)
