"""Pallas TPU kernel: Winograd F(2x2, 3x3) stride-1 SAME conv in NHWC.

The DPT decoder + depth head spend ~60 ms/forward in 3x3 stride-1 convs
(reference ``decoder.rs:47-141``, ``mod.rs:105-112``); XLA's direct lowering
runs them at 34-91 TFLOP/s (BENCH.md).  Winograd F(2x2,3x3) computes each
2x2 output tile from a 4x4 input tile with 16 multiplies instead of 36 —
2.25x fewer MXU FLOPs: the conv becomes 16 per-position ``[tiles, C] x
[C, O]`` matmuls on transformed tiles, with the transforms ({0,±1} adds)
living entirely in VMEM on the VPU.

Layout strategy (everything Mosaic-friendly, no strided VMEM access):

* The input is SAME-padded once in HBM and split by **column parity**
  (``E = xp[:, :, 0::2]``, ``Odd = xp[:, :, 1::2]``) — one cheap XLA pass.
  Column taps of a tile are then *unit* sublane slices of E/Odd windows.
* Row taps come from a free major-dim reshape ``[th+2, ., .] ->
  [(th+2)//2, 2, ., .]`` of the fetched window (row-parity phases).
* The kernel writes the two output **column phases** concatenated on the
  lane axis (``[., th, W/2, 2·O]``); the interleave back to ``[., H, W, O]``
  is a single XLA reshape pass outside (where bias epilogues/relu/residual
  fuse).  Row phases are interleaved in-kernel (major-dim merge, free).

Numerics: transforms run in bf16 (inputs are bf16), matmul accumulation in
f32.  Winograd + bf16 transform rounding gives a slightly looser error than
the direct form (~2-4x) — this is a *serving-tier* kernel (``BDT_CONV3_WINO``),
the parity tier keeps XLA's direct conv.

Filter transform ``U = G g G^T`` is precomputed in f32 per call (9.4 MFLOP —
trivial inside the jitted model).

Winograd matrices (Lavin & Gray, correlation form — matches NN conv):
  B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
  G   = [[1,0,0],[.5,.5,.5],[.5,-.5,.5],[0,0,1]]
  A^T = [[1,1,1,0],[0,1,-1,-1]]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
except ImportError:  # pragma: no cover
    pltpu = None

from jax._src.pallas.core import Element

# A^T row coefficients: output row/col phase p pulls transformed position r
# with coefficient _AT[p][r].
_AT = ((1, 1, 1, 0), (0, 1, -1, -1))
_G = ((1.0, 0.0, 0.0), (0.5, 0.5, 0.5), (0.5, -0.5, 0.5), (0.0, 0.0, 1.0))


def wino_filter(w_hwio: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """``[3,3,C,O] -> [4,4,C,O]``: ``U = G g G^T`` computed in f32."""
    g = jnp.asarray(_G, jnp.float32)
    w = w_hwio.astype(jnp.float32)
    u = jnp.einsum("ra,sb,abco->rsco", g, g, w)
    return u.astype(dtype)


def _bt_combine(v):
    """Apply B^T along a length-4 python list of arrays: returns 4 combos."""
    return [v[0] - v[2], v[1] + v[2], v[2] - v[1], v[1] - v[3]]


def _tile_out(e_ref, o_ref, u_ref, *, n: int, m: int, relu_in: bool,
              bias_ref=None):
    """Shared tile computation → f32 ``[th, m, 2O]`` (column phases packed
    on lanes, rows interleaved in-kernel)."""
    # e/o: [th+2, mb, C] padded column-parity windows; th = 2n, tw = 2m.
    e = e_ref[0]
    o = o_ref[0]
    if relu_in:
        e = jnp.maximum(e, 0)
        o = jnp.maximum(o, 0)
    c = e.shape[-1]
    oc = u_ref.shape[-1]
    # Row-parity phases: [(n+1), 2, mb, C] -> [:, 0] even rows, [:, 1] odd.
    e2 = e.reshape(n + 1, 2, e.shape[1], c)
    o2 = o.reshape(n + 1, 2, o.shape[1], c)

    def tap(a, b):
        # Input tile position (a, b) in 0..3: row 2i+a, col 2j+b (padded).
        src = e2 if b % 2 == 0 else o2
        ph = src[:, a % 2]  # [(n+1), mb, C]
        r0 = a // 2
        c0 = b // 2
        return ph[r0 : r0 + n, c0 : c0 + m]  # [n, m, C]

    # Column-stage transform c[a][s] = sum_b Bt[s,b] X[a][b], then row stage
    # d[r][s] = sum_a Bt[r,a] c[a][s].
    cst = [_bt_combine([tap(a, b) for b in range(4)]) for a in range(4)]
    dst = [_bt_combine([cst[a][s] for a in range(4)]) for s in range(4)]

    y = [[None, None], [None, None]]  # f32 accumulators [n·m, O]
    u = u_ref[...]  # [4, 4, C, O]
    for r in range(4):
        for s in range(4):
            pr = [p for p in range(2) if _AT[p][r]]
            qs = [q for q in range(2) if _AT[q][s]]
            if not pr or not qs:
                continue
            d = dst[s][r].reshape(n * m, c)
            mm = jax.lax.dot_general(
                d, u[r, s], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for p in pr:
                for q in qs:
                    contrib = mm if _AT[p][r] * _AT[q][s] > 0 else -mm
                    y[p][q] = contrib if y[p][q] is None else y[p][q] + contrib

    if bias_ref is not None:
        bb = bias_ref[...].astype(jnp.float32)
        for p in range(2):
            for q in range(2):
                y[p][q] = y[p][q] + bb
    # Row interleave in-kernel (major-dim merge): [n, m, O] pairs -> [th, m, O].
    def rows(q):
        s0 = y[0][q].reshape(n, 1, m, oc)
        s1 = y[1][q].reshape(n, 1, m, oc)
        return jnp.concatenate([s0, s1], axis=1).reshape(2 * n, m, oc)

    # Column phases concatenated on lanes: [th, m, 2O].
    return jnp.concatenate([rows(0), rows(1)], axis=-1)


def _kernel(e_ref, o_ref, u_ref, out_ref, *, n: int, m: int, relu_in: bool,
            bias_ref=None):
    out = _tile_out(e_ref, o_ref, u_ref, n=n, m=m, relu_in=relu_in,
                    bias_ref=bias_ref)
    out_ref[0] = out.astype(out_ref.dtype)


def _kernel_cblk(e_ref, o_ref, u_ref, out_ref, acc_ref, *, n: int, m: int,
                 relu_in: bool, c_steps: int):
    """C-blocked accumulation (NEXT.md OPEN avenue): the innermost grid dim
    walks C in blocks; partial contractions accumulate in an f32 VMEM
    SCRATCH (``acc_ref`` — single-buffered, persists across the sequential
    innermost steps) and the (input-dtype, double-buffered) output block is
    written once on the last step.  Keeping the f32 accumulator out of the
    double-buffered output path is what fits the 16M scoped-VMEM budget at
    the larger spatial tiles this mode exists for — M = n·m rows per matmul
    (the round-2 probe measured the per-position matmuls at ~26 TF/s at
    M=512 vs ~83 TF/s direct at M=2048; growing M is the one Winograd lever
    not yet tried).  Bias is applied in the XLA epilogue (exactly once)."""
    out = _tile_out(e_ref, o_ref, u_ref, n=n, m=m, relu_in=relu_in)
    c_idx = pl.program_id(3)

    @pl.when(c_idx == 0)
    def _init():
        acc_ref[...] = out

    @pl.when(c_idx > 0)
    def _accum():
        acc_ref[...] += out

    @pl.when(c_idx == c_steps - 1)
    def _write():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("relu_in", "relu_out", "tile_h", "tile_w", "c_block")
)
def conv3x3_wino_pallas(
    x: jnp.ndarray,  # [N, H, W, C]
    w_hwio: jnp.ndarray,  # [3, 3, C, O]
    bias: jnp.ndarray | None = None,
    residual: jnp.ndarray | None = None,  # [N, H, W, O]
    relu_in: bool = False,
    relu_out: bool = False,
    tile_h: int = 16,
    tile_w: int = 128,
    c_block: int | None = None,
) -> jnp.ndarray:
    """``c_block``: enable C-blocked accumulation — the innermost grid dim
    walks C in ``c_block``-channel slices and partial results accumulate
    into an f32 output block held in VMEM.  Shrinking the per-step C slice
    frees VMEM for larger spatial tiles (pass ``tile_h``/``tile_w`` up), the
    M-of-the-matmul lever the round-2 probe identified (26 TF/s @ M=512 vs
    83 @ M=2048).  Bias/interleave move to the XLA epilogue in this mode."""
    n_, h, w, c = x.shape
    oc = w_hwio.shape[-1]
    if h % 2 or w % 2:
        raise ValueError(f"winograd F(2x2) needs even H,W, got {(h, w)}")
    th = tile_h
    while th > 2 and h % th:
        th -= 2
    tw = tile_w
    while tw > 2 and w % tw:
        tw -= 2
    n, m = th // 2, tw // 2

    cb = c
    if c_block is not None:
        if c % c_block != 0:
            raise ValueError(
                f"c_block={c_block} does not divide C={c} — the C walk needs "
                "equal slices (a silently-ignored knob would make an A/B "
                "measure the unblocked kernel while believing c-blocking is on)"
            )
        if c_block < c:
            cb = c_block
    c_steps = c // cb

    u = wino_filter(w_hwio, dtype=x.dtype)

    # SAME pad + column-parity split in HBM (one fused XLA pass).
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    mtot = w // 2 + 1  # columns per parity array
    # Element-fetch windows need 8-divisible sublane width.
    mb = -(-(m + 1) // 8) * 8
    pad_c = (mtot - m - 1) + mb - mtot  # right-pad so every fetch is in-bounds
    ev = jnp.pad(xp[:, :, 0::2, :], ((0, 0), (0, 0), (0, max(pad_c, 0)), (0, 0)))
    od = jnp.pad(xp[:, :, 1::2, :], ((0, 0), (0, 0), (0, max(pad_c, 0)), (0, 0)))

    accum = c_steps > 1
    grid = (n_, h // th, w // tw) if not accum else (n_, h // th, w // tw, c_steps)

    if accum:
        win_spec = pl.BlockSpec(
            (Element(1), Element(th + 2), Element(mb), Element(cb)),
            lambda i, j, k, cs: (i, j * th, k * m, cs * cb),
            memory_space=pltpu.VMEM,
        )
        u_spec = pl.BlockSpec(
            (4, 4, cb, oc), lambda i, j, k, cs: (0, 0, cs, 0), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (1, th, m, 2 * oc), lambda i, j, k, cs: (i, j, k, 0), memory_space=pltpu.VMEM
        )
        out_dtype = x.dtype  # f32 accumulation lives in the VMEM scratch
    else:
        win_spec = pl.BlockSpec(
            (Element(1), Element(th + 2), Element(mb), Element(c)),
            lambda i, j, k: (i, j * th, k * m, 0),
            memory_space=pltpu.VMEM,
        )
        u_spec = pl.BlockSpec(
            (4, 4, c, oc), lambda i, j, k: (0, 0, 0, 0), memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (1, th, m, 2 * oc), lambda i, j, k: (i, j, k, 0), memory_space=pltpu.VMEM
        )
        out_dtype = x.dtype
    in_specs = [win_spec, win_spec, u_spec]
    args = [ev, od, u]
    in_kernel_bias = bias is not None and not accum
    if in_kernel_bias:
        in_specs.append(pl.BlockSpec((oc,), lambda i, j, k: (0,), memory_space=pltpu.VMEM))
        args.append(bias)

    if accum:

        def kernel(e_ref, o_ref, u_ref, out_ref, acc_ref):
            _kernel_cblk(e_ref, o_ref, u_ref, out_ref, acc_ref,
                         n=n, m=m, relu_in=relu_in, c_steps=c_steps)

        scratch_shapes = [pltpu.VMEM((th, m, 2 * oc), jnp.float32)]
    else:

        def kernel(*refs):
            b_ref = refs[3] if in_kernel_bias else None
            _kernel(refs[0], refs[1], refs[2], refs[-1], bias_ref=b_ref,
                    n=n, m=m, relu_in=relu_in)

        scratch_shapes = []

    out_ph = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_, h, w // 2, 2 * oc), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch_shapes,
    )(*args)

    # Column-phase interleave: [N, H, W/2, 2, O] -> [N, H, W, O] (one XLA
    # reshape pass; bias (c-blocked mode) / residual / relu fuse into it).
    out = out_ph.reshape(n_, h, w // 2, 2, oc).reshape(n_, h, w, oc)
    if accum and bias is not None:
        out = out + bias.astype(out.dtype)
    out = out.astype(x.dtype)
    if residual is not None:
        out = out + residual.astype(out.dtype)
    if relu_out:
        out = jnp.maximum(out, 0)
    return out
