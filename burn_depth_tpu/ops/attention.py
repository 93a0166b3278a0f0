"""Multi-head attention: Pallas flash-attention on TPU, jnp reference path
elsewhere.

This is the hot loop of every model here — e.g. Depth Pro's batched 35-tile
ViT-L pass is ~95% of its FLOPs (SURVEY.md §3.1).  Sequence lengths are short
and static (577 tokens for Depth Pro's 384² windows, ~1370 for DA3 @518²), so
the kernel keeps full K/V resident in VMEM and streams query blocks — no
online-softmax rescaling pass is needed, each query block sees every key in
one shot.  Scores and the softmax run in f32; inputs may be bf16.

VMEM budget at the worst case (DA3-L: T=1408 padded, hd=64, f32):
K + V = 2·1408·64·4 ≈ 720 KB, scores block 128·1408·4 ≈ 720 KB — comfortably
inside the ~16 MB/core VMEM.

KNOB CONTRACT: the ``BDT_ATTN_*`` serving knobs are read from the
environment at TRACE time, and every long-lived jit in the package —
the model/serving/train entry points and the jitted dispatchers in this
module — is built with ``core.knobs.kjit``, which folds a snapshot of all
``BDT_*`` variables into the jit cache key.  Toggling a knob after a
same-shape call therefore forces a retrace that re-reads the environment;
a stale program can no longer be silently reused
(``tests/test_knobs.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from burn_depth_tpu.core.knobs import kjit

try:  # pltpu is importable on CPU builds too; guard anyway.
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.lower() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


_LOG2E = 1.4426950408889634


def _exp2_mode() -> bool:
    """Serving knob ``BDT_ATTN_EXP2=1``: exponentiate scores with ``exp2``
    and have callers fold ``scale·log2e`` into q.  ``exp`` lowers to
    ``exp2(x·log2e)`` on the VPU — pre-folding the base change into the tiny
    ``[B,H,T,hd]`` q tensor drops a full ``[G,Bq,Tp]`` multiply pass per
    block.  Costs one bf16 rounding of q (~0.2% rel) — serving tier only.
    Only active when dispatch reaches the Pallas kernel (TPU)."""
    import os

    return os.environ.get("BDT_ATTN_EXP2", "0") == "1" and _on_tpu()


def fold_softmax_scale(q: jnp.ndarray, scale: float, impl: str = "auto"):
    """Fold the softmax scale into q where it costs nothing.

    Returns ``(q', residual_scale)``.  Power-of-two scales (hd=64 → 0.125
    everywhere here) fold bf16-EXACTLY (pure exponent shift).  Under
    ``BDT_ATTN_EXP2=1`` ``scale·log2e`` is folded instead and the kernel
    uses ``exp2`` — but ONLY when this call will actually reach the Pallas
    kernel (explicit ``pallas``, or ``auto`` on TPU with T>=128, mirroring
    ``multi_head_attention``'s dispatch): a base-e consumer fed log2e-scaled
    logits would silently run at the wrong temperature."""
    import math
    import os as _os

    if impl == "auto":  # same BDT_ATTN_IMPL override as multi_head_attention
        impl = _os.environ.get("BDT_ATTN_IMPL", "auto")
    pallas_bound = impl == "pallas" or (
        impl == "auto" and _on_tpu() and q.ndim >= 3 and q.shape[-2] >= 128
    )
    if pallas_bound and _exp2_mode():
        return q * jnp.asarray(scale * _LOG2E, q.dtype), 1.0
    if math.log2(scale).is_integer():
        return q * jnp.asarray(scale, q.dtype), 1.0
    return q, scale


# --------------------------------------------------------------------------
# jnp reference path
# --------------------------------------------------------------------------


def _attention_jnp(q, k, v, scale: float, quiet_softmax: bool):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    s = s.astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    if quiet_softmax:
        # softmax-with-one: +1 in the (unshifted) denominator.
        denom = denom + jnp.exp(-m)
    p = p / denom
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


# --------------------------------------------------------------------------
# Pallas TPU kernel
# --------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int, quiet: bool,
                  exp_bf16: bool = False, no_max: bool = False):
    """One (batch·head-group, q-block) grid cell: full-K attention for a
    group of G heads at once.  Grouping amortizes per-grid-step overhead —
    at 577 tokens a single (batch·head) cell is only ~0.2 MFLOP of MXU work,
    so the 560-cell grid was step-overhead-bound.

    The kernel is VPU-softmax-bound, NOT matmul-bound (attn_probe round 2:
    attention adds 3.0 ms/block while its two matmuls are ~0.3 ms).  A
    "lean" rewrite (mask-free denominator correction + division deferred to
    the AV output) was measured 40% SLOWER in f32 (10.1 vs 7.2 ms/block) —
    Mosaic scheduled the restructured passes worse, a reminder that its
    fusion behavior can invert source-level op counts.  This is the measured-
    fastest formulation; the one surviving knob:

    ``exp_bf16``: exp + divide passes in bf16 (packed 2/lane on the VPU) —
    serving-tier knob, ~0.4% weight error; default f32.

    ``no_max`` (serving knob ``BDT_ATTN_NOMAX=1``): skip the max-reduce +
    subtract passes AND the pad mask.  Padded keys score exactly 0 (zero
    pads), so their output contribution is killed by the zero-padded V rows
    and the denominator over-count is the compile-time constant
    ``t_pad - seq_len``.  Scores are clamped at 60 so a pathological logit
    cannot overflow f32 exp (legit ViT logits are well below; the clamp is
    one VPU pass vs the two reduce/sub passes it replaces).

    q/k/v stay in their storage dtype (bf16 on the serving path) so the MXU
    runs its native bf16×bf16→f32 passes.
    """
    q = q_ref[...]  # [G, Bq, hd]
    k = k_ref[...]  # [G, Tp, hd]
    v = v_ref[...]  # [G, Tp, hd]

    import os

    # bf16 score-matrix knob: halves VPU/VMEM width of every softmax pass at
    # ~0.7% relative output error.  The dot still accumulates f32 (this
    # Mosaic rejects bf16 dot accumulators) and downcasts immediately after.
    bf16_scores = os.environ.get("BDT_ATTN_BF16_SCORES", "0") == "1"
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [G, Bq, Tp]
    if bf16_scores:
        s = s.astype(jnp.bfloat16)
    if scale != 1.0:  # callers fold power-of-two scales into q (bf16-exact)
        s = s * jnp.asarray(scale, s.dtype)

    # BDT_ATTN_EXP2: scores arrive pre-multiplied by log2e (folded into q by
    # fold_softmax_scale); exponentiate base-2 — no hidden base-change pass.
    expf = jnp.exp2 if _exp2_mode() else jnp.exp

    t_pad = s.shape[-1]
    if no_max:
        s = jnp.minimum(s, 60.0 * (_LOG2E if expf is jnp.exp2 else 1.0))
        p = expf(s)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        # padded keys contribute exp(0)=1 each; quiet-softmax adds the
        # un-shifted "+1" (exact here since m is not subtracted).
        correction = (1.0 if quiet else 0.0) - float(t_pad - seq_len)
        if correction:
            denom = denom + correction
        p = (p / denom).astype(v.dtype)
        o_ref[...] = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)
        return

    # Mask padded keys (key dim is the last axis of [G, Bq, Tp]).
    if t_pad != seq_len:
        key_ids = lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
        s = jnp.where(key_ids < seq_len, s, -jnp.inf)

    m = jnp.max(s, axis=-1, keepdims=True)
    z = s - m
    if exp_bf16:
        p = expf(z.astype(jnp.bfloat16))
        denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
        if quiet:
            denom = denom + expf(-m)
        p = (p / denom.astype(jnp.bfloat16)).astype(v.dtype)
    else:
        p = expf(z)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        if quiet:
            denom = denom + expf(-m)
        p = (p / denom).astype(v.dtype)
    o_ref[...] = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _flash_kernel_interleaved(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int,
                              quiet: bool, chunks: int):
    """Probe variant: split the head group into ``chunks`` and emit the op
    stream software-pipelined — the QK^T matmul of chunk i+1 is issued before
    the softmax of chunk i — so Mosaic's scheduler can overlap MXU and VPU
    work across chunks.  The monolithic kernel's chain (dot → softmax → dot
    over the whole [G, Bq, Tp] block) serializes the units; the kernel is
    VPU-softmax-bound (attn_probe: ~3 ms/block vs ~0.3 ms of matmul), so any
    overlap is pure win IF the scheduler takes the bait."""

    def qk(i):
        lo = i * q_ref.shape[0] // chunks
        hi = (i + 1) * q_ref.shape[0] // chunks
        s = jax.lax.dot_general(
            q_ref[lo:hi], k_ref[lo:hi], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return s if scale == 1.0 else s * scale

    def softmax_av(i, s):
        t_pad = s.shape[-1]
        if t_pad != seq_len:
            key_ids = lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
            s = jnp.where(key_ids < seq_len, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        if quiet:
            denom = denom + jnp.exp(-m)
        lo = i * q_ref.shape[0] // chunks
        hi = (i + 1) * q_ref.shape[0] // chunks
        p = (p / denom).astype(v_ref.dtype)
        o_ref[lo:hi] = jax.lax.dot_general(
            p, v_ref[lo:hi], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    prev = qk(0)
    for i in range(1, chunks):
        cur = qk(i)  # MXU for chunk i while the VPU drains chunk i-1
        softmax_av(i - 1, prev)
        prev = cur
    softmax_av(chunks - 1, prev)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@kjit(
    static_argnames=(
        "scale", "quiet_softmax", "q_block", "head_group", "pad_hd", "exp_bf16", "no_max",
        "interleave",
    ),
)
def _attention_pallas(
    q, k, v, scale: float, quiet_softmax: bool, q_block: int = 0, head_group: int = 0,
    pad_hd: bool = True, exp_bf16: bool = False, no_max: bool = False, interleave: int = 0,
):
    b, h, t, hd = q.shape
    bh = b * h
    t_pad = _round_up(t, 128)
    if q_block <= 0:
        # One q-block per (batch·head) when the whole sequence fits: K/V are
        # then fetched once per grid cell instead of once per q-block.  The
        # query rows only need sublane alignment (16), not lane alignment
        # (128) — 592 instead of 640 rows at T=577 trims ~7.5% of the
        # attention matmul work (keys stay 128-padded and masked).
        # single q-block whenever the f32 score matrix fits the VMEM budget
        # (T≲1430): K/V fetched once per (batch·head-group) cell.
        fits = _round_up(t, 16) * t_pad * 4 <= 8 * 1024 * 1024
        q_block = _round_up(t, 16) if fits else 512
    q_block = min(q_block, t_pad)
    tq_pad = _round_up(t, q_block)
    # pad_hd=False: a block whose minor dim equals the FULL array dim is legal
    # in Mosaic even when <128, and skipping the 64→128 pad halves the qk^T
    # contraction work AND removes three whole-tensor pad copies per call.
    hd_pad = _round_up(hd, 128) if pad_hd or hd % 8 else hd

    if head_group <= 0:
        # Largest G with the score block [G, q_block, t_pad] ≲ 8 MB
        # (G=5 measured best for the 35×577 Depth Pro batch: 215.8 ms vs
        # 219.8 at G=2 and 224.5 ungrouped; G=8 exceeds VMEM at compile).
        # (G=8 under bf16 scores was probed and VMEM-OOMs — the q/k/v blocks
        # and softmax temporaries grow with G too; budget stays f32-sized.)
        budget = 8 * 1024 * 1024 // (q_block * t_pad * 4)
        head_group = max(1, min(8, budget))
    g = head_group
    while bh % g:
        g -= 1

    qf = q.reshape(bh, t, hd)
    kf = k.reshape(bh, t, hd)
    vf = v.reshape(bh, t, hd)
    qf = jnp.pad(qf, ((0, 0), (0, tq_pad - t), (0, hd_pad - hd)))
    kf = jnp.pad(kf, ((0, 0), (0, t_pad - t), (0, hd_pad - hd)))
    vf = jnp.pad(vf, ((0, 0), (0, t_pad - t), (0, hd_pad - hd)))

    grid = (bh // g, tq_pad // q_block)
    if interleave > 1 and g > 1:
        kernel = functools.partial(
            _flash_kernel_interleaved, scale=scale, seq_len=t, quiet=quiet_softmax,
            chunks=min(interleave, g),
        )
    else:
        kernel = functools.partial(
            _flash_kernel, scale=scale, seq_len=t, quiet=quiet_softmax, exp_bf16=exp_bf16,
            no_max=no_max,
        )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, hd_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, q_block, hd_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, t_pad, hd_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, t_pad, hd_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, q_block, hd_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
    )(qf, kf, vf)
    return out[:, :t, :hd].reshape(b, h, t, hd)


# --------------------------------------------------------------------------
# differentiable Pallas dispatch (training path)
# --------------------------------------------------------------------------
#
# ``pallas_call`` has no autodiff rule, so the training subsystem
# (``burn_depth_tpu/train/``) needs a VJP for the flash kernel.  TPU-first
# split: keep the measured-fastest Pallas kernel as the *forward*, and define
# the backward as the exact VJP of the jnp reference formulation (whose
# outputs the kernel matches bit-for-bit — BENCH.md r1 "outputs
# bit-identical").  The backward is pure batched matmuls + softmax algebra,
# which XLA already schedules well on the MXU; activations (q, k, v) are the
# only residuals, so memory behaves like flash-attention recompute.


def _flash_bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                      scale: float, seq_len: int, quiet: bool):
    """One (batch·head-group, q-block) cell of the flash backward.

    Recomputes P = softmax(qkᵀ·scale) for this q-block entirely in VMEM —
    the [T, T] score/probability/dS tensors never touch HBM (the jnp-vjp
    backward materializes three of them per block: measured 3.1 ms/block at
    DA3-large geometry vs ~0.9 ms fwd, ~65% of a ViT train chain's grad
    time).  Uses the flash identity rowsum(dP∘P) = rowsum(dO∘O), which holds
    for quiet softmax too (the +1 denominator term has zero score-gradient).
    dK/dV accumulate across q-block grid steps into f32 out blocks whose
    index_map is constant in the q dim (the block stays VMEM-resident).
    """
    j = pl.program_id(1)
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    o = o_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [G, Bq, Tp]
    key_valid = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) < seq_len
    s = jnp.where(key_valid, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    z = jnp.sum(p, axis=-1, keepdims=True)
    if quiet:
        z = z + jnp.exp(-m)
    p = p / z  # [G, Bq, Tp] f32, rows over pad keys are exactly 0

    # dP = dO Vᵀ ; D = rowsum(dO ∘ O) ; dS = P ∘ (dP − D) · scale
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    d = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - d) * scale  # [G, Bq, Tp]

    ds_c = ds.astype(q.dtype)
    p_c = p.astype(q.dtype)
    dq_ref[...] = jax.lax.dot_general(
        ds_c, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dk_j = jax.lax.dot_general(
        ds_c, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [G, Tp, hd]
    dv_j = jax.lax.dot_general(
        p_c, do.astype(q.dtype), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _init():
        dk_ref[...] = dk_j
        dv_ref[...] = dv_j

    @pl.when(j > 0)
    def _accum():
        dk_ref[...] += dk_j
        dv_ref[...] += dv_j


@kjit(static_argnames=("scale", "quiet"))
def _attention_pallas_bwd(q, k, v, o, do, scale: float, quiet: bool):
    """Flash backward over ``[B, H, T, hd]``: returns (dq, dk, dv)."""
    b, h, t, hd = q.shape
    bh = b * h
    t_pad = _round_up(t, 128)
    hd_pad = _round_up(hd, 128) if hd % 8 else hd

    # q-block sizing: TWO f32 [G, q_block, Tp] matrices (P and dP/dS) live at
    # once — budget ≈ 10 MB of the ~16 MB VMEM, leaving room for k/v/dk/dv
    budget = 10 * 1024 * 1024
    per_row = 2 * t_pad * 4
    qb_cap = max((budget // per_row) // 16 * 16, 16)
    # split the q range into the fewest equal chunks that fit the cap, so
    # the last block carries at most 15 padded rows (a naive min(T, cap)
    # block would pad DA3's T=1374 out to 2x928 — 35% wasted q rows)
    n_chunks = max(1, -(-_round_up(t, 16) // qb_cap))
    q_block = _round_up(-(-t // n_chunks), 16)
    tq_pad = n_chunks * q_block
    g = max(1, min(8, budget // (per_row * q_block)))
    while bh % g:
        g -= 1

    def flat_pad(x, rows):
        x = x.reshape(bh, t, hd)
        return jnp.pad(x, ((0, 0), (0, rows - t), (0, hd_pad - hd)))

    qf, of, dof = (flat_pad(x, tq_pad) for x in (q, o, do))
    kf, vf = (flat_pad(x, t_pad) for x in (k, v))

    grid = (bh // g, tq_pad // q_block)
    kernel = functools.partial(_flash_bwd_kernel, scale=scale, seq_len=t, quiet=quiet)
    q_spec = pl.BlockSpec((g, q_block, hd_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((g, t_pad, hd_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bh, tq_pad, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((bh, t_pad, hd_pad), jnp.float32),
            jax.ShapeDtypeStruct((bh, t_pad, hd_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, q_spec],
        out_specs=(q_spec, kv_spec, kv_spec),
    )(qf, kf, vf, of, dof)

    unflat = lambda x: x[:, :t, :hd].reshape(b, h, t, hd)
    return unflat(dq).astype(q.dtype), unflat(dk).astype(k.dtype), unflat(dv).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention_pallas_diff(q, k, v, scale: float, quiet: bool):
    return _attention_pallas(q, k, v, scale=scale, quiet_softmax=quiet)


def _attention_pallas_diff_fwd(q, k, v, scale: float, quiet: bool):
    out = _attention_pallas(q, k, v, scale=scale, quiet_softmax=quiet)
    return out, (q, k, v, out)


def _attention_pallas_diff_bwd(scale: float, quiet: bool, residuals, g):
    q, k, v, o = residuals
    import os

    mode = os.environ.get("BDT_ATTN_BWD", "auto")
    # auto: the flash backward wins where the [T,T] HBM tensors are the cost
    # (measured 24-block chains: 2.2x at T=1374/B=2, 1.8x at T=577/B=35) but
    # loses to XLA at tiny T (T=65 tile windows: 138 -> 149 ms end-to-end),
    # where kernel overhead dominates — gate on sequence length.
    if mode == "jnp" or (mode == "auto" and q.shape[2] < 128):
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _attention_jnp(q_, k_, v_, scale, quiet), q, k, v
        )
        return vjp(g)
    return _attention_pallas_bwd(q, k, v, o, g, scale, quiet)


_attention_pallas_diff.defvjp(_attention_pallas_diff_fwd, _attention_pallas_diff_bwd)


def _flash_kernel_packed(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int, quiet: bool):
    """Packed-qkv cell: q_ref [1,Bq,1,G,hd], k/v_ref [1,Tp,1,G,hd] are three
    views of the same [B,T,3,H,hd] array (different dim-2 index_maps), so the
    [B,H,T,hd] relayout never exists in HBM; the (token, head) transpose
    happens in VMEM."""
    q = q_ref[0, :, 0].swapaxes(0, 1)  # [G, Bq, hd]
    k = k_ref[0, :, 0].swapaxes(0, 1)  # [G, Tp, hd]
    v = v_ref[0, :, 0].swapaxes(0, 1)

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [G, Bq, Tp]
    t_pad = s.shape[-1]
    if t_pad != seq_len:
        key_ids = lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
        s = jnp.where(key_ids < seq_len, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    if quiet:
        denom = denom + jnp.exp(-m)
    p = (p / denom).astype(v.dtype)
    out = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [G, Bq, hd]
    g, bq, hd = out.shape
    o_ref[0] = out.swapaxes(0, 1).reshape(bq, g * hd).astype(o_ref.dtype)


@kjit(static_argnames=("scale", "quiet_softmax", "q_block", "head_group"))
def _attention_pallas_packed(qkv, scale: float, quiet_softmax: bool, q_block: int = 0, head_group: int = 0):
    """``qkv: [B, T, 3, H, hd]`` (the natural reshape of the qkv matmul
    output) → ``[B, T, H·hd]`` with no HBM relayouts."""
    b, t, _, h, hd = qkv.shape
    t_pad = _round_up(t, 128)
    # Mosaic requires the block's second-to-last dim (the head slice) to be
    # tile-aligned or equal to the full dim — take all heads per cell and
    # size the q block so the f32 score tensor [H, q_block, t_pad] fits VMEM.
    g = h if head_group <= 0 else head_group
    if q_block <= 0:
        q_block = max(128, (8 * 1024 * 1024 // (g * t_pad * 4)) // 128 * 128)
    q_block = min(q_block, t_pad)
    while t_pad % q_block:
        q_block -= 128

    qkv_p = jnp.pad(qkv, ((0, 0), (0, t_pad - t), (0, 0), (0, 0), (0, 0)))
    grid = (b, h // g, t_pad // q_block)
    out = pl.pallas_call(
        functools.partial(_flash_kernel_packed, scale=scale, seq_len=t, quiet=quiet_softmax),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, h * hd), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, 1, g, hd), lambda i, j, q: (i, q, 0, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, 1, g, hd), lambda i, j, q: (i, 0, 1, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, 1, g, hd), lambda i, j, q: (i, 0, 2, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, q_block, g * hd), lambda i, j, q: (i, q, j), memory_space=pltpu.VMEM
        ),
    )(qkv_p, qkv_p, qkv_p)
    return out[:, :t]


def _flash_kernel_packed4(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int, quiet: bool):
    """4-D packed cell: q_ref [1, Bq, G, hd], k/v_ref [1, Tp, G, hd] are
    slices of the same [B, T, 3H, hd] array (dim-2 index_maps offset by 0/H/
    2H), so the [B,H,T,hd] relayouts never exist in HBM; the (token, head)
    transpose happens on 3-D VMEM blocks (the 5-D variant crashed Mosaic)."""
    q = q_ref[0].swapaxes(0, 1)  # [G, Bq, hd] — Mosaic needs batch dim at pos 0
    k = k_ref[0].swapaxes(0, 1)  # [G, Tp, hd]
    v = v_ref[0].swapaxes(0, 1)

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    if scale != 1.0:
        s = s * scale
    t_pad = s.shape[-1]
    if t_pad != seq_len:
        key_ids = lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
        s = jnp.where(key_ids < seq_len, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    if quiet:
        denom = denom + jnp.exp(-m)
    p = (p / denom).astype(v.dtype)
    out = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [G, Bq, hd]
    o_ref[0] = out.swapaxes(0, 1).astype(o_ref.dtype)  # [Bq, G, hd]


@kjit(static_argnames=("num_heads", "scale", "quiet_softmax", "head_group", "q_block"))
def _attention_pallas_packed4(qkv3, num_heads: int, scale: float, quiet_softmax: bool,
                              head_group: int = 8, q_block: int = 128):
    """``qkv3: [B, T, 3H, hd]`` (row order [3, H] — the packed projection's
    natural reshape) → ``[B, T, H·hd]``.

    Mosaic constrains the block's second-to-last dim (the head slice) to a
    multiple of 8 → ``head_group=8``; the f32 score block [8, q_block, Tp]
    forces a q split.  K/V block indices are q-invariant and q is the
    minor-most grid dim, so K/V are fetched once per (batch, head-group)."""
    b, t, three_h, hd = qkv3.shape
    h = num_heads
    if h % head_group:
        raise ValueError(f"packed4 needs head_group | num_heads ({head_group} vs {h})")
    g = head_group
    t_pad = _round_up(t, 128)
    qb = min(q_block, t_pad)
    tq_pad = _round_up(t, qb)

    qkv_p = jnp.pad(qkv3, ((0, 0), (0, max(t_pad, tq_pad) - t), (0, 0), (0, 0)))
    grid = (b, h // g, tq_pad // qb)
    out = pl.pallas_call(
        functools.partial(_flash_kernel_packed4, scale=scale, seq_len=t, quiet=quiet_softmax),
        out_shape=jax.ShapeDtypeStruct((b, tq_pad, h, hd), qkv3.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, qb, g, hd), lambda i, j, q: (i, q, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, t_pad, g, hd), lambda i, j, q: (i, 0, h // g + j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, t_pad, g, hd), lambda i, j, q: (i, 0, 2 * (h // g) + j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, qb, g, hd), lambda i, j, q: (i, q, j, 0), memory_space=pltpu.VMEM
        ),
    )(qkv_p, qkv_p, qkv_p)
    # [B, Tq, H, hd] -> [B, T, D]: contiguous minor dims, a free reshape.
    return out[:, :t].reshape(b, t, h * hd)


def attention_packed_qkv(
    qkv: jnp.ndarray,  # [B, T, 3, H, hd]
    scale: float | None = None,
    quiet_softmax: bool = False,
    impl: str = "auto",
) -> jnp.ndarray:
    """Attention straight from the packed qkv projection → ``[B, T, H·hd]``.

    EXPERIMENTAL, not the default: skipping the two HBM relayouts is worth
    ~0.5 ms/layer on paper, but this Mosaic build crashes (remote_compile
    HTTP 500) lowering the 5-D blocks + in-VMEM (token, head) transpose at
    ViT-L shapes; the interpret-mode path is correct (tested).  Revisit on a
    newer Mosaic."""
    b, t, _, h, hd = qkv.shape
    if scale is None:
        scale = float(hd) ** -0.5
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "jnp"
    if impl == "pallas":
        return _attention_pallas_packed(qkv, scale=scale, quiet_softmax=quiet_softmax)
    q, k, v = (qkv.transpose(2, 0, 3, 1, 4)[i] for i in range(3))
    out = _attention_jnp(q, k, v, scale, quiet_softmax)
    return out.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    quiet_softmax: bool = False,
    impl: str = "auto",
) -> jnp.ndarray:
    """Scaled-dot-product attention over ``[B, H, T, hd]`` tensors.

    ``impl``: ``"auto"`` (pallas on TPU, jnp elsewhere), ``"pallas"``, ``"jnp"``.
    ``BDT_ATTN_IMPL`` overrides an ``"auto"`` at trace time — probe/baseline
    knob (e.g. tools/tier_drift.py pins ``jnp`` for its raised-precision f32
    baseline: Mosaic's dot lowering rejects non-default matmul precision).
    """
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    if impl == "auto":
        import os as _os

        impl = _os.environ.get("BDT_ATTN_IMPL", "auto")
    if impl == "auto":
        # Same T>=128 gate as the flash BACKWARD: at tiny T the XLA softmax
        # path is faster (train_attn_probe: T=65 jnp 138 ms vs pallas 149),
        # and this Mosaic rejects the kernel's sub-128 q-tile dot outright
        # (vector<16x128> matmul lowering error — caught by the opt-in
        # real-TPU smoke, tests/test_backend_matrix.py).
        impl = "pallas" if _on_tpu() and q.shape[2] >= 128 else "jnp"
    if impl == "pallas":
        import os

        pad_hd = os.environ.get("BDT_ATTN_NOPAD", "0") != "1"
        exp_bf16 = os.environ.get("BDT_ATTN_EXP_BF16", "0") == "1"
        no_max = os.environ.get("BDT_ATTN_NOMAX", "0") == "1"
        interleave = int(os.environ.get("BDT_ATTN_INTERLEAVE", "0"))
        # exp2 counts as a serving-only knob: the differentiable wrapper's
        # backward recomputes probabilities base-e, so letting it wrap an
        # exp2 forward would produce silently wrong gradients — route to the
        # plain kernel instead (differentiating it fails loudly).
        if pad_hd and not (exp_bf16 or no_max or interleave or _exp2_mode()):
            # knob-free default: the differentiable wrapper (same kernel,
            # same arguments — plus a VJP so training works on TPU)
            return _attention_pallas_diff(q, k, v, scale, quiet_softmax)
        return _attention_pallas(
            q, k, v, scale=scale, quiet_softmax=quiet_softmax, pad_hd=pad_hd,
            exp_bf16=exp_bf16, no_max=no_max, interleave=interleave,
        )
    if impl == "jnp":
        return _attention_jnp(q, k, v, scale, quiet_softmax)
    if impl == "splash":
        # jax's reference TPU flash-attention kernel (no quiet-softmax path).
        if quiet_softmax:
            raise ValueError("splash impl does not support quiet_softmax")
        from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

        from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

        b, _, t, _ = q.shape
        pad = (-t) % 128
        if pad:
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
            # padded keys masked via segment ids (segment 0 = padding)
            seg = jnp.concatenate(
                [jnp.ones((b, t), jnp.int32), jnp.zeros((b, pad), jnp.int32)], axis=1
            )
            out = flash_attention(
                qp, kp, vp, segment_ids=SegmentIds(q=seg, kv=seg), sm_scale=scale
            )
            return out[:, :, :t]
        return flash_attention(q, k, v, sm_scale=scale)
    raise ValueError(f"unknown attention impl `{impl}`")


def attention_bthd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    quiet_softmax: bool = False,
    impl: str = "auto",
) -> jnp.ndarray:
    """Attention over token-major ``[B, T, H, hd]`` tensors → ``[B, T, H·hd]``.

    NOT the default path.  A/B-benched on v5e (Depth Pro 1536² b=1 full
    infer): the models' head-major layout + Pallas flash kernel = 243 ms;
    routing the ViT blocks through this token-major layout = 308 ms for both
    the strided-einsum and relayout variants — XLA schedules the strided
    head-dim accesses worse than one materialized transpose.  Kept as an
    opt-in for future kernels that consume packed qkv directly.

    ``impl``: ``"auto"``/``"jnp"`` = relayout + head-major softmax path;
    ``"einsum"`` = strided token-major path; ``"pallas"`` = flash kernel.
    """
    b, t, h, hd = q.shape
    if scale is None:
        scale = float(hd) ** -0.5
    if impl == "pallas":
        out = _attention_pallas(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
            scale=scale, quiet_softmax=quiet_softmax,
        )
        return out.transpose(0, 2, 1, 3).reshape(b, t, h * hd)

    if impl == "einsum":
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        if quiet_softmax:
            denom = denom + jnp.exp(-m)
        p = (p / denom).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32)
        return out.astype(v.dtype).reshape(b, t, h * hd)

    # auto / jnp: one relayout to [B,H,T,hd], attention, relayout back.
    out = _attention_jnp(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        scale, quiet_softmax,
    )
    return out.transpose(0, 2, 1, 3).reshape(b, t, h * hd)
