"""Sequence (view) parallelism for multi-view DA3: gather-KV cross-view
attention.

Multi-view inference (``DepthAnything3.infer_multiview``, S>1 — the one
workload axis in this framework where sequence length actually grows) runs
global blocks that attend over the merged ``S·T``-token sequence
(``vit/dinov2.py::_block_forward``).  Under plain GSPMD with the view axis
sharded over ``data``, the collective schedule for that merge-reshape is
whatever the SPMD partitioner's heuristics pick — on the current toolchain
at the tested geometry it happens to pick the optimal one (2 gathers per
global block, same bytes as this module), but that choice is not a
contract and can regress with partitioner versions, mesh shapes, or the
surrounding program.

This module is the explicit TPU-native form — a ``shard_map`` island around
the global block's attention that makes the minimum-traffic schedule
*contractual*:

* **queries stay view-sharded** — each device attends only for its own views;
* only **K and V are all-gathered** along ``data`` (2 collectives per global
  block, each ``S·T·D`` bytes — the minimum any exact cross-view attention
  must move), grouped per scene so batched multi-scene calls never mix keys
  across scenes;
* the attention output is born view-sharded — no second collective, no
  round-trip resharding.

View-local blocks, the DPT head, and the camera decoder never see a
collective: they stay batch-sharded GSPMD exactly like single-view serving.

``ViewSP(mode="ring")`` swaps the gather for ring attention: K/V blocks
rotate around the scene's device ring (``ppermute``, one disjoint cycle per
scene) with flash-style online-softmax accumulation.  Same total bytes, but
neighbor-link ICI only, transfer overlapped with each step's attention math,
and peak K/V memory = one device block instead of the whole gathered scene —
the scaling form for when ``S·T`` outgrows a device's memory budget.

Verified HLO collective budget (``tests/test_parallel.py``): the SP program
contains exactly ``2 × n_global_blocks`` all-gathers, each moving one
scene's K (or V) rows — the minimum any exact cross-view attention must
move — and numerics match the single-device ``infer_multiview`` on the
8-device CPU mesh with scenes spanning devices.

Reference counterpart: none — the reference is single-device, single-view
(SURVEY.md §2 "Parallelism components — explicit statement"); this is
north-star scaling surface on top of the beyond-parity multi-view extension.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from burn_depth_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

__all__ = ["ViewSP", "cross_view_attention_sp"]


@dataclasses.dataclass(frozen=True)
class ViewSP:
    """Sequence-parallel plan for cross-view attention.

    ``axis`` names the mesh axis the flattened ``[B0·S, ...]`` view batch is
    sharded over (the serving step's ``data`` axis).  Pass via
    ``DepthAnything3._forward_internal(..., sp=ViewSP(mesh))`` or
    ``serve.compile_multiview_step(..., sp=True)``.

    ``mode``:

    * ``"gather"`` (default) — all-gather each scene's K/V once, attend in
      one shot.  Minimum collective *count*; peak K/V memory is the full
      ``S·T`` scene.
    * ``"ring"`` — rotate K/V blocks around the scene's device ring with
      ``ppermute``, accumulating flash-style online softmax.  Same bytes
      moved in total, but only neighbor ICI links are used, each step's
      transfer overlaps the previous block's attention math, and peak K/V
      memory stays at ONE device block — the right trade once ``S·T``
      outgrows what a gathered scene comfortably holds.  Numerics are exact
      softmax (online rescaling), equal to ``"gather"`` up to fp reordering.
    """

    mesh: Mesh
    axis: str = DATA_AXIS
    mode: str = "gather"

    def shards(self) -> int:
        return self.mesh.shape[self.axis]

    def model_axis(self) -> Optional[str]:
        """The tensor-parallel axis, if the mesh has one of size > 1."""
        if MODEL_AXIS in self.mesh.axis_names and self.mesh.shape[MODEL_AXIS] > 1:
            return MODEL_AXIS
        return None


def _scene_groups(dp: int, chunk: int, views: int) -> Optional[list[list[int]]]:
    """Gather groups: the devices holding each scene's views.

    Device ``d`` holds rows ``[d·chunk, (d+1)·chunk)`` of the flattened
    ``[B0·S]`` batch; a group is the run of ``views // chunk`` devices whose
    rows are one scene.  ``None`` when every device already holds whole
    scenes (no collective needed).
    """
    if chunk % views == 0:
        return None  # whole scenes per device — attention is device-local
    per_scene = views // chunk
    return [list(range(g * per_scene, (g + 1) * per_scene)) for g in range(dp // per_scene)]


def cross_view_attention_sp(
    sp: ViewSP,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    views: int,
    scale: float,
    quiet_softmax: bool,
) -> jnp.ndarray:
    """Cross-view attention over ``[B0·S, H, T, hd]`` q/k/v, queries kept
    view-sharded, K/V gathered per scene.  Numerically identical to merging
    the view axis into the sequence and attending globally (the GSPMD path
    in ``_block_forward``) — softmax over a query's full ``S·T`` key set.

    Static preconditions (all shapes are trace-time constants):
      * ``B0·S % dp == 0`` (even view sharding),
      * each device's row chunk is whole views of ONE scene, or whole scenes
        (``chunk % S == 0`` or ``S % chunk == 0``),
      * ``H % model == 0`` when the mesh has a model axis (heads split over
        TP shards inside the island, matching the head-aligned TP layout).
    """
    b, h, t, hd = q.shape
    if b % views:
        raise ValueError(f"flat batch {b} not divisible by views {views}")
    dp = sp.shards()
    if b % dp:
        raise ValueError(f"flat view batch {b} not divisible by {dp} '{sp.axis}' shards")
    chunk = b // dp
    if views % chunk and chunk % views:
        raise ValueError(
            f"device chunk of {chunk} rows straddles scenes: views={views} "
            f"must be a multiple (or divisor) of rows-per-device"
        )
    maxis = sp.model_axis()
    mp = sp.mesh.shape[maxis] if maxis else 1
    if h % mp:
        raise ValueError(f"{h} heads not divisible by model axis {mp}")
    if sp.mode not in ("gather", "ring"):
        raise ValueError(f"unknown ViewSP mode {sp.mode!r} (gather|ring)")
    groups = _scene_groups(dp, chunk, views)
    ring = sp.mode == "ring" and groups is not None

    def island(ql, kl, vl):
        if ring:
            return _ring_island(sp, ql, kl, vl, views, chunk, t, scale, quiet_softmax)
        # local shapes: [chunk, H/mp, T, hd]
        hl = ql.shape[1]
        if groups is None:
            # whole scenes are device-local: merge views in-core, no collective
            scenes = chunk // views
            def seq(a):  # [chunk, hl, T, hd] -> [scenes, hl, S·T, hd]
                return (
                    a.reshape(scenes, views, hl, t, hd)
                    .transpose(0, 2, 1, 3, 4)
                    .reshape(scenes, hl, views * t, hd)
                )
            out = _attend(seq(ql), seq(kl), seq(vl), scale, quiet_softmax)
            return (
                out.reshape(scenes, hl, views, t, hd)
                .transpose(0, 2, 1, 3, 4)
                .reshape(chunk, hl, t, hd)
            )
        # gather this scene's K/V rows (group = the devices of one scene);
        # tiled=True concatenates along the row axis in group order, which is
        # ascending device index == ascending view index.
        kg = jax.lax.all_gather(kl, sp.axis, axis_index_groups=groups, tiled=True)
        vg = jax.lax.all_gather(vl, sp.axis, axis_index_groups=groups, tiled=True)
        q_seq = ql.transpose(1, 0, 2, 3).reshape(1, hl, chunk * t, hd)
        k_seq = kg.transpose(1, 0, 2, 3).reshape(1, hl, views * t, hd)
        v_seq = vg.transpose(1, 0, 2, 3).reshape(1, hl, views * t, hd)
        out = _attend(q_seq, k_seq, v_seq, scale, quiet_softmax)  # [1, hl, chunk·T, hd]
        return out.reshape(hl, chunk, t, hd).transpose(1, 0, 2, 3)

    spec = P(sp.axis, maxis, None, None)
    return jax.shard_map(
        island, mesh=sp.mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)


def _ring_island(
    sp: ViewSP,
    ql: jnp.ndarray,
    kl: jnp.ndarray,
    vl: jnp.ndarray,
    views: int,
    chunk: int,
    t: int,
    scale: float,
    quiet_softmax: bool,
) -> jnp.ndarray:
    """Ring cross-view attention body (runs inside the shard_map island).

    Each step attends the local queries against the currently-held K/V block
    and rotates the block one hop around the scene's device ring
    (``ppermute`` with one disjoint cycle per scene), flash-style online
    softmax carrying (m, denom, acc) across steps.  ``R-1`` permutes per
    K and V — neighbor-link traffic only, transfer overlapped with the next
    block's scores by XLA's async pair (collective-permute-start/done).

    Local shapes: ``[chunk, hl, T, hd]``; queries flatten to one
    ``[1, hl, chunk·T, hd]`` scene slice (rows of ONE scene by the
    no-straddling precondition).
    """
    per_scene = views // chunk
    groups = _scene_groups(sp.shards(), chunk, views)
    perm = [(g[i], g[(i + 1) % per_scene]) for g in groups for i in range(per_scene)]

    hl = ql.shape[1]
    q_seq = ql.transpose(1, 0, 2, 3).reshape(1, hl, chunk * t, hd := ql.shape[-1])

    m = jnp.full((1, hl, chunk * t, 1), -jnp.inf, jnp.float32)
    denom = jnp.zeros((1, hl, chunk * t, 1), jnp.float32)
    acc = jnp.zeros((1, hl, chunk * t, hd), jnp.float32)
    k_blk, v_blk = kl, vl
    for step in range(per_scene):
        k_seq = k_blk.transpose(1, 0, 2, 3).reshape(1, hl, chunk * t, hd)
        v_seq = v_blk.transpose(1, 0, 2, 3).reshape(1, hl, chunk * t, hd)
        if step + 1 < per_scene:  # rotate while the math below runs
            k_blk = jax.lax.ppermute(k_blk, sp.axis, perm)
            v_blk = jax.lax.ppermute(v_blk, sp.axis, perm)
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q_seq, k_seq, preferred_element_type=jnp.float32
        ) * scale
        s = s.astype(jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        denom = denom * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v_seq.dtype), v_seq,
            preferred_element_type=jnp.float32,
        )
        m = m_new
    if quiet_softmax:
        denom = denom + jnp.exp(-m)  # softmax-with-one: +1 unshifted
    out = (acc / denom).astype(vl.dtype)  # [1, hl, chunk·T, hd]
    return out.reshape(hl, chunk, t, hd).transpose(1, 0, 2, 3)


def _attend(q, k, v, scale: float, quiet_softmax: bool) -> jnp.ndarray:
    """Rectangular (Tq != Tkv) softmax attention inside the shard_map island.

    Delegates to the XLA einsum path (``ops/attention._attention_jnp``) so SP
    and merge-path numerics are formulation-identical: the Pallas flash
    kernel assumes square Tq=Tkv (ops/attention.py:257) and XLA attention
    measured within noise of it at these sequence lengths anyway (BENCH.md
    attention-formulation study).  ``scale`` arrives pre-folded into q by
    ``fold_softmax_scale`` (then 1.0) or raw — both flow through unchanged.
    """
    from burn_depth_tpu.ops.attention import _attention_jnp

    return _attention_jnp(q, k, v, scale, quiet_softmax)
