"""The sharded serving step: one jitted XLA program over the ICI mesh.

Given a model (DepthPro or DepthAnything3 — anything exposing a pure
``fn(params, batch)``), place the params per tensor-parallel rules, shard the
batch dim over the ``data`` axis, and jit with explicit in/out shardings so
XLA's SPMD partitioner lays the collectives on ICI (SURVEY.md §2 "First-class
components the TPU build adds").
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from burn_depth_tpu.parallel.mesh import Rule, batch_sharding, shard_params


@dataclasses.dataclass
class ServingStep:
    """A compiled, mesh-sharded inference step with persistent device params."""

    mesh: Mesh
    params: Any  # placed on the mesh
    fn: Callable  # jitted (params, batch) -> outputs
    input_sharding: NamedSharding

    def __call__(self, batch: jnp.ndarray):
        batch = jax.device_put(batch, self.input_sharding)
        return self.fn(self.params, batch)

    def stage_input(self, host_batch) -> jax.Array:
        """Asynchronously upload a host batch to the mesh (returns immediately;
        the transfer overlaps compute — used by ``DepthStream``)."""
        return jax.device_put(host_batch, self.input_sharding)


def with_u8_ingest(forward_fn: Callable) -> Callable:
    """Wrap a forward fn to take packed u8 NCHW frames and ImageNet-normalize
    on device.  Quarters the host→HBM bytes versus shipping f32 — the upload
    lane, not compute, bounds streaming throughput (measured: DA3-large b=8
    end-to-end goes 8.8 → ~2x img/s on the tunnel-attached chip; on PCIe the
    ratio is smaller but the bytes saved are the same)."""
    from burn_depth_tpu.api.predict import IMAGENET_MEAN, IMAGENET_STD

    def wrapped(params, x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 3, 1, 1)
        std = jnp.asarray(IMAGENET_STD).reshape(1, 3, 1, 1)
        x = (x - mean) / std
        # Run the network in the MODEL's serving dtype.  Without this cast a
        # bf16-policy model silently promotes to f32 through the normalize
        # (f32 x bf16 -> f32): ~5x slower, and the 1536² flash-attention
        # kernel VMEM-OOMs at compile in f32 — found by the round-5 server
        # SLA bench, which could not even compile the production /infer
        # program on the chip.  int8 trees keep f32 biases/scales, so probe
        # for a bf16 leaf rather than trusting the first float leaf.
        import jax

        if any(
            getattr(leaf, "dtype", None) == jnp.bfloat16
            for leaf in jax.tree.leaves(params)
        ):
            x = x.astype(jnp.bfloat16)
        return forward_fn(params, x)

    return wrapped


def compile_serving_step(
    forward_fn: Callable,
    params: Any,
    mesh: Mesh,
    *,
    tp_rules: Sequence[Rule] = (),
    out_batch_sharded: bool = True,
    donate_input: bool = False,
) -> ServingStep:
    """Compile ``forward_fn(params, batch)`` over ``mesh``.

    ``params`` are placed once (replicated along ``data``, split along
    ``model`` per ``tp_rules``) and stay resident in HBM across calls —
    the "persistent weights" half of BASELINE config 4.
    """
    placed = shard_params(params, mesh, tp_rules)
    param_shardings = jax.tree.map(lambda a: a.sharding, placed)
    in_shard = batch_sharding(mesh, 4) if out_batch_sharded else NamedSharding(mesh, P())

    from burn_depth_tpu.core.knobs import kjit

    fn = kjit(
        forward_fn,
        in_shardings=(param_shardings, in_shard),
        donate_argnums=(1,) if donate_input else (),
    )
    return ServingStep(mesh=mesh, params=placed, fn=fn, input_sharding=in_shard)


def compile_multiview_step(
    model,
    mesh: Mesh,
    views: int,
    *,
    tp_rules: Sequence[Rule] = (),
    sp="gather",
) -> ServingStep:
    """Compile a view-sharded multi-view DA3 serving step.

    The batch is the flattened view set ``[B0·S, 3, H, W]`` (views of a scene
    contiguous), sharded over the ``data`` axis so each device encodes its own
    views; outputs (``DepthAnything3Inference``) keep the flat leading dim.

    ``sp="gather"`` (the default; ``True`` is an alias) routes the cross-view
    global blocks through the
    gather-KV sequence-parallel island (``parallel/sp.py``): queries stay
    view-sharded, only K/V move — exactly 2 all-gathers per global block,
    by construction.  ``sp="ring"`` rotates K/V around each scene's device
    ring instead (``ppermute`` + online softmax): same total bytes, neighbor
    ICI links only, peak K/V memory = one device block — for scenes too
    large to gather whole.  ``sp=False`` = plain GSPMD (the SPMD partitioner
    chooses the collectives for the merge reshape; currently it finds the
    same schedule as "gather", but that is heuristic, not contractual).
    All are numerically identical to single-device ``infer_multiview``
    (tests/test_parallel.py; "ring" up to online-softmax fp reordering).
    """
    from burn_depth_tpu.parallel.sp import ViewSP

    if sp in ("ring",):
        sp_plan = ViewSP(mesh, mode="ring")
    elif sp in (True, "gather"):
        sp_plan = ViewSP(mesh)
    elif sp in (False, None):
        sp_plan = None
    else:
        # strict: a typo'd mode string must not silently pick a schedule with
        # a different peak-memory profile
        raise ValueError(f"sp must be True/'gather', 'ring', or False/None; got {sp!r}")

    def fwd(params, flat):
        head_out, camera_pred, _ = model._forward_internal(
            params, flat, None, None, views=views, sp=sp_plan
        )
        return model._finalize(head_out, camera_pred)

    return compile_serving_step(fwd, model.params, mesh, tp_rules=tp_rules)
