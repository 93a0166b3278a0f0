"""Mesh construction and sharding annotation helpers.

TPU-native replacement for the reference's absent distributed layer (its only
concurrency is host-side: one Bevy async task + a bounded camera channel,
reference ``crates/bevy_burn_depth/src/main.rs:36``, ``platform.rs:25``).
Here parallelism is expressed declaratively: a ``Mesh`` names the ICI axes,
``NamedSharding`` annotates arrays, and XLA's SPMD partitioner inserts the
collectives.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a ``(data, model)`` mesh over ``devices`` (default: all).

    ``data`` defaults to ``len(devices) // model``.  On a real slice the
    device order from ``jax.devices()`` already follows the physical torus, so
    neighboring mesh coordinates map to ICI neighbors; ``model`` is the minor
    (fastest-varying) axis so tensor-parallel collectives ride the shortest
    links.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def make_multihost_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    model: int = 1,
    group_fn=None,
) -> Mesh:
    """``(data, model)`` mesh for multi-host / multi-slice topologies.

    Single-host parity: with one device group this is exactly
    :func:`make_mesh`.  With several groups (hosts on a pod, or Megascale
    slices connected over DCN), devices are ordered **group-major** so that

    * the ``model`` axis always lies inside one group — its per-block psums
      (the latency-critical collectives) never leave ICI;
    * the ``data`` axis factors as ``(groups, per_group_data)`` with the
      group factor outermost — consecutive data shards stay on one slice,
      and the only traffic that crosses DCN is the data-axis reduction
      (gradient psum in training; none at all in DP serving, which makes
      multi-slice serving embarrassingly parallel).

    This is the hand-rolled equivalent of
    ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` for the 2-D
    ``(data, model)`` case, kept explicit so it also works on devices
    without slice metadata (CPU test meshes) via ``group_fn``.

    ``group_fn(device) -> key`` overrides the grouping (default:
    ``slice_index`` when the platform exposes it, else ``process_index``).
    Every group must contribute the same number of devices, and ``model``
    must divide the per-group count.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if group_fn is None:
        def group_fn(d):
            s = getattr(d, "slice_index", None)
            return s if s is not None else getattr(d, "process_index", 0)

    groups: dict = {}
    for d in devices:
        groups.setdefault(group_fn(d), []).append(d)
    if len(groups) <= 1:
        return make_mesh(devices, model=model)
    sizes = {k: len(v) for k, v in groups.items()}
    per = len(devices) // len(groups)
    if any(s != per for s in sizes.values()):
        raise ValueError(f"uneven device groups: {sizes}")
    if per % model:
        raise ValueError(f"{per} devices per group not divisible by model={model}")
    ordered = [d for k in sorted(groups) for d in groups[k]]
    # group-major data axis: reshape (G, per//model, model) → (G*per//model, model)
    dev_array = np.asarray(ordered).reshape(len(groups) * (per // model), model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int, batch_dim: int = 0) -> NamedSharding:
    """Shard dimension ``batch_dim`` of an ``ndim``-D array over ``data``."""
    spec = [None] * ndim
    spec[batch_dim] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# --------------------------------------------------------------------------
# Param-tree sharding by path rules
# --------------------------------------------------------------------------

Rule = tuple[str, P]  # (path regex, partition spec)


def _path_str(path) -> str:
    """KeyPath → a '/'-joined string like ``blocks/3/attn/qkv/weight``."""
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def shard_params(
    params,
    mesh: Mesh,
    rules: Sequence[Rule] = (),
    *,
    device_put: bool = True,
):
    """Annotate/place a param pytree: first matching regex rule wins; arrays
    with no matching rule are fully replicated.

    With ``device_put=False`` returns the tree of ``NamedSharding`` (for use
    as ``jit(..., in_shardings=...)``); otherwise returns the placed arrays.
    """
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def sharding_for(path, leaf) -> NamedSharding:
        s = _path_str(path)
        for pat, spec in compiled:
            if pat.search(s):
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    shardings = jax.tree_util.tree_map_with_path(sharding_for, params)
    if not device_put:
        return shardings
    return jax.tree.map(jax.device_put, params, shardings)
