"""Native checkpoint format: safetensors of ``/``-joined pytree paths.

Role of the reference's NamedMpk-with-f16 recorder
(``NamedMpkFileRecorder::<HalfPrecisionSettings>``, ``depth_pro/mod.rs:206``):
storage dtype is selectable (f16/bf16 halves disk+load time; compute dtype is
chosen at load), keys are the flattened param-tree paths, and loading is
structural against a template tree from ``Model.init`` so missing/unexpected
tensors are hard errors (matching the importer's strict apply report,
``import_depth_pro.rs:447-517``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        elif hasattr(k, "name"):
            # GetAttrKey (NamedTuple fields, e.g. optax states): use the bare
            # field name so the flat view is identical whether the tree holds
            # the NamedTuple or the plain-dict form an Orbax template-less
            # restore returns.
            parts.append(str(k.name))
        else:
            parts.append(str(k).lstrip("."))
    return "/".join(parts)


def flatten_tree(params: Any) -> dict[str, np.ndarray]:
    """Param pytree → ``{path: array}`` with ``/``-joined keys."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    return {_path_str(p): np.asarray(v) for p, v in leaves}


def unflatten_into(template: Any, flat: dict[str, np.ndarray], *, cast=True) -> Any:
    """Fill a template pytree from ``{path: array}``.

    Raises with the full lists of missing/unexpected keys (the reference's
    ``report_apply_result`` contract).  ``cast=True`` casts each tensor to the
    template leaf's dtype (f16-storage → f32-compute upcast).
    """
    paths = [(_path_str(p), p) for p, _ in jax.tree_util.tree_flatten_with_path(template)[0]]
    missing = [s for s, _ in paths if s not in flat]
    unexpected = sorted(set(flat) - {s for s, _ in paths})
    if missing or unexpected:
        raise KeyError(
            f"checkpoint/template mismatch: {len(missing)} missing, "
            f"{len(unexpected)} unexpected\nmissing: {missing[:20]}\nunexpected: {unexpected[:20]}"
        )

    flat_by_path = {s: flat[s] for s, _ in paths}

    def fill(path, leaf):
        arr = flat_by_path[_path_str(path)]
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(f"{_path_str(path)}: shape {arr.shape} != template {leaf.shape}")
        import jax.numpy as jnp

        return jnp.asarray(arr, dtype=leaf.dtype if cast else arr.dtype)

    return jax.tree_util.tree_map_with_path(fill, template)


def save_checkpoint(path: str, params: Any, *, storage_dtype: Optional[str] = None) -> None:
    """Save a param pytree as safetensors.  ``storage_dtype``: None keeps the
    in-memory dtypes; 'float16'/'bfloat16' down-cast floating leaves for the
    reference's half-precision storage behavior."""
    from safetensors.numpy import save_file

    flat = flatten_tree(params)
    if storage_dtype is not None:
        dt = np.dtype(storage_dtype) if storage_dtype != "bfloat16" else None
        import ml_dtypes

        target = np.dtype(ml_dtypes.bfloat16) if dt is None else dt
        flat = {
            k: v.astype(target) if np.issubdtype(v.dtype, np.floating) or v.dtype == ml_dtypes.bfloat16 else v
            for k, v in flat.items()
        }
    save_file(flat, path)


def load_checkpoint(path: str, template: Any) -> Any:
    """Load a native checkpoint (safetensors file or Orbax directory) into
    the dtypes/structure of ``template``.  Both formats go through the same
    strict ``unflatten_into`` missing/unexpected report; for sharded direct-
    to-device restore use ``io.orbax_io.load_orbax`` with a sharded template."""
    flat = load_flat_auto(path)
    return unflatten_into(template, flat)


def save_auto(path: str, tree: Any, *, storage_dtype: Optional[str] = None) -> None:
    """Format-dispatching save: directory / ``.orbax`` path → Orbax
    (``io/orbax_io.py``), anything else → native safetensors."""
    from burn_depth_tpu.io.orbax_io import is_orbax_path, save_orbax

    if is_orbax_path(path):
        save_orbax(path, tree)
    else:
        save_checkpoint(path, tree, storage_dtype=storage_dtype)


def load_flat_auto(path: str) -> dict[str, np.ndarray]:
    """Format-dispatching flat load: Orbax directory or safetensors file →
    the same ``{'/'-joined path: array}`` view."""
    from burn_depth_tpu.io.orbax_io import is_orbax_path, load_flat_orbax

    return load_flat_orbax(path) if is_orbax_path(path) else load_safetensors(path)


def checkpoint_keys(path) -> list[str]:
    """Flat key names of a native checkpoint WITHOUT loading tensor data:
    safetensors files get a header-only read, Orbax directories a
    metadata-only read (full flat load only as a last-resort fallback).
    Used for cheap structure sniffing (e.g. detecting a pre-calibrated int8
    tree before choosing a load template)."""
    import os

    p = os.fspath(path)
    if os.path.isdir(p) or p.endswith(".orbax"):
        from burn_depth_tpu.io.orbax_io import orbax_keys

        try:
            return orbax_keys(p)
        except Exception:  # older layouts without readable metadata
            return sorted(load_flat_auto(p).keys())
    from safetensors import safe_open

    with safe_open(p, framework="np") as f:
        return sorted(f.keys())


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    """Read any ``.safetensors`` file to ``{key: np.ndarray}`` (bf16-aware)."""
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="numpy") as f:
        for k in f.keys():
            # legacy native files spelled NamedTuple fields with a leading
            # '.' ("opt_state/1/0/.count"); canonical keys have no dot.
            out[k.replace("/.", "/").lstrip(".")] = f.get_tensor(k)
    return out
