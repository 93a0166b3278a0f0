"""Parameter-pytree helpers.

Parameters are plain nested dicts/lists of ``jnp.ndarray`` whose key structure
mirrors the PyTorch checkpoints (``weight`` / ``bias`` leaves, ``blocks`` as
lists).  That makes the checkpoint importers (``burn_depth_tpu.io``) a direct
structural walk instead of the reference's ~30-50 regex remap rules per model
(reference ``tool/import_depth_pro.rs:344-437``, ``tool/import_da3.rs:67-195``)
— though we keep regex remap tables too for loading raw upstream state dicts.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

Params = Any  # nested dict / list / leaf pytree of arrays


def flatten_params(params: Params, prefix: str = "") -> Iterator[tuple[str, Any]]:
    """Yield ``(dotted.path, leaf)`` pairs in deterministic order.

    Lists index as ``.0``, ``.1``, ... so paths line up with PyTorch
    ``state_dict`` naming for sequential containers.
    """
    if isinstance(params, dict):
        for key in sorted(params.keys()):
            path = f"{prefix}.{key}" if prefix else str(key)
            yield from flatten_params(params[key], path)
    elif isinstance(params, (list, tuple)):
        for idx, item in enumerate(params):
            path = f"{prefix}.{idx}" if prefix else str(idx)
            yield from flatten_params(item, path)
    elif params is None:
        return
    else:
        yield prefix, params


def get_path(params: Params, path: str) -> Any:
    node = params
    for part in path.split("."):
        if isinstance(node, (list, tuple)):
            node = node[int(part)]
        else:
            node = node[part]
    return node


def set_path(params: Params, path: str, value: Any) -> None:
    parts = path.split(".")
    node = params
    for part in parts[:-1]:
        if isinstance(node, (list, tuple)):
            node = node[int(part)]
        else:
            node = node[part]
    last = parts[-1]
    if isinstance(node, (list, tuple)):
        node[int(last)] = value
    else:
        node[last] = value


def param_count(params: Params) -> int:
    return sum(int(np.prod(leaf.shape)) for _, leaf in flatten_params(params))


def tree_cast(params: Params, dtype) -> Params:
    """Cast every floating-point leaf to ``dtype`` (ints left untouched)."""

    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map(cast, params)


def tree_map_with_path(fn: Callable[[str, Any], Any], params: Params) -> Params:
    """Rebuild the tree applying ``fn(path, leaf)`` to each leaf."""

    def walk(node, prefix):
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}.{k}" if prefix else str(k)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            out = [walk(v, f"{prefix}.{i}" if prefix else str(i)) for i, v in enumerate(node)]
            return type(node)(out) if isinstance(node, tuple) else out
        if node is None:
            return None
        return fn(prefix, node)

    return walk(params, "")
