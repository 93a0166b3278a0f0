"""Orbax checkpoint backend: the TPU-ecosystem directory format.

The native format (``io/checkpoint.py``) is one safetensors file — the role
of the reference's NamedMpk recorder (``depth_pro/mod.rs:206``).  Orbax adds
what a TPU deployment wants beyond that:

* **sharding-aware restore** — leaves land directly on the mesh described by
  a template of sharded arrays/``ShapeDtypeStruct``s, with no host-side
  gather/scatter round trip;
* **async save** — the serialization thread overlaps the next train steps
  (``AsyncCheckpointer``), so checkpointing costs one device→host copy, not
  a training stall;
* **step-managed directories** — ``CheckpointManager`` retention/bookkeeping
  for long fine-tunes.

Paths: an Orbax checkpoint is a *directory*.  The loaders in this package
treat a directory path as Orbax and a file path as safetensors, so both
formats flow through the same CLI flags (``cli/train.py --resume/--state-out``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def is_orbax_path(path: str) -> bool:
    """Directory (or directory-intent ``.orbax`` suffix) → Orbax format."""
    return os.path.isdir(path) or path.rstrip("/").endswith(".orbax")


def save_orbax(path: str, tree: Any, *, async_save: bool = False):
    """Save a pytree (params or full train state) to an Orbax directory.

    With ``async_save=True`` returns the ``AsyncCheckpointer`` — the caller
    may keep training and must ``wait_until_finished()`` (or save again —
    saves serialize) before exiting.  Otherwise blocks and returns None.
    """
    ocp = _ocp()
    path = os.path.abspath(path)
    if async_save:
        ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        ckptr.save(path, args=ocp.args.StandardSave(tree), force=True)
        return ckptr
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    return None


def load_orbax(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree from an Orbax directory.

    ``template`` (a pytree of arrays or ``jax.ShapeDtypeStruct``s, optionally
    carrying shardings) pins structure/dtype/placement — sharded leaves are
    restored shard-by-shard onto their devices.  Without a template the tree
    is restored as saved (host numpy arrays).
    """
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is None:
            return ckptr.restore(path)
        spec = jax.tree_util.tree_map(
            lambda leaf: jax.ShapeDtypeStruct(
                leaf.shape, leaf.dtype, sharding=getattr(leaf, "sharding", None)
            ),
            template,
        )
        return ckptr.restore(path, spec)


def orbax_keys(path: str) -> list:
    """Flat key names of an Orbax checkpoint from its METADATA (no tensor
    reads) — the directory counterpart of a safetensors header peek."""
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        meta = ckptr.metadata(os.path.abspath(path))
    # StepMetadata -> TreeMetadata -> the actual metadata pytree
    tree = getattr(getattr(meta, "item_metadata", meta), "tree", None)
    if tree is None:
        raise ValueError(f"no tree metadata in {path}")
    from burn_depth_tpu.io.checkpoint import _path_str

    leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
    return sorted(_path_str(p) for p, _ in leaves)


def _template_spec(template: Any):
    return jax.tree_util.tree_map(
        lambda leaf: jax.ShapeDtypeStruct(
            leaf.shape, leaf.dtype, sharding=getattr(leaf, "sharding", None)
        ),
        template,
    )


class TrainCheckpointManager:
    """Step-managed checkpoint directory (``ocp.CheckpointManager``).

    The long-fine-tune half of the checkpoint/resume story: periodic
    **async** saves (serialization overlaps the next train steps; a save
    costs one device→host copy), ``max_to_keep`` retention, and latest-step
    discovery so an interrupted run resumes with no bookkeeping
    (``cli/train.py --ckpt-dir``).  One-shot save/restore stays in
    ``save_orbax``/``load_orbax``.
    """

    def __init__(self, directory: str, *, keep: int = 3, async_save: bool = True):
        ocp = _ocp()
        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, enable_async_checkpointing=async_save
            ),
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def save(self, step: int, tree: Any, *, force: bool = False) -> bool:
        """Queue an async save of ``tree`` at ``step``.  Returns False when the
        manager skipped it (e.g. step already saved)."""
        return self._mgr.save(
            int(step), args=self._ocp.args.StandardSave(tree), force=force
        )

    def restore(self, step: Optional[int] = None, template: Optional[Any] = None) -> Any:
        """Restore ``step`` (default: latest).  With a ``template`` the leaves
        land with its dtypes/shardings (direct-to-device); without, host arrays."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        spec = None if template is None else _template_spec(template)
        return self._mgr.restore(step, args=self._ocp.args.StandardRestore(spec))

    def restore_flat(self, step: Optional[int] = None) -> dict:
        """Latest/``step`` state as the flat ``{'/'-joined path: np.ndarray}``
        view (the ``cli/train.py`` resume currency)."""
        import numpy as np

        from burn_depth_tpu.io.checkpoint import flatten_tree

        return {k: np.asarray(v) for k, v in flatten_tree(self.restore(step)).items()}

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def load_flat_orbax(path: str) -> dict:
    """Orbax directory → ``{'/'-joined path: np.ndarray}`` — the same flat
    view ``io/checkpoint.load_safetensors`` gives, so resume logic that works
    on flat dicts (``cli/train.py``) is format-agnostic."""
    import numpy as np

    from burn_depth_tpu.io.checkpoint import flatten_tree

    tree = load_orbax(path)
    return {k: np.asarray(v) for k, v in flatten_tree(tree).items()}
