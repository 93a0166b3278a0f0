"""Multi-chip parallelism over the ICI mesh.

The reference is single-device (SURVEY.md §2 "Parallelism & distributed-
communication components": no collectives, no process groups anywhere in
``/root/reference``).  This subsystem is the TPU-native capability the
north-star adds on top (``BASELINE.json`` config 5): serving sharded over a
``jax.sharding.Mesh`` with XLA-inserted collectives riding ICI.

Strategy (per the scaling-book recipe — pick a mesh, annotate shardings, let
XLA insert collectives):

* **Data parallelism** over the ``data`` axis — batch dim of every input is
  sharded; params replicated along ``data``.  This is the primary axis: the
  largest model is ViT-L (~0.3B params) and fits trivially per chip.
* **Tensor parallelism** over the ``model`` axis — Megatron-style column/row
  sharding of the ViT attention and MLP weights.  XLA's SPMD partitioner
  propagates the shardings and inserts the ``psum`` after ``attn.proj`` /
  ``mlp.fc2`` automatically.  Useful for latency-bound single-image serving
  where the batch cannot be split.
"""

from burn_depth_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    make_multihost_mesh,
    replicated,
    shard_params,
)
from burn_depth_tpu.parallel.tp_layout import to_head_major, vit_to_head_major  # noqa: F401
from burn_depth_tpu.parallel.tp_rules import vit_tp_rules, vit_tp_rules_int8  # noqa: F401
