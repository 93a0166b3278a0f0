"""Tensor-parallel sharding rules for the DINOv2 ViT param tree.

Megatron-style column→row pairing per block, expressed purely as
``PartitionSpec`` annotations — XLA's SPMD partitioner derives the single
``psum`` per sub-layer over the ``model`` axis:

* ``attn.qkv.weight [3D, D]``: column-parallel on the output dim — each chip
  holds a contiguous slice of heads (3D = 3·heads·head_dim, and head_dim
  divides the slice as long as ``model`` divides ``num_heads``).
* ``attn.proj.weight [D, D]``: row-parallel on the input dim → partial sums,
  one all-reduce restores the residual stream.
* ``mlp.fc1.weight [4D, D]`` column-parallel, ``mlp.fc2.weight [D, 4D]``
  row-parallel — same pairing, GELU applied on the sharded hidden dim.

Norms, biases of row-parallel layers, layerscale gammas, embeddings stay
replicated (they are O(D) — negligible memory).
"""

from __future__ import annotations

from jax.sharding import PartitionSpec as P

from burn_depth_tpu.parallel.mesh import MODEL_AXIS, Rule


def vit_tp_rules(prefix: str = "") -> list[Rule]:
    """Rules for one ViT subtree rooted at ``prefix`` (regex, use '' for a
    bare ViT param tree; e.g. ``'backbone/'`` inside a DA3 model tree)."""
    p = prefix
    return [
        (rf"{p}blocks/\d+/attn/qkv/weight_hm$", P(MODEL_AXIS, None)),
        (rf"{p}blocks/\d+/attn/qkv/weight$", P(MODEL_AXIS, None)),
        (rf"{p}blocks/\d+/attn/qkv/bias$", P(MODEL_AXIS)),
        (rf"{p}blocks/\d+/attn/proj/weight$", P(None, MODEL_AXIS)),
        (rf"{p}blocks/\d+/mlp/fc1/weight$", P(MODEL_AXIS, None)),
        (rf"{p}blocks/\d+/mlp/fc1/bias$", P(MODEL_AXIS)),
        (rf"{p}blocks/\d+/mlp/fc2/weight$", P(None, MODEL_AXIS)),
    ]
