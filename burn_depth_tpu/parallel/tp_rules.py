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


def vit_tp_rules_int8(prefix: str = "") -> list[Rule]:
    """TP rules for an int8-quantized ViT subtree (``quantize_vit_blocks``).

    The int8 weights are stored transposed (``[K, N]``,
    ``ops/quant.py::quantize_weight_per_channel``), so column-parallel layers
    shard axis 1 and row-parallel layers shard axis 0 — the mirror image of
    the float rules.  Per-output-channel ``scale`` vectors follow their
    layer's output sharding; row-parallel scales stay replicated (their N is
    unsharded).  Calibrated ``x_scale`` scalars replicate via the default
    rule.

    Compose with the head-major layout (``to_head_major`` BEFORE
    ``quantize_vit`` — it needs the float weights) so the qkv N-axis slices
    stay head-aligned; the plain ``weight_i8`` qkv rule is kept for
    completeness but splits q/k/v segments unevenly across chips, which costs
    an activation all-gather per block (see ``parallel/tp_layout.py``).
    """
    p = prefix
    return [
        (rf"{p}blocks/\d+/attn/qkv/weight_hm_i8$", P(None, MODEL_AXIS)),
        (rf"{p}blocks/\d+/attn/qkv/weight_i8$", P(None, MODEL_AXIS)),
        (rf"{p}blocks/\d+/attn/qkv/scale$", P(MODEL_AXIS)),
        (rf"{p}blocks/\d+/attn/qkv/bias$", P(MODEL_AXIS)),
        (rf"{p}blocks/\d+/attn/proj/(weight_i8|weight_hm_i8)$", P(MODEL_AXIS, None)),
        (rf"{p}blocks/\d+/mlp/fc1/weight_i8$", P(None, MODEL_AXIS)),
        (rf"{p}blocks/\d+/mlp/fc1/scale$", P(MODEL_AXIS)),
        (rf"{p}blocks/\d+/mlp/fc1/bias$", P(MODEL_AXIS)),
        (rf"{p}blocks/\d+/mlp/fc2/weight_i8$", P(MODEL_AXIS, None)),
    ] + vit_tp_rules(prefix)
