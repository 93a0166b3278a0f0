"""Head-major qkv layout for tensor-parallel serving.

The canonical (checkpoint) packed-qkv weight is ``[3D, D]`` with rows ordered
``[q(D); k(D); v(D)]`` — i.e. ``[3, H, hd]`` major-to-minor.  Sharding that
contiguously over the ``model`` axis (``P("model", None)``) gives chip 0 all
of q plus part of k, so the downstream reshape to ``[B, T, 3, H, hd]`` cannot
factor the sharded dim and GSPMD inserts an **all-gather of the qkv
activation in every block** (verified by HLO audit,
``tests/test_parallel.py::test_tp_collective_audit``).

``to_head_major`` permutes the rows to ``[H, 3, hd]`` order — each chip's
contiguous slice is then a whole head group's q, k AND v.  The block forward
detects the layout by the ``weight_hm`` key and reshapes ``[B, T, H, 3, hd]``
instead; the sharded dim factors through H, attention stays head-local, and
the only collectives left are the two expected Megatron all-reduces per block
(after ``attn.proj`` and ``mlp.fc2``).

This is a serving-time transform: checkpoints and the single-chip path keep
the torch layout.
"""

from __future__ import annotations

import jax.numpy as jnp


def _permute_qkv(qkv: dict, num_heads: int) -> dict:
    w = qkv["weight"]  # [3D, D_in]
    three_d, d_in = w.shape
    hd = three_d // (3 * num_heads)
    if 3 * num_heads * hd != three_d:
        raise ValueError(f"qkv rows {three_d} not divisible by 3*{num_heads} heads")
    out = {
        "weight_hm": w.reshape(3, num_heads, hd, d_in).transpose(1, 0, 2, 3).reshape(three_d, d_in)
    }
    b = qkv.get("bias")
    out["bias"] = (
        None if b is None else b.reshape(3, num_heads, hd).transpose(1, 0, 2).reshape(three_d)
    )
    return out


def vit_to_head_major(vit_params: dict, num_heads: int) -> dict:
    """Convert one ViT param subtree's qkv packs to head-major layout."""
    out = dict(vit_params)
    blocks = []
    for bp in vit_params["blocks"]:
        nb = dict(bp)
        attn = dict(bp["attn"])
        if "weight" not in attn["qkv"]:
            raise ValueError("qkv already transformed or quantized — to_head_major needs the float torch layout")
        attn["qkv"] = _permute_qkv(attn["qkv"], num_heads)
        nb["attn"] = attn
        blocks.append(nb)
    out["blocks"] = blocks
    return out


def to_head_major(params: dict, prefix: str, num_heads: int) -> dict:
    """Return a copy of ``params`` with the ViT subtree at slash-path
    ``prefix`` ('' = the tree itself is the ViT) converted to head-major."""
    if not prefix:
        return vit_to_head_major(params, num_heads)
    keys = [k for k in prefix.strip("/").split("/") if k]

    def rec(node: dict, ks: list[str]) -> dict:
        out = dict(node)
        k = ks[0]
        out[k] = vit_to_head_major(node[k], num_heads) if len(ks) == 1 else rec(node[k], ks[1:])
        return out

    return rec(params, keys)
