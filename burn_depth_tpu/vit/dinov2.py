"""DINOv2 vision transformer, TPU-native.

The reference consumes ``DinoVisionTransformer`` from the external ``burn_dino``
crate (not in its tree); the entry points it exercises are documented at
SURVEY.md §1 L1 and reference ``src/model/depth_pro/layers/vit.rs:45-68`` /
``src/model/depth_anything3/mod.rs:174-216``.  This module implements the same
capability surface natively:

* ``forward`` → final-norm cls/patch tokens (Depth Pro image + FOV encoders)
* per-block intermediate hook taps, un-normalized
  (``normalize_intermediate_tokens=false``) — Depth Pro latents, DA3 DPT stages
* variants: ViT-L/16, ViT-L/14, ViT-S/14; and the DA3-small dual-head stack —
  QK-norm from block 4, RoPE from block 4, alternating blocks from block 4,
  ``cat_token`` (hook dim 384→768), camera token
  (reference ``depth_anything3/mod.rs:187-196``).

Single-image inference notes on the DA3-small variants (the one component whose
spec is not in the reference tree, SURVEY.md §7 "hard parts" #3):

* *Alternating blocks* interleave view-local and cross-view ("global")
  attention for multi-view input.  For a single view both attend over the same
  token set, so the block math is identical; the distinction only matters for
  the ``cat_token`` hook pairing below.
* *``cat_token``* doubles the hook feature dim (head ``dim_in`` 768 = 2x384):
  each hook at an odd (global) block id ``h`` emits
  ``concat(block_out[h-1], block_out[h])`` over the alternating pair —
  consistent with DA3-small's hooks [5,7,9,11] landing on the second block of
  each pair from ``alt_block_start=4``.
* *RoPE* is 2-D axial rotary over the patch grid applied to q/k of patch
  tokens only (cls/camera tokens pass through unrotated).

All attention runs through ``burn_depth_tpu.ops.attention`` which dispatches to
a Pallas flash-attention kernel on TPU and a jnp reference path elsewhere.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from burn_depth_tpu.ops.activations import gelu
from burn_depth_tpu.ops.attention import multi_head_attention
from burn_depth_tpu.ops.conv import conv2d
from burn_depth_tpu.ops.linear import linear
from burn_depth_tpu.ops.norm import layer_norm
from burn_depth_tpu.ops.quant import qlinear


@dataclasses.dataclass(frozen=True)
class DinoViTConfig:
    img_size: int = 518
    patch_size: int = 14
    in_chans: int = 3
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layerscale_init: float = 1e-5
    ln_eps: float = 1e-6
    num_register_tokens: int = 0
    use_mask_token: bool = False
    quiet_softmax: bool = False
    # DA3-small dual-head variant knobs (reference depth_anything3/mod.rs:187-196)
    qk_norm_start: Optional[int] = None
    rope_start: Optional[int] = None
    alt_block_start: Optional[int] = None
    cat_token: bool = False
    use_camera_token: bool = False
    rope_base: float = 100.0
    # --- reconstruction-sweep knobs (PARITY.md "DA3-small ViT variant
    # numerics").  The RoPE *rotation convention* and frequency schedule are
    # oracle-pinned, but upstream DA3's coordinate parameterization and the
    # cat_token pair order are reconstructions; both conventions are
    # implemented so a mismatch on real-weights day is a config flip, not a
    # code bisect (VERDICT r2 #4).
    # rope_coords: "index" = raw 0..grid-1 patch indices (default);
    #              "norm_pm1" = DINOv3-style per-axis [-1, 1] centered coords
    #              ((idx + 0.5)/grid * 2 - 1).
    rope_coords: str = "index"
    # cat_order: "prev_first" = concat(block_out[h-1], block_out[h]) (default);
    #            "cur_first"  = concat(block_out[h], block_out[h-1]).
    cat_order: str = "prev_first"

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def num_prefix_tokens(self) -> int:
        """cls + registers + optional camera token."""
        return 1 + self.num_register_tokens + (1 if self.use_camera_token else 0)

    # ---- presets matching burn_dino's vitl/vits builders -------------------
    @staticmethod
    def vitl(img_size: int, patch_size: int, **kw) -> "DinoViTConfig":
        base = dict(img_size=img_size, patch_size=patch_size, embed_dim=1024, depth=24, num_heads=16)
        base.update(kw)
        return DinoViTConfig(**base)

    @staticmethod
    def vits(img_size: int, patch_size: int, **kw) -> "DinoViTConfig":
        base = dict(img_size=img_size, patch_size=patch_size, embed_dim=384, depth=12, num_heads=6)
        base.update(kw)
        return DinoViTConfig(**base)

    def da3_small_variant(self) -> "DinoViTConfig":
        """Apply the dual-head backbone knobs (``mod.rs:190-196``)."""
        return dataclasses.replace(
            self,
            alt_block_start=4,
            qk_norm_start=4,
            rope_start=4,
            cat_token=True,
            use_camera_token=True,
        )


@dataclasses.dataclass
class DinoHook:
    """One intermediate tap (reference ``DinoIntermediate``)."""

    tokens: jnp.ndarray  # [B, prefix+N, D] raw block output (un-normalized)
    patches: jnp.ndarray  # [B, N, D or 2D] patch tokens only (cat_token doubles D)
    camera: Optional[jnp.ndarray]  # [B, D] camera token, if the variant has one


@dataclasses.dataclass
class DinoOutput:
    x_norm_clstoken: jnp.ndarray  # [B, D]
    x_norm_patchtokens: jnp.ndarray  # [B, N, D]
    hooks: list  # list[DinoHook] in hook_ids order


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------


def init_dinov2(rng: jax.Array, cfg: DinoViTConfig, dtype=jnp.float32) -> dict:
    """Random-init parameter tree (checkpoints overwrite these; shapes and key
    names mirror the PyTorch DINOv2 state dict so import is structural)."""
    keys = iter(jax.random.split(rng, 16 + 8 * cfg.depth))

    def normal(key, shape, std=0.02):
        return (jax.random.normal(key, shape) * std).astype(dtype)

    d = cfg.embed_dim
    params: dict = {
        "cls_token": normal(next(keys), (1, 1, d)),
        "pos_embed": normal(next(keys), (1, 1 + cfg.num_patches, d)),
        "patch_embed": {
            "proj": {
                "weight": normal(next(keys), (d, cfg.in_chans, cfg.patch_size, cfg.patch_size)),
                "bias": jnp.zeros((d,), dtype),
            }
        },
        "norm": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
    }
    if cfg.use_mask_token:
        params["mask_token"] = jnp.zeros((1, d), dtype)
    if cfg.num_register_tokens:
        params["register_tokens"] = normal(next(keys), (1, cfg.num_register_tokens, d))
    if cfg.use_camera_token:
        params["camera_token"] = normal(next(keys), (1, 1, d))

    hidden = int(d * cfg.mlp_ratio)
    blocks = []
    for i in range(cfg.depth):
        block = {
            "norm1": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "attn": {
                "qkv": {
                    "weight": normal(next(keys), (3 * d, d)),
                    "bias": jnp.zeros((3 * d,), dtype) if cfg.qkv_bias else None,
                },
                "proj": {"weight": normal(next(keys), (d, d)), "bias": jnp.zeros((d,), dtype)},
            },
            "ls1": {"gamma": jnp.full((d,), cfg.layerscale_init, dtype)},
            "norm2": {"weight": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
            "mlp": {
                "fc1": {"weight": normal(next(keys), (hidden, d)), "bias": jnp.zeros((hidden,), dtype)},
                "fc2": {"weight": normal(next(keys), (d, hidden)), "bias": jnp.zeros((d,), dtype)},
            },
            "ls2": {"gamma": jnp.full((d,), cfg.layerscale_init, dtype)},
        }
        if cfg.qk_norm_start is not None and i >= cfg.qk_norm_start:
            hd = cfg.head_dim
            block["attn"]["q_norm"] = {"weight": jnp.ones((hd,), dtype), "bias": jnp.zeros((hd,), dtype)}
            block["attn"]["k_norm"] = {"weight": jnp.ones((hd,), dtype), "bias": jnp.zeros((hd,), dtype)}
        blocks.append(block)
    params["blocks"] = blocks
    return params


# --------------------------------------------------------------------------
# RoPE
# --------------------------------------------------------------------------


def _rope_angles(cfg: DinoViTConfig, grid_h: int, grid_w: int) -> np.ndarray:
    """2-D axial rotary angles for the patch grid, ``[N, head_dim//2]``.

    First half of the rotation pairs encodes the row coordinate, second half
    the column coordinate; per-axis frequencies follow the standard
    ``base^(-2j/d_axis)`` schedule with ``base = cfg.rope_base``.

    Coordinate parameterization per ``cfg.rope_coords`` (a reconstruction
    knob — see the config docstring): ``index`` = raw patch indices,
    ``norm_pm1`` = DINOv3-style per-axis centered [-1, 1].
    """
    d_half = cfg.head_dim // 2  # rotation pairs
    d_axis = d_half // 2
    j = np.arange(d_axis, dtype=np.float64)
    freqs = cfg.rope_base ** (-2.0 * j / d_half)
    if cfg.rope_coords == "index":
        coords_y = np.arange(grid_h, dtype=np.float64)
        coords_x = np.arange(grid_w, dtype=np.float64)
    elif cfg.rope_coords == "norm_pm1":
        coords_y = (np.arange(grid_h, dtype=np.float64) + 0.5) / grid_h * 2.0 - 1.0
        coords_x = (np.arange(grid_w, dtype=np.float64) + 0.5) / grid_w * 2.0 - 1.0
    else:
        raise ValueError(f"unknown rope_coords {cfg.rope_coords!r}")
    ys, xs = np.meshgrid(coords_y, coords_x, indexing="ij")
    ang_y = ys.reshape(-1, 1) * freqs[None, :]  # [N, d_axis]
    ang_x = xs.reshape(-1, 1) * freqs[None, :]
    return np.concatenate([ang_y, ang_x], axis=1).astype(np.float32)  # [N, d_half]


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, num_prefix: int) -> jnp.ndarray:
    """Rotate patch-token halves of ``x: [B, H, T, hd]``; prefix tokens pass
    through unrotated (identity rotation for cls/camera)."""
    prefix, patches = x[:, :, :num_prefix], x[:, :, num_prefix:]
    d_half = patches.shape[-1] // 2
    p1, p2 = patches[..., :d_half], patches[..., d_half:]
    rot1 = p1 * cos - p2 * sin
    rot2 = p1 * sin + p2 * cos
    rotated = jnp.concatenate([rot1, rot2], axis=-1)
    return jnp.concatenate([prefix, rotated], axis=2)


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _interpolate_pos_embed(pos_embed: jnp.ndarray, cfg: DinoViTConfig, grid_h: int, grid_w: int) -> jnp.ndarray:
    """Resize the patch part of a ``[1, 1+N0, D]`` pos embed to a new grid.

    Bicubic with half-pixel sampling, matching upstream DINOv2's
    ``interpolate_pos_encoding`` (``F.interpolate(mode="bicubic")``).  The
    preset resolutions match the checkpoint grid so this only runs for
    non-preset patch-multiple inputs.
    """
    n0 = pos_embed.shape[1] - 1
    g0 = int(np.sqrt(n0))
    if g0 * g0 != n0:
        raise ValueError(f"pos_embed has non-square patch count {n0}")
    if g0 == grid_h == grid_w:
        return pos_embed
    from burn_depth_tpu.ops.interpolate import resize_bicubic

    cls_pe, patch_pe = pos_embed[:, :1], pos_embed[:, 1:]
    d = patch_pe.shape[-1]
    patch_pe = patch_pe.reshape(1, g0, g0, d).transpose(0, 3, 1, 2)
    patch_pe = resize_bicubic(patch_pe, (grid_h, grid_w), align_corners=False)
    patch_pe = patch_pe.transpose(0, 2, 3, 1).reshape(1, grid_h * grid_w, d)
    return jnp.concatenate([cls_pe, patch_pe], axis=1)


def _is_global_block(cfg: DinoViTConfig, block_idx: int) -> bool:
    """Multi-view attention schedule: blocks below ``alt_block_start`` are
    view-local; from it on, blocks alternate cross-view ("global") and
    view-local, starting global.  For S=1 the distinction is a no-op, which
    is exactly the reference's behavior (it only exercises S=1 and the
    alternating blocks are mathematically degenerate there — SURVEY §2 #10).
    The S>1 schedule is our reconstruction of upstream DA3's
    within-view/cross-view interleave; it is config-explicit so a different
    upstream convention is a one-line change."""
    if cfg.alt_block_start is None or block_idx < cfg.alt_block_start:
        return False
    return (block_idx - cfg.alt_block_start) % 2 == 0


def _block_forward(bp: dict, x: jnp.ndarray, cfg: DinoViTConfig, block_idx: int,
                   rope: Optional[tuple], num_prefix: int, attn_impl: str,
                   view_count: int = 1, sp=None) -> jnp.ndarray:
    """Pre-norm DINOv2 block: ``x += ls1·attn(norm1(x)); x += ls2·mlp(norm2(x))``.

    ``view_count`` > 1: ``x`` is ``[B0·S, T, D]`` (views flattened into the
    batch).  View-local blocks attend within each view; global blocks merge
    the view axis into the sequence — RoPE/qk-norm are applied per view
    BEFORE the merge, so positions stay view-relative.

    ``sp`` (a ``parallel.sp.ViewSP``): run global blocks' attention as the
    gather-KV sequence-parallel island instead of the merge reshape —
    queries stay view-sharded over the mesh, only K/V are all-gathered
    (see ``parallel/sp.py``).  Numerics are formulation-identical."""
    d = cfg.embed_dim
    h = cfg.num_heads
    hd = cfg.head_dim
    b, t, _ = x.shape

    y = layer_norm(x, bp["norm1"]["weight"], bp["norm1"]["bias"], cfg.ln_eps)
    qkv = qlinear(y, bp["attn"]["qkv"])  # [B,T,3D]

    import os

    from burn_depth_tpu.ops.attention import _on_tpu

    if (
        os.environ.get("BDT_ATTN_PACKED4", "0") == "1"
        and attn_impl in ("auto", "pallas")
        and _on_tpu()  # non-interpreted Mosaic kernel: no CPU fallback
        and "weight_hm" not in bp["attn"]["qkv"]
        and "weight_hm_i8" not in bp["attn"]["qkv"]
        and "q_norm" not in bp["attn"]
        and cfg.rope_start is None
        and view_count == 1
        and h % 8 == 0
    ):
        # Packed 4-D attention: consume [B,T,3H,hd] directly — the two HBM
        # qkv relayouts and the output transpose never materialize.  Falls
        # through to the SAME proj/MLP tail as the standard path.
        from burn_depth_tpu.ops.attention import _attention_pallas_packed4

        attn_out = _attention_pallas_packed4(
            qkv.reshape(b, t, 3 * h, hd), h, scale=float(hd) ** -0.5,
            quiet_softmax=cfg.quiet_softmax,
        )  # [B, T, D]
        attn_out = qlinear(attn_out, bp["attn"]["proj"])
        x = x + attn_out * bp["ls1"]["gamma"].astype(x.dtype)
        y = layer_norm(x, bp["norm2"]["weight"], bp["norm2"]["bias"], cfg.ln_eps)
        y = qlinear(y, bp["mlp"]["fc1"])
        y = gelu(y)
        y = qlinear(y, bp["mlp"]["fc2"])
        return x + y * bp["ls2"]["gamma"].astype(x.dtype)

    if "weight_hm" in bp["attn"]["qkv"] or "weight_hm_i8" in bp["attn"]["qkv"]:
        # head-major TP layout (parallel/tp_layout.py): rows ordered [H,3,hd]
        # so the model-axis shard factors through H — no qkv all-gather.
        qkv = qkv.reshape(b, t, h, 3, hd)
        q, k, v = (qkv.transpose(3, 0, 2, 1, 4)[i] for i in range(3))  # [B,H,T,hd]
    else:
        qkv = qkv.reshape(b, t, 3, h, hd)
        q, k, v = (qkv.transpose(2, 0, 3, 1, 4)[i] for i in range(3))  # [B,H,T,hd]
    if "q_norm" in bp["attn"]:
        q = layer_norm(q, bp["attn"]["q_norm"]["weight"], bp["attn"]["q_norm"]["bias"], cfg.ln_eps)
        k = layer_norm(k, bp["attn"]["k_norm"]["weight"], bp["attn"]["k_norm"]["bias"], cfg.ln_eps)
    if rope is not None and cfg.rope_start is not None and block_idx >= cfg.rope_start:
        cos, sin = rope
        q = _apply_rope(q, cos, sin, num_prefix)
        k = _apply_rope(k, cos, sin, num_prefix)
    # Fold a power-of-two softmax scale into q (bf16-EXACT: pure exponent
    # shift; hd=64 -> 0.125 for every preset here).  The in-kernel score
    # multiply then drops a full [G, Bq, Tp] f32 VPU pass per block; XLA
    # fuses this small [B,H,T,hd] multiply into the preceding transpose.
    # (Under BDT_ATTN_EXP2 the fold also absorbs log2e — ops/attention.py.)
    #
    # The fold MUST be decided per branch, with the impl and sequence length
    # the actual consumer sees: the SP island always exponentiates base-e
    # (parallel/sp.py::_attend), and the merged cross-view path attends over
    # S·T tokens, not T — deciding on the pre-merge q once fed log2e-scaled
    # logits to a base-e softmax (wrong temperature) whenever the gates
    # disagreed under BDT_ATTN_EXP2.
    from burn_depth_tpu.ops.attention import fold_softmax_scale

    base_scale = float(hd) ** -0.5
    s = view_count
    if s > 1 and _is_global_block(cfg, block_idx):
        if sp is not None:
            from burn_depth_tpu.parallel.sp import cross_view_attention_sp

            q, scale = fold_softmax_scale(q, base_scale, "jnp")  # base-e consumer
            attn_out = cross_view_attention_sp(
                sp, q, k, v, views=s, scale=scale, quiet_softmax=cfg.quiet_softmax
            )
        else:
            b0 = b // s

            def merge(a):  # [B0·S, H, T, hd] -> [B0, H, S·T, hd]
                return a.reshape(b0, s, h, t, hd).transpose(0, 2, 1, 3, 4).reshape(b0, h, s * t, hd)

            mq, scale = fold_softmax_scale(merge(q), base_scale, attn_impl)
            attn_out = multi_head_attention(
                mq, merge(k), merge(v), scale=scale, quiet_softmax=cfg.quiet_softmax,
                impl=attn_impl,
            )
            attn_out = attn_out.reshape(b0, h, s, t, hd).transpose(0, 2, 1, 3, 4).reshape(b, h, t, hd)
    else:
        q, scale = fold_softmax_scale(q, base_scale, attn_impl)
        attn_out = multi_head_attention(
            q, k, v, scale=scale, quiet_softmax=cfg.quiet_softmax, impl=attn_impl
        )
    attn_out = attn_out.transpose(0, 2, 1, 3).reshape(b, t, d)
    attn_out = qlinear(attn_out, bp["attn"]["proj"])
    x = x + attn_out * bp["ls1"]["gamma"].astype(x.dtype)

    y = layer_norm(x, bp["norm2"]["weight"], bp["norm2"]["bias"], cfg.ln_eps)
    y = qlinear(y, bp["mlp"]["fc1"])
    y = gelu(y)
    y = qlinear(y, bp["mlp"]["fc2"])
    return x + y * bp["ls2"]["gamma"].astype(x.dtype)


def stack_vit_params(params_list: Sequence[dict]) -> dict:
    """Stack S structurally-identical ViT param trees along a new leading
    axis (serving transform for ``dinov2_forward_stacked``).  Works on float
    and int8 trees alike; ``None`` leaves (absent biases) must match."""
    import jax as _jax

    def stack(*leaves):
        if leaves[0] is None:
            if any(l is not None for l in leaves):
                raise ValueError("mismatched None leaves across stacked ViTs")
            return None
        return jnp.stack(leaves)

    return _jax.tree.map(stack, *params_list, is_leaf=lambda l: l is None)


def dinov2_forward_stacked(
    stacked: dict, x: jnp.ndarray, cfg: DinoViTConfig, attn_impl: str = "auto"
) -> jnp.ndarray:
    """Run S weight-stacked *plain* ViTs (identical config, no hooks / RoPE /
    camera / cat-token) over the SAME input batch in one pass; returns
    ``x_norm_patchtokens [S, B, N, D]``.

    Serving optimization for Depth Pro: the global image encoder and the FOV
    encoder are two B=1 ViT-L passes over the identical 384² pyramid level
    (``encoder.rs:409-415`` + ``fov.rs:189-227`` both consume the 0.25x
    resize), and a B=1 ViT pass is ~2.6x less efficient per sample than the
    batched pass (BENCH.md component profile).  Linears/norms get a stacked
    model axis; attention folds S into the kernel batch (it has no weights),
    so numerics match the two separate passes.
    """
    if cfg.rope_start is not None or cfg.use_camera_token or cfg.cat_token:
        raise ValueError("dinov2_forward_stacked supports plain ViTs only")
    from burn_depth_tpu.ops.quant import qlinear_stacked

    s = stacked["cls_token"].shape[0]
    b, _, height, width = x.shape
    gh, gw = height // cfg.patch_size, width // cfg.patch_size
    d = cfg.embed_dim
    h = cfg.num_heads
    hd = cfg.head_dim

    pe = stacked["patch_embed"]["proj"]
    toks = []
    for i in range(s):  # S small convs; stacking convs over weights buys nothing
        t = conv2d(x, pe["weight"][i], None if pe["bias"] is None else pe["bias"][i],
                   stride=cfg.patch_size)
        toks.append(t.reshape(b, d, gh * gw).transpose(0, 2, 1))
    xs = jnp.stack(toks)  # [S, B, N, D]

    # cls_token leaf [1,1,D] stacks to [S,1,1,D] — broadcast the middle dim
    cls = jnp.broadcast_to(stacked["cls_token"].astype(xs.dtype), (s, b, 1, d))
    if cfg.num_register_tokens:
        regs = jnp.broadcast_to(
            stacked["register_tokens"].astype(xs.dtype),
            (s, b, cfg.num_register_tokens, d),
        )
        xs = jnp.concatenate([cls, regs, xs], axis=2)
    else:
        xs = jnp.concatenate([cls, xs], axis=2)

    pos = jnp.stack(
        [_interpolate_pos_embed(stacked["pos_embed"][i], cfg, gh, gw)[0] for i in range(s)]
    ).astype(xs.dtype)[:, None]  # [S, 1, T0, D]
    if cfg.num_register_tokens:
        xs = jnp.concatenate(
            [
                xs[:, :, :1] + pos[:, :, :1],
                xs[:, :, 1 : 1 + cfg.num_register_tokens],
                xs[:, :, 1 + cfg.num_register_tokens :] + pos[:, :, 1:],
            ],
            axis=2,
        )
    else:
        xs = xs + pos

    num_prefix = 1 + cfg.num_register_tokens
    t_len = xs.shape[2]

    def ln(z, p):
        w = None if p["weight"] is None else p["weight"][:, None, None, :]
        bb = None if p.get("bias") is None else p["bias"][:, None, None, :]
        return layer_norm(z, w, bb, cfg.ln_eps)

    base_scale = float(hd) ** -0.5
    for bi in range(cfg.depth):
        bp = stacked["blocks"][bi]
        y = ln(xs, bp["norm1"])
        qkv = qlinear_stacked(y, bp["attn"]["qkv"])  # [S, B, T, 3D]
        qkv = qkv.reshape(s, b, t_len, 3, h, hd)
        q, k, v = (qkv.transpose(3, 0, 1, 4, 2, 5)[i] for i in range(3))  # [S,B,H,T,hd]
        q = q.reshape(s * b, h, t_len, hd)
        k = k.reshape(s * b, h, t_len, hd)
        v = v.reshape(s * b, h, t_len, hd)
        # shared fold helper: absorbs log2e too under BDT_ATTN_EXP2 (a hand
        # fold here once missed that and ran the exp2 kernel at ln2 temperature)
        from burn_depth_tpu.ops.attention import fold_softmax_scale

        q, scale = fold_softmax_scale(q, base_scale, attn_impl)
        attn = multi_head_attention(
            q, k, v, scale=scale, quiet_softmax=cfg.quiet_softmax,
            impl=attn_impl,
        )
        attn = attn.reshape(s, b, h, t_len, hd).transpose(0, 1, 3, 2, 4).reshape(s, b, t_len, d)
        attn = qlinear_stacked(attn, bp["attn"]["proj"])
        xs = xs + attn * bp["ls1"]["gamma"][:, None, None, :].astype(xs.dtype)

        y = ln(xs, bp["norm2"])
        y = qlinear_stacked(y, bp["mlp"]["fc1"])
        y = gelu(y)
        y = qlinear_stacked(y, bp["mlp"]["fc2"])
        xs = xs + y * bp["ls2"]["gamma"][:, None, None, :].astype(xs.dtype)

    xs = ln(xs, stacked["norm"])
    return xs[:, :, num_prefix:]


def dinov2_forward(
    params: dict,
    x: jnp.ndarray,
    cfg: DinoViTConfig,
    hook_ids: Sequence[int] = (),
    camera_token: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    views: int = 1,
    sp=None,
) -> DinoOutput:
    """Run the ViT.  ``x: [B, 3, H, W]`` with H, W divisible by patch_size.

    ``hook_ids`` are 0-based block indices; the tap is the block's raw output
    (``normalize_intermediate_tokens=false``, reference ``vit.rs:63``).
    ``camera_token: [B, D]`` overrides the learned placeholder (DA3-small).
    ``views`` S > 1: ``x`` is ``[B0·S, 3, H, W]`` (a multi-view set flattened
    into the batch, views of a set contiguous); blocks past
    ``alt_block_start`` alternate cross-view attention (``_is_global_block``).
    ``sp``: a ``parallel.sp.ViewSP`` — run global blocks sequence-parallel
    (queries view-sharded over the mesh, K/V gathered).
    """
    b, _, height, width = x.shape
    if views > 1 and b % views:
        raise ValueError(f"batch {b} not divisible by views {views}")
    gh, gw = height // cfg.patch_size, width // cfg.patch_size

    pe = params["patch_embed"]["proj"]
    tokens = conv2d(x, pe["weight"], pe["bias"], stride=cfg.patch_size)  # [B,D,gh,gw]
    tokens = tokens.reshape(b, cfg.embed_dim, gh * gw).transpose(0, 2, 1)  # [B,N,D]

    cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype), (b, 1, cfg.embed_dim))
    seq = [cls, tokens]
    if cfg.num_register_tokens:
        regs = jnp.broadcast_to(
            params["register_tokens"].astype(tokens.dtype), (b, cfg.num_register_tokens, cfg.embed_dim)
        )
        seq = [cls, regs, tokens]
    x_seq = jnp.concatenate(seq, axis=1)

    pos = _interpolate_pos_embed(params["pos_embed"], cfg, gh, gw).astype(x_seq.dtype)
    if cfg.num_register_tokens:
        # pos embed applies to cls+patches; registers get no positional term.
        x_seq = jnp.concatenate(
            [
                x_seq[:, :1] + pos[:, :1],
                x_seq[:, 1 : 1 + cfg.num_register_tokens],
                x_seq[:, 1 + cfg.num_register_tokens :] + pos[:, 1:],
            ],
            axis=1,
        )
    else:
        x_seq = x_seq + pos

    num_prefix = 1 + cfg.num_register_tokens
    if cfg.use_camera_token:
        if camera_token is None:
            cam = jnp.broadcast_to(params["camera_token"].astype(x_seq.dtype), (b, 1, cfg.embed_dim))
        else:
            cam = camera_token.astype(x_seq.dtype)[:, None, :]
        # camera token sits after cls, before patches (patch_token_start bump,
        # reference depth_anything3/mod.rs:284).
        x_seq = jnp.concatenate([x_seq[:, :num_prefix], cam, x_seq[:, num_prefix:]], axis=1)
        num_prefix += 1

    rope = None
    if cfg.rope_start is not None:
        angles = jnp.asarray(_rope_angles(cfg, gh, gw))  # [N, hd//2]
        rope = (jnp.cos(angles).astype(x_seq.dtype), jnp.sin(angles).astype(x_seq.dtype))

    hook_ids = list(hook_ids)
    hooks_raw: dict[int, jnp.ndarray] = {}
    prev_out = None
    for i in range(cfg.depth):
        x_new = _block_forward(
            params["blocks"][i], x_seq, cfg, i, rope, num_prefix, attn_impl,
            view_count=views, sp=sp,
        )
        if i in hook_ids:
            if cfg.cat_token:
                pair_prev = prev_out if prev_out is not None else x_seq
                if cfg.cat_order == "prev_first":
                    hooks_raw[i] = jnp.concatenate([pair_prev, x_new], axis=-1)
                elif cfg.cat_order == "cur_first":
                    hooks_raw[i] = jnp.concatenate([x_new, pair_prev], axis=-1)
                else:
                    raise ValueError(f"unknown cat_order {cfg.cat_order!r}")
            else:
                hooks_raw[i] = x_new
        prev_out = x_new
        x_seq = x_new

    x_norm = layer_norm(x_seq, params["norm"]["weight"], params["norm"]["bias"], cfg.ln_eps)

    hooks = []
    for i in hook_ids:
        tok = hooks_raw[i]
        cam_tok = None
        if cfg.use_camera_token:
            # camera token position = num_prefix - 1 (right before patches)
            cam_tok = tok[:, num_prefix - 1]
        hooks.append(DinoHook(tokens=tok, patches=tok[:, num_prefix:], camera=cam_tok))

    return DinoOutput(
        x_norm_clstoken=x_norm[:, 0],
        x_norm_patchtokens=x_norm[:, num_prefix:],
        hooks=hooks,
    )
