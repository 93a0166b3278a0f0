"""Torch-only DA3 oracle: DINOv2 backbone + DPT heads with upstream
ByteDance parameter naming.

This module is the PyTorch half of the DA3 golden-dump → verify-gate pipeline
(the role upstream's ``depth_anything_3`` package plays for the reference's
``tool/correctness_da3.py:110-310``): an independent torch implementation of
the DA3 forward whose ``state_dict()`` keys follow the upstream checkpoint
convention (``model.backbone.pretrained.blocks.N...``,
``model.head.scratch.refinenetN.resConfUnitM...`` — see
``tests/fixtures/da3_metric_large_upstream_keys.txt`` and
``da3_small_upstream_keys.txt``), so the saved state dict flows through
``burn_depth_tpu.io.importers.import_da3`` exactly like a real checkpoint.

Two oracles:

* ``TorchDA3Oracle`` — metric-large shape: plain DINOv2 backbone + mono DPT
  head.
* ``TorchDA3SmallOracle`` — the small dual-head variant stack: QK-norm +
  2-D axial RoPE + alternating blocks from block 4, camera token, cat-token
  hook pairing (hook dim 2·D), dual DPT head (main depth/conf branch + aux
  ray branch with its own refinenets, pre-head conv stacks, LayerNorm2d on
  aux stage 0 only, the double pos-embed quirk), and the camera pose decoder
  (reference ``depth_anything3/mod.rs:187-196``, ``dpt.rs:227-513``,
  ``camera.rs:143-198``).  The RoPE coordinate parameterization and the
  cat-token pair order are upstream reconstructions; both conventions are
  implemented (``rope_coords`` / ``cat_order``) so the framework's
  knob-sweep can be exercised against a dump of either convention.

Intentionally framework-free: only torch + numpy.  The architecture semantics
(pre-norm DINOv2 blocks with LayerScale; token var-mean norm eps 1e-5; DPT
projects → sincos pos-embed (+0.1·embed, x-major order) → resize layers → RN
convs → top-down refinenets with align_corners=True upsampling → output convs
→ exp) are written from the reference spec (``src/model/depth_anything3/
dpt.rs:515-731,775-932`` and ``mod.rs:495-564``), not imported from the
framework, so a dump produced here is independent evidence.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

# ---------------------------------------------------------------------------
# sincos positional embedding (dpt.rs:775-932) — numpy, torch-consumable
# ---------------------------------------------------------------------------

POS_EMBED_RATIO = 0.1
POS_EMBED_OMEGA0 = 100.0


def _sincos_table(dim: int, positions: np.ndarray) -> np.ndarray:
    if dim == 0:
        return np.zeros((positions.shape[0], 0), np.float32)
    half = dim // 2
    rem = dim - half
    out = np.empty((positions.shape[0], dim), np.float64)
    if half:
        omega = POS_EMBED_OMEGA0 ** (-(np.arange(half) / half))
        out[:, :half] = np.sin(positions[:, None] * omega[None, :])
    omega = POS_EMBED_OMEGA0 ** (-(np.arange(rem) / rem))
    out[:, half:] = np.cos(positions[:, None] * omega[None, :])
    return out.astype(np.float32)


def positional_embedding(channels: int, height: int, width: int,
                         image_width: int, image_height: int) -> torch.Tensor:
    """``[1, C, H, W]``; aspect-normalized spans over the image diagonal and
    the reference's x-major flat write order (``dpt.rs:851-891``)."""
    aspect = image_width / image_height
    diag = np.sqrt(aspect * aspect + 1.0)
    span_x, span_y = aspect / diag, 1.0 / diag

    def linspace(start, end, steps):
        if steps <= 1:
            return np.array([start], np.float64)
        return start + (end - start) / (steps - 1.0) * np.arange(steps)

    x_coords = linspace(-span_x * (width - 1.0) / width, span_x * (width - 1.0) / width, width)
    y_coords = linspace(-span_y * (height - 1.0) / height, span_y * (height - 1.0) / height, height)
    x_ch = channels // 2
    y_ch = channels - x_ch
    emb_x = _sincos_table(x_ch, x_coords)  # [W, x_ch]
    emb_y = _sincos_table(y_ch, y_coords)  # [H, y_ch]
    pix = np.arange(width * height)
    x_idx, y_idx = pix // height, pix % height
    chw = np.empty((channels, height * width), np.float32)
    chw[:x_ch, :] = emb_x[x_idx].T
    chw[x_ch:, :] = emb_y[y_idx].T
    return torch.from_numpy(chw.reshape(1, channels, height, width))


def add_pos_embed(x: torch.Tensor, image_width: int, image_height: int) -> torch.Tensor:
    _, c, h, w = x.shape
    return x + positional_embedding(c, h, w, image_width, image_height) * POS_EMBED_RATIO


# ---------------------------------------------------------------------------
# DINOv2 backbone (upstream naming: model.backbone.pretrained.*)
# ---------------------------------------------------------------------------


class LayerScale(nn.Module):
    def __init__(self, dim: int, init: float = 1e-5):
        super().__init__()
        self.gamma = nn.Parameter(torch.full((dim,), init))

    def forward(self, x):
        return x * self.gamma


class Attention(nn.Module):
    """Standard MHA; optional per-head QK LayerNorm (eps 1e-6, the DA3-small
    ``qk_norm_block_start`` variant) and 2-D axial RoPE on patch tokens."""

    def __init__(self, dim: int, heads: int, qk_norm: bool = False):
        super().__init__()
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads
        if qk_norm:
            hd = dim // heads
            self.q_norm = nn.LayerNorm(hd, eps=1e-6)
            self.k_norm = nn.LayerNorm(hd, eps=1e-6)

    def forward(self, x, rope=None, num_prefix: int = 0):
        b, t, d = x.shape
        h = self.heads
        hd = d // h
        qkv = self.qkv(x).reshape(b, t, 3, h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if hasattr(self, "q_norm"):
            q = self.q_norm(q)
            k = self.k_norm(k)
        if rope is not None:
            cos, sin = rope
            q = _apply_rope(q, cos, sin, num_prefix)
            k = _apply_rope(k, cos, sin, num_prefix)
        att = (q @ k.transpose(-2, -1)) * hd ** -0.5
        out = (att.softmax(-1) @ v).transpose(1, 2).reshape(b, t, d)
        return self.proj(out)


# ---------------------------------------------------------------------------
# 2-D axial RoPE (DA3-small variant; the rotate-half convention and the
# base^(-2j/d_half) frequency schedule are oracle-pinned against DINOv3,
# the coordinate parameterization is a reconstruction knob)
# ---------------------------------------------------------------------------


def rope_cos_sin(head_dim: int, grid_h: int, grid_w: int, base: float = 100.0,
                 coords: str = "index"):
    """``(cos, sin)`` each ``[N, head_dim//2]``; first half of the rotation
    pairs encodes the row coordinate, second half the column coordinate.

    ``coords``: ``index`` = raw 0..grid-1 patch indices; ``norm_pm1`` =
    DINOv3-style per-axis centered [-1, 1] (``(idx + 0.5)/grid * 2 - 1``).
    """
    d_half = head_dim // 2
    d_axis = d_half // 2
    j = np.arange(d_axis, dtype=np.float64)
    freqs = base ** (-2.0 * j / d_half)
    if coords == "index":
        cy = np.arange(grid_h, dtype=np.float64)
        cx = np.arange(grid_w, dtype=np.float64)
    elif coords == "norm_pm1":
        cy = (np.arange(grid_h, dtype=np.float64) + 0.5) / grid_h * 2.0 - 1.0
        cx = (np.arange(grid_w, dtype=np.float64) + 0.5) / grid_w * 2.0 - 1.0
    else:
        raise ValueError(f"unknown rope coords {coords!r}")
    ys, xs = np.meshgrid(cy, cx, indexing="ij")
    ang = np.concatenate(
        [ys.reshape(-1, 1) * freqs[None, :], xs.reshape(-1, 1) * freqs[None, :]], axis=1
    ).astype(np.float32)
    return torch.from_numpy(np.cos(ang)), torch.from_numpy(np.sin(ang))


def _apply_rope(x: torch.Tensor, cos: torch.Tensor, sin: torch.Tensor,
                num_prefix: int) -> torch.Tensor:
    """Rotate-half on the patch-token tail of ``x: [B, H, T, hd]``; prefix
    tokens (cls/camera) pass through unrotated."""
    prefix, p = x[:, :, :num_prefix], x[:, :, num_prefix:]
    d_half = p.shape[-1] // 2
    p1, p2 = p[..., :d_half], p[..., d_half:]
    rotated = torch.cat([p1 * cos - p2 * sin, p1 * sin + p2 * cos], dim=-1)
    return torch.cat([prefix, rotated], dim=2)


class Mlp(nn.Module):
    def __init__(self, dim: int, hidden: int):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))  # exact erf GELU (DINOv2 default)


class Block(nn.Module):
    def __init__(self, dim: int, heads: int, mlp_ratio: float = 4.0, eps: float = 1e-6,
                 qk_norm: bool = False):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=eps)
        self.attn = Attention(dim, heads, qk_norm=qk_norm)
        self.ls1 = LayerScale(dim)
        self.norm2 = nn.LayerNorm(dim, eps=eps)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))
        self.ls2 = LayerScale(dim)

    def forward(self, x, rope=None, num_prefix: int = 0):
        x = x + self.ls1(self.attn(self.norm1(x), rope=rope, num_prefix=num_prefix))
        return x + self.ls2(self.mlp(self.norm2(x)))


class PatchEmbed(nn.Module):
    def __init__(self, dim: int, patch: int):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, patch, stride=patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)  # [B, N, D] row-major


class DinoViT(nn.Module):
    """Plain DINOv2 (cls token, learned pos embed, pre-norm LS blocks)."""

    def __init__(self, img_size: int, patch: int, dim: int, depth: int, heads: int):
        super().__init__()
        n = (img_size // patch) ** 2
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, 1 + n, dim))
        self.patch_embed = PatchEmbed(dim, patch)
        self.blocks = nn.ModuleList(Block(dim, heads) for _ in range(depth))
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, hook_ids):
        b = x.shape[0]
        t = self.patch_embed(x)
        t = torch.cat([self.cls_token.expand(b, -1, -1), t], dim=1) + self.pos_embed
        hooks = []
        for i, blk in enumerate(self.blocks):
            t = blk(t)
            if i in hook_ids:
                hooks.append(t)  # raw block output, un-normalized (vit.rs:63)
        return hooks


# ---------------------------------------------------------------------------
# mono DPT head (upstream naming: model.head.*)
# ---------------------------------------------------------------------------


class ResConfUnit(nn.Module):
    def __init__(self, c: int):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c, 3, padding=1)
        self.conv2 = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        y = self.conv1(F.relu(x))
        return self.conv2(F.relu(y)) + x


class Refinenet(nn.Module):
    def __init__(self, c: int, has_lateral: bool):
        super().__init__()
        if has_lateral:
            self.resConfUnit1 = ResConfUnit(c)
        self.resConfUnit2 = ResConfUnit(c)
        self.out_conv = nn.Conv2d(c, c, 1)

    def forward(self, top, lateral=None, size=None):
        y = top
        if lateral is not None:
            y = y + self.resConfUnit1(lateral)
        y = self.resConfUnit2(y)
        target = size if size is not None else (y.shape[-2] * 2, y.shape[-1] * 2)
        y = F.interpolate(y, size=target, mode="bilinear", align_corners=True)
        return self.out_conv(y)


class Scratch(nn.Module):
    def __init__(self, out_channels, features: int, output_dim: int):
        super().__init__()
        for i, c in enumerate(out_channels):
            setattr(self, f"layer{i + 1}_rn", nn.Conv2d(c, features, 3, padding=1, bias=False))
        self.refinenet1 = Refinenet(features, True)
        self.refinenet2 = Refinenet(features, True)
        self.refinenet3 = Refinenet(features, True)
        self.refinenet4 = Refinenet(features, False)
        self.output_conv1 = nn.Conv2d(features, features // 2, 3, padding=1)
        self.output_conv2 = nn.Sequential(
            nn.Conv2d(features // 2, 32, 3, padding=1),
            nn.ReLU(),
            nn.Conv2d(32, output_dim, 1),
        )


class MonoHead(nn.Module):
    def __init__(self, dim_in: int, features: int, out_channels, output_dim: int):
        super().__init__()
        oc = out_channels
        self.projects = nn.ModuleList(nn.Conv2d(dim_in, c, 1) for c in oc)
        self.resize_layers = nn.ModuleList([
            nn.ConvTranspose2d(oc[0], oc[0], 4, 4),
            nn.ConvTranspose2d(oc[1], oc[1], 2, 2),
            nn.Identity(),
            nn.Conv2d(oc[3], oc[3], 3, stride=2, padding=1),
        ])
        self.scratch = Scratch(oc, features, output_dim)

    def forward(self, patch_hooks, height: int, width: int, patch: int):
        ph, pw = height // patch, width // patch
        feats = []
        for stage, tokens in enumerate(patch_hooks):
            var, mean = torch.var_mean(tokens, dim=2, unbiased=False, keepdim=True)
            t = (tokens - mean) / (var + 1e-5).sqrt()  # dpt.rs:764-771
            b, n, c = t.shape
            x = t.permute(0, 2, 1).reshape(b, c, ph, pw)
            x = self.projects[stage](x)
            x = add_pos_embed(x, width, height)
            feats.append(self.resize_layers[stage](x))
        s = self.scratch
        l1, l2, l3, l4 = (getattr(s, f"layer{i + 1}_rn")(feats[i]) for i in range(4))
        out = s.refinenet4(l4, None, (l3.shape[-2], l3.shape[-1]))
        out = s.refinenet3(out, l3, (l2.shape[-2], l2.shape[-1]))
        out = s.refinenet2(out, l2, (l1.shape[-2], l1.shape[-1]))
        out = s.refinenet1(out, l1, None)
        out = s.output_conv1(out)
        out = F.interpolate(out, size=(ph * patch, pw * patch), mode="bilinear", align_corners=True)
        out = add_pos_embed(out, width, height)
        return s.output_conv2(out).exp()


# ---------------------------------------------------------------------------
# assembled oracle with upstream state-dict key roots
# ---------------------------------------------------------------------------


class TorchDA3Oracle(nn.Module):
    """``state_dict()`` keys match the ByteDance layout: a ``model.`` root with
    ``backbone.pretrained`` (ViT) and ``head`` (mono DPT)."""

    def __init__(self, img_size=518, patch=14, dim=384, depth=12, heads=6,
                 hook_ids=(2, 5, 8, 11), features=16,
                 out_channels=(8, 12, 16, 16), output_dim=1):
        super().__init__()
        self.img_size, self.patch, self.hook_ids = img_size, patch, tuple(hook_ids)
        self.model = nn.Module()
        self.model.backbone = nn.Module()
        self.model.backbone.pretrained = DinoViT(img_size, patch, dim, depth, heads)
        self.model.head = MonoHead(dim, features, out_channels, output_dim)

    def randomize(self, seed: int = 0, scale: float = 0.08):
        gen = torch.Generator().manual_seed(seed)
        with torch.no_grad():
            for p in self.parameters():
                p.copy_(torch.randn(p.shape, generator=gen) * scale)
        return self

    def forward(self, x):
        """Returns ``(depth [B,H,W], patch_hooks list[[B,N,C]])``."""
        hooks = self.model.backbone.pretrained(x, self.hook_ids)
        patches = [h[:, 1:] for h in hooks]  # strip cls (mod.rs:538)
        h, w = x.shape[-2:]
        logits = self.model.head(patches, h, w, self.patch)
        return logits[:, 0], patches


# ===========================================================================
# DA3-small dual-head variant oracle
# ===========================================================================


class DinoViTSmall(nn.Module):
    """DA3-small ViT-S variant backbone: camera token after cls, QK-norm /
    RoPE / alternating blocks from ``variant_start`` (block 4), cat-token hook
    pairing (reference ``depth_anything3/mod.rs:187-196``).

    Single-view: the alternating (cross-view) blocks are mathematically
    degenerate at S=1, so the block math is the plain pre-norm block; the
    pairing only matters for which block outputs a hook concatenates.
    """

    def __init__(self, img_size: int, patch: int, dim: int, depth: int, heads: int,
                 variant_start: int = 4, rope_base: float = 100.0,
                 rope_coords: str = "index", cat_order: str = "prev_first"):
        super().__init__()
        n = (img_size // patch) ** 2
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.camera_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, 1 + n, dim))
        self.patch_embed = PatchEmbed(dim, patch)
        self.blocks = nn.ModuleList(
            Block(dim, heads, qk_norm=i >= variant_start) for i in range(depth)
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.patch = patch
        self.heads = heads
        self.variant_start = variant_start
        self.rope_base = rope_base
        self.rope_coords = rope_coords
        self.cat_order = cat_order

    def forward(self, x, hook_ids):
        b, _, height, width = x.shape
        gh, gw = height // self.patch, width // self.patch
        t = self.patch_embed(x)
        # pos embed applies to cls+patches; the camera token is inserted after
        # cls AFTERWARD and gets no positional term (mod.rs:284).
        t = torch.cat([self.cls_token.expand(b, -1, -1), t], dim=1) + self.pos_embed
        cam = self.camera_token.expand(b, -1, -1)
        t = torch.cat([t[:, :1], cam, t[:, 1:]], dim=1)
        num_prefix = 2  # cls + camera
        hd = t.shape[-1] // self.heads
        rope = rope_cos_sin(hd, gh, gw, base=self.rope_base, coords=self.rope_coords)
        hooks = []
        prev = t
        for i, blk in enumerate(self.blocks):
            t_new = blk(t, rope=rope if i >= self.variant_start else None,
                        num_prefix=num_prefix)
            if i in hook_ids:
                pair = (prev, t_new) if self.cat_order == "prev_first" else (t_new, prev)
                hooks.append(torch.cat(pair, dim=-1))  # [B, T, 2D]
            prev = t_new
            t = t_new
        return hooks  # full token hooks incl. prefix (cls, camera)


class LayerNorm2d(nn.Module):
    """Channel LayerNorm on NCHW (reference ``LayerNorm2d``, ``dpt.rs:1115-1141``)."""

    def __init__(self, c: int, eps: float = 1e-5):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.eps = eps

    def forward(self, x):
        mean = x.mean(dim=1, keepdim=True)
        var = x.var(dim=1, unbiased=False, keepdim=True)
        y = (x - mean) / (var + self.eps).sqrt()
        return y * self.weight[None, :, None, None] + self.bias[None, :, None, None]


class AuxOutputHead(nn.Module):
    """Upstream Sequential keyed 0 (3x3 conv), 2 (LayerNorm2d, flagged stages
    only), 5 (1x1 conv); relu between the norm slot and the projection
    (``dpt.rs:443-493``)."""

    def __init__(self, in_c: int, out_dim: int, use_ln: bool):
        super().__init__()
        self.add_module("0", nn.Conv2d(in_c, 32, 3, padding=1))
        if use_ln:
            self.add_module("2", LayerNorm2d(32))
        self.add_module("5", nn.Conv2d(32, out_dim, 1))

    def forward(self, x):
        a = getattr(self, "0")(x)
        if hasattr(self, "2"):
            a = getattr(self, "2")(a)
        return getattr(self, "5")(F.relu(a))


class DualScratch(nn.Module):
    def __init__(self, out_channels, features: int, output_dim: int,
                 aux_output_dim: int, aux_ln_flags):
        super().__init__()
        f = features
        for i, c in enumerate(out_channels):
            setattr(self, f"layer{i + 1}_rn", nn.Conv2d(c, f, 3, padding=1, bias=False))
        for aux in ("", "_aux"):
            setattr(self, "refinenet1" + aux, Refinenet(f, True))
            setattr(self, "refinenet2" + aux, Refinenet(f, True))
            setattr(self, "refinenet3" + aux, Refinenet(f, True))
            setattr(self, "refinenet4" + aux, Refinenet(f, False))
        self.output_conv1 = nn.Conv2d(f, f // 2, 3, padding=1)
        self.output_conv2 = nn.Sequential(
            nn.Conv2d(f // 2, 32, 3, padding=1), nn.ReLU(), nn.Conv2d(32, output_dim, 1)
        )
        # aux pre-heads: 5 convs alternating C/2 <-> C, NO activation between
        pre = []
        for _ in range(4):
            layers, in_c = [], f
            for idx in range(5):
                out_c = f // 2 if idx % 2 == 0 else f
                layers.append(nn.Conv2d(in_c, out_c, 3, padding=1))
                in_c = out_c
            pre.append(nn.Sequential(*layers))
        self.output_conv1_aux = nn.ModuleList(pre)
        self.output_conv2_aux = nn.ModuleList(
            AuxOutputHead(f // 2, max(aux_output_dim, 2), use_ln) for use_ln in aux_ln_flags
        )


class DualHead(nn.Module):
    """``DualDepthAnything3Head::forward_dual`` (``dpt.rs:227-513``): learned
    LayerNorm on tokens, main depth/conf branch + aux ray branch with its own
    refinenets, the pos-embed-added-twice quirk on the aux head input."""

    def __init__(self, dim_in: int, features: int, out_channels, output_dim: int = 2,
                 aux_output_dim: int = 7, aux_ln_flags=(True, False, False, False)):
        super().__init__()
        oc = out_channels
        self.norm = nn.LayerNorm(dim_in, eps=1e-5)
        self.projects = nn.ModuleList(nn.Conv2d(dim_in, c, 1) for c in oc)
        self.resize_layers = nn.ModuleList([
            nn.ConvTranspose2d(oc[0], oc[0], 4, 4),
            nn.ConvTranspose2d(oc[1], oc[1], 2, 2),
            nn.Identity(),
            nn.Conv2d(oc[3], oc[3], 3, stride=2, padding=1),
        ])
        self.scratch = DualScratch(oc, features, output_dim, aux_output_dim, aux_ln_flags)
        self.aux_output_dim = aux_output_dim

    def forward(self, patch_hooks, height: int, width: int, patch: int):
        """Returns the dual-head output dict (activated selects + debug taps)."""
        ph, pw = height // patch, width // patch
        feats = []
        for stage, tokens in enumerate(patch_hooks):
            t = self.norm(tokens)
            b, n, c = t.shape
            x = t.permute(0, 2, 1).reshape(b, c, ph, pw)
            x = self.projects[stage](x)
            x = add_pos_embed(x, width, height)
            feats.append(self.resize_layers[stage](x))
        s = self.scratch
        l1, l2, l3, l4 = (getattr(s, f"layer{i + 1}_rn")(feats[i]) for i in range(4))

        # main branch
        out = s.refinenet4(l4, None, (l3.shape[-2], l3.shape[-1]))
        out = s.refinenet3(out, l3, (l2.shape[-2], l2.shape[-1]))
        out = s.refinenet2(out, l2, (l1.shape[-2], l1.shape[-1]))
        out = s.refinenet1(out, l1, None)
        out = s.output_conv1(out)
        out = F.interpolate(out, size=(height, width), mode="bilinear", align_corners=True)
        out = add_pos_embed(out, width, height)
        main_logits = s.output_conv2(out)

        # aux branch: shared RN convs, its own refinenets (dpt.rs:356-441)
        a = s.refinenet4_aux(l4, None, (l3.shape[-2], l3.shape[-1]))
        levels = [a]
        a = s.refinenet3_aux(a, l3, (l2.shape[-2], l2.shape[-1]))
        levels.append(a)
        a = s.refinenet2_aux(a, l2, (l1.shape[-2], l1.shape[-1]))
        levels.append(a)
        a = s.refinenet1_aux(a, l1, None)
        levels.append(a)
        necks = [s.output_conv1_aux[i](level) for i, level in enumerate(levels)]
        last = add_pos_embed(necks[-1], width, height)
        head_input = add_pos_embed(last, width, height)  # quirk: embed added twice
        aux_logits = s.output_conv2_aux[-1](head_input)

        depth = main_logits[:, 0].exp()
        depth_conf = main_logits[:, -1].exp() + 1.0
        ray = aux_logits[:, : self.aux_output_dim - 1]
        ray_conf = aux_logits[:, self.aux_output_dim - 1].exp() + 1.0
        return {
            "depth": depth,
            "depth_confidence": depth_conf,
            "ray": ray,
            "ray_confidence": ray_conf,
            "aux_logits": aux_logits,
            "aux_stage_necks": necks,
            "aux_head_input": head_input,
        }


# ---------------------------------------------------------------------------
# camera pose decoder / (import-only) encoder
# ---------------------------------------------------------------------------


def quaternion_to_matrix_torch(quat: torch.Tensor) -> torch.Tensor:
    """``[..., 4] (x,y,z,w) → [..., 3, 3]`` (``camera.rs:362-416``)."""
    x, y, z, w = quat.unbind(-1)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = torch.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], dim=-1)
    row1 = torch.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], dim=-1)
    row2 = torch.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], dim=-1)
    return torch.stack([row0, row1, row2], dim=-2)


def pose_encoding_to_extri_intri_torch(pose: torch.Tensor, image_height: int,
                                       image_width: int):
    """``[B,V,9] → ([B,V,3,4] w2c, [B,V,3,3] K)`` (``camera.rs:281-356``)."""
    b, v = pose.shape[:2]
    flat = pose.reshape(b * v, 9)
    t = flat[:, :3].unsqueeze(-1)
    quat = flat[:, 3:7]
    fov_h, fov_w = flat[:, 7], flat[:, 8]
    rot_t = quaternion_to_matrix_torch(quat).transpose(-1, -2)
    extr = torch.cat([rot_t, -(rot_t @ t)], dim=-1).reshape(b, v, 3, 4)
    tan_h = torch.sin(fov_h * 0.5) / torch.cos(fov_h * 0.5)
    tan_w = torch.sin(fov_w * 0.5) / torch.cos(fov_w * 0.5)
    fy = (image_height / 2.0) / tan_h
    fx = (image_width / 2.0) / tan_w
    zeros, ones = torch.zeros_like(fx), torch.ones_like(fx)
    k = torch.stack([
        torch.stack([fx, zeros, torch.full_like(fx, image_width / 2.0)], dim=-1),
        torch.stack([zeros, fy, torch.full_like(fx, image_height / 2.0)], dim=-1),
        torch.stack([zeros, zeros, ones], dim=-1),
    ], dim=-2).reshape(b, v, 3, 3)
    return extr, k


class CamDec(nn.Module):
    """``CameraDecoder`` (``camera.rs:143-198``): relu MLP backbone + t/qvec/fov
    heads; fov passes an extra relu (Sequential slot 1 upstream)."""

    def __init__(self, dim_in: int):
        super().__init__()
        self.backbone = nn.Sequential(nn.Linear(dim_in, dim_in), nn.ReLU(), nn.Linear(dim_in, dim_in))
        self.fc_t = nn.Linear(dim_in, 3)
        self.fc_qvec = nn.Linear(dim_in, 4)
        self.fc_fov = nn.Sequential(nn.Linear(dim_in, 2), nn.ReLU())

    def forward(self, features, image_height: int, image_width: int):
        b, v, c = features.shape
        h = F.relu(self.backbone(features.reshape(b * v, c)))
        pose = torch.cat([self.fc_t(h), self.fc_qvec(h), self.fc_fov(h)], dim=-1)
        pose = pose.reshape(b, v, 9)
        extr, intr = pose_encoding_to_extri_intri_torch(pose, image_height, image_width)
        return pose, extr, intr


class CamEnc(nn.Module):
    """``CameraEncoder`` (``camera.rs:50-111``).  Present so the state dict
    carries the full upstream small manifest; ``infer`` without camera context
    never runs it (the gate's forward passes extr/intr = None)."""

    def __init__(self, dim_out: int, heads: int, trunk_depth: int = 4, dim_in: int = 9):
        super().__init__()
        self.pose_branch = nn.Module()
        self.pose_branch.fc1 = nn.Linear(dim_in, dim_out // 2)
        self.pose_branch.fc2 = nn.Linear(dim_out // 2, dim_out)
        self.trunk = nn.ModuleList(Block(dim_out, heads) for _ in range(trunk_depth))
        self.token_norm = nn.LayerNorm(dim_out)
        self.trunk_norm = nn.LayerNorm(dim_out)


class TorchDA3SmallOracle(nn.Module):
    """DA3-small dual-head oracle with the upstream ByteDance key layout
    (``tests/fixtures/da3_small_upstream_keys.txt``): ``model.`` root with
    ``backbone.pretrained`` (variant ViT-S), ``head`` (dual DPT),
    ``cam_dec`` and ``cam_enc``.

    Real small geometry by default (518², patch 14, embed 384, 12 blocks,
    variant knobs from block 4, head dim_in 768 = 2·384); head channel widths
    are thin (the architecture shape, not capacity, is what a random-weight
    dump proves — same policy as the mono oracle)."""

    def __init__(self, img_size=518, patch=14, dim=384, depth=12, heads=6,
                 hook_ids=(5, 7, 9, 11), features=32,
                 out_channels=(16, 24, 32, 32), output_dim=2, aux_output_dim=7,
                 rope_coords="index", cat_order="prev_first"):
        super().__init__()
        self.img_size, self.patch, self.hook_ids = img_size, patch, tuple(hook_ids)
        self.rope_coords, self.cat_order = rope_coords, cat_order
        self.features, self.out_channels = features, tuple(out_channels)
        self.model = nn.Module()
        self.model.backbone = nn.Module()
        self.model.backbone.pretrained = DinoViTSmall(
            img_size, patch, dim, depth, heads,
            rope_coords=rope_coords, cat_order=cat_order,
        )
        self.model.head = DualHead(2 * dim, features, out_channels,
                                   output_dim=output_dim, aux_output_dim=aux_output_dim)
        self.model.cam_dec = CamDec(2 * dim)
        self.model.cam_enc = CamEnc(dim, heads)

    def randomize(self, seed: int = 0, scale: float = 0.08):
        gen = torch.Generator().manual_seed(seed)
        with torch.no_grad():
            for p in self.parameters():
                p.copy_(torch.randn(p.shape, generator=gen) * scale)
            # Keep the decoded FOV away from the relu clamp at 0: tan(fov/2)
            # → 0 makes the intrinsics blow up (fx = W / 2·tan).  Small
            # weights + bias 1 pin the pre-relu value near 1 rad for any
            # input; any fixed choice works since both sides import the same
            # weights.
            self.model.cam_dec.fc_fov[0].weight.mul_(0.01)
            self.model.cam_dec.fc_fov[0].bias.fill_(1.0)
        return self

    def forward(self, x):
        """Returns a dict: final outputs, patch hooks ``[B, N, 2D]``, camera
        pose, and aux debug taps — the reference's small dump schema
        (``tool/correctness_da3.py:110-173``)."""
        full_hooks = self.model.backbone.pretrained(x, self.hook_ids)
        patches = [h[:, 2:] for h in full_hooks]  # strip cls + camera token
        h, w = x.shape[-2:]
        out = self.model.head(patches, h, w, self.patch)
        camera_feat = full_hooks[-1][:, 1]  # camera token slot (after cls)
        pose, extr, intr = self.model.cam_dec(camera_feat[:, None, :], h, w)
        out.update({
            "pose_encoding": pose,
            "extrinsics": extr,
            "intrinsics": intr,
            "backbone_tokens": patches,
        })
        return out
