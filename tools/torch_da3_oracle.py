"""Torch-only DA3 oracle: DINOv2 backbone + mono DPT head with upstream
ByteDance parameter naming.

This module is the PyTorch half of the DA3 golden-dump → verify-gate pipeline
(the role upstream's ``depth_anything_3`` package plays for the reference's
``tool/correctness_da3.py:110-310``): an independent torch implementation of
the metric-mono DA3 forward whose ``state_dict()`` keys follow the upstream
checkpoint convention (``model.backbone.pretrained.blocks.N...``,
``model.head.scratch.refinenetN.resConfUnitM...`` — see
``tests/fixtures/da3_metric_large_upstream_keys.txt``), so the saved state
dict flows through ``burn_depth_tpu.io.importers.import_da3`` exactly like a
real checkpoint.

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
    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads

    def forward(self, x):
        b, t, d = x.shape
        h = self.heads
        hd = d // h
        qkv = self.qkv(x).reshape(b, t, 3, h, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) * hd ** -0.5
        out = (att.softmax(-1) @ v).transpose(1, 2).reshape(b, t, d)
        return self.proj(out)


class Mlp(nn.Module):
    def __init__(self, dim: int, hidden: int):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))  # exact erf GELU (DINOv2 default)


class Block(nn.Module):
    def __init__(self, dim: int, heads: int, mlp_ratio: float = 4.0, eps: float = 1e-6):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=eps)
        self.attn = Attention(dim, heads)
        self.ls1 = LayerScale(dim)
        self.norm2 = nn.LayerNorm(dim, eps=eps)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))
        self.ls2 = LayerScale(dim)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
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
