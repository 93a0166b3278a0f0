"""Host-side image preparation (registry layer).

Counterpart of reference ``src/model/mod.rs:162-210``
(``prepare_depth_anything3_image``: shortest-side CatmullRom resize + center
crop to the model square) and the golden tool's half-pixel bicubic
(``tool/correctness_da3.py:40-81``, kernel a=-0.75).

This is the *offline/CLI* path — the serving path resizes on device inside
the jitted graph (``ops/interpolate.py``).  Implemented vectorized (separable
kernel, precomputed tap matrices) instead of the reference tools' quadruple
Python loop; the math is identical: half-pixel sampling, clamped borders,
joint weight normalization (weights factor per axis, so per-axis
normalization is exact), single final u8 rounding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

CATMULL_ROM = -0.5  # image-crate FilterType::CatmullRom (runtime prep)
TORCH_BICUBIC = -0.75  # torch/OpenCV kernel (golden-dump tool)


def round_half_away(x: float) -> int:
    """Round half AWAY from zero, like the reference's Rust ``f32::round``
    (``model/mod.rs:181-182``) and the native lane's C++ ``lround``.  Python's
    built-in ``round`` is banker's rounding and diverges on exact .5 scaled
    dimensions (e.g. 1037px at scale 0.5 → 519, not 518)."""
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _cubic_kernel(x: np.ndarray, a: float) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    inner = (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0
    outer = a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a
    return np.where(ax <= 1.0, inner, np.where(ax < 2.0, outer, 0.0)).astype(np.float64)


def _axis_taps(src: int, dst: int, a: float) -> tuple[np.ndarray, np.ndarray]:
    """(indices [dst,4], weights [dst,4]) for one axis, half-pixel sampling,
    clamped borders, normalized weights."""
    coord = (np.arange(dst, dtype=np.float64) + 0.5) * (src / dst) - 0.5
    base = np.floor(coord).astype(np.int64)
    offsets = np.arange(-1, 3)
    idx = base[:, None] + offsets[None, :]
    w = _cubic_kernel(coord[:, None] - idx, a)
    w = w / w.sum(axis=1, keepdims=True)
    return np.clip(idx, 0, src - 1), w


def resize_bicubic(img: np.ndarray, out_h: int, out_w: int, a: float = CATMULL_ROM) -> np.ndarray:
    """``[H,W,C] u8 or float → [out_h,out_w,C]``, same dtype semantics as the
    reference tools: u8 input rounds back to u8, float stays float."""
    img_f = img.astype(np.float64)
    iy, wy = _axis_taps(img.shape[0], out_h, a)
    ix, wx = _axis_taps(img.shape[1], out_w, a)
    # rows: [H,W,C] -> [out_h,W,C]; img_f[iy] is [out_h,4,W,C]
    tmp = np.einsum("ok,okwc->owc", wy, img_f[iy])
    # cols: tmp[:, ix] is [out_h,out_w,4,C]
    out = np.einsum("ok,hokc->hoc", wx, tmp[:, ix])
    if img.dtype == np.uint8:
        return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    return out.astype(img.dtype)


@dataclasses.dataclass
class ImageCropRegion:
    """Reference ``ImageCropRegion`` (``model/mod.rs:144-150``)."""

    x: int
    y: int
    width: int
    height: int


@dataclasses.dataclass
class PreparedModelImage:
    """Reference ``PreparedModelImage`` (``model/mod.rs:152-158``)."""

    width: int
    height: int
    rgb: np.ndarray  # [H,W,3] u8
    crop: Optional[ImageCropRegion] = None


def prepare_depth_anything3_image(image: np.ndarray, target: int) -> PreparedModelImage:
    """Shortest-side resize (CatmullRom) + center crop to ``target`` square
    (reference ``model/mod.rs:162-210``)."""
    if target == 0:
        raise ValueError("depth_anything3 requires a non-zero target resolution")
    orig_h, orig_w = image.shape[:2]
    if orig_w == target and orig_h == target:
        return PreparedModelImage(width=target, height=target, rgb=image.copy())

    shortest = max(min(orig_w, orig_h), 1)
    scale = target / shortest
    scaled_w = max(round_half_away(orig_w * scale), target)
    scaled_h = max(round_half_away(orig_h * scale), target)
    resized = resize_bicubic(image, scaled_h, scaled_w, a=CATMULL_ROM)
    crop_x = (scaled_w - target) // 2
    crop_y = (scaled_h - target) // 2
    cropped = resized[crop_y : crop_y + target, crop_x : crop_x + target]
    return PreparedModelImage(width=target, height=target, rgb=np.ascontiguousarray(cropped))


def prepare_depth_anything3_image_aspect(
    image: np.ndarray, target: int, patch: int = 14, max_dim: Optional[int] = None
) -> PreparedModelImage:
    """Aspect-preserving DA3 prep (beyond-parity: the reference always
    center-crops to a square, discarding FOV on non-square frames —
    ``model/mod.rs:162-210``).  The shortest side resizes to ``target`` and
    BOTH dims round to the nearest patch multiple, which is all the backbone
    requires (H, W % patch == 0; pos-embeds are built per traced shape).

    ``max_dim`` caps the long side (extreme panoramas explode the token
    count quadratically in resolution); when the cap binds, the image is
    scaled down uniformly so aspect is still preserved.
    """
    if target % patch:
        raise ValueError(f"target {target} not a multiple of patch {patch}")
    orig_h, orig_w = image.shape[:2]
    shortest = max(min(orig_w, orig_h), 1)
    scale = target / shortest
    if max_dim is not None and max(orig_h, orig_w) * scale > max_dim:
        scale = max_dim / max(orig_h, orig_w)
    to_mult = lambda v: max(patch, round_half_away(v / patch) * patch)  # noqa: E731
    w = to_mult(orig_w * scale)
    h = to_mult(orig_h * scale)
    if (h, w) == (orig_h, orig_w):
        return PreparedModelImage(width=w, height=h, rgb=image.copy())
    return PreparedModelImage(
        width=w, height=h, rgb=np.ascontiguousarray(resize_bicubic(image, h, w, a=CATMULL_ROM))
    )
