"""Host-side training augmentations (beyond-parity; the reference has no
training at all).

Operates on the pipeline's numpy batch dicts (``{"image" [B,3,H,W]
ImageNet-normalized, "depth" [B,H,W], "mask" [B,H,W]}``) BEFORE
``prefetch_to_device``, so the jitted train step stays static-shape and
augmentation overlaps device compute for free.

Geometric: horizontal flip (image+depth+mask together — depth is
view-consistent under mirroring).  Photometric: brightness/contrast/noise,
applied in [0,1] space (un-normalize → jitter → re-normalize, exact), depth
untouched.  Optional global depth scaling for affine-invariant objectives.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator

import numpy as np

from burn_depth_tpu.api.predict import IMAGENET_MEAN, IMAGENET_STD


def augment_batch(
    batch: Dict[str, np.ndarray],
    rng: np.random.Generator,
    *,
    hflip: float = 0.5,
    brightness: float = 0.2,
    contrast: float = 0.2,
    noise: float = 0.01,
    depth_scale: float = 0.0,
    normalized: bool = True,
) -> Dict[str, np.ndarray]:
    """Return an augmented copy of ``batch`` (inputs not mutated).

    * ``hflip``: per-sample flip probability.
    * ``brightness``: per-sample additive shift in ±brightness ([0,1] space).
    * ``contrast``: per-sample scale in 1±contrast around the image mean.
    * ``noise``: gaussian pixel noise stddev ([0,1] space).
    * ``depth_scale``: if > 0, scale depth per-sample by ``exp(U(-s, s))``
      (for scale-invariant objectives; leave 0 for metric fine-tunes).
    * ``normalized``: whether ``image`` is ImageNet-normalized (the
      paired-file pipeline) or raw [0,1] (the synthetic pipeline).  The
      photometric knobs are defined in [0,1] space either way.
    """
    img = np.array(batch["image"], np.float32)  # [B,3,H,W] normalized
    depth = np.array(batch["depth"], np.float32)
    mask = np.array(batch["mask"], np.float32)
    b = img.shape[0]

    flip = rng.random(b) < hflip
    if flip.any():
        img[flip] = img[flip, :, :, ::-1]
        depth[flip] = depth[flip, :, ::-1]
        mask[flip] = mask[flip, :, ::-1]

    if brightness > 0 or contrast > 0 or noise > 0:
        if normalized:
            mean = np.asarray(IMAGENET_MEAN).reshape(1, 3, 1, 1)
            std = np.asarray(IMAGENET_STD).reshape(1, 3, 1, 1)
            x01 = img * std + mean
        else:
            mean = np.zeros((1, 3, 1, 1), np.float32)
            std = np.ones((1, 3, 1, 1), np.float32)
            x01 = img
        if contrast > 0:
            c = rng.uniform(1 - contrast, 1 + contrast, (b, 1, 1, 1)).astype(np.float32)
            pivot = x01.mean(axis=(1, 2, 3), keepdims=True)
            x01 = pivot + c * (x01 - pivot)
        if brightness > 0:
            x01 = x01 + rng.uniform(-brightness, brightness, (b, 1, 1, 1)).astype(np.float32)
        if noise > 0:
            x01 = x01 + rng.normal(0.0, noise, x01.shape).astype(np.float32)
        img = ((np.clip(x01, 0.0, 1.0) - mean) / std).astype(np.float32)

    if depth_scale > 0:
        s = np.exp(rng.uniform(-depth_scale, depth_scale, (b, 1, 1))).astype(np.float32)
        depth = depth * s

    out = dict(batch)
    out["image"], out["depth"], out["mask"] = img, depth, mask
    return out


def augmented_batches(
    batches: Iterable[Dict[str, np.ndarray]], seed: int, **kwargs
) -> Iterator[Dict[str, np.ndarray]]:
    """Wrap a batch generator with :func:`augment_batch` (own RNG stream)."""
    rng = np.random.default_rng(seed)
    for batch in batches:
        yield augment_batch(batch, rng, **kwargs)
