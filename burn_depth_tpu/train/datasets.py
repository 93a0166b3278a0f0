"""Standard-benchmark dataset adapters (KITTI / NYUv2): evaluation + training.

The reference stops at parity thresholds against PyTorch; the model repos it
wraps (apple/ml-depth-pro, Depth Anything 3) are *evaluated* on the standard
monocular-depth benchmarks.  This module gives the framework that capability:
read the common on-disk layouts, apply each benchmark's published protocol
(depth decode scale, validity caps, evaluation crop), and yield batches in
the ``train/data.py`` contract (``{"image", "depth", "mask"}``) for
:func:`burn_depth_tpu.train.metrics.evaluate_model`.

Protocol per dataset (the Eigen conventions used across the literature):

* **kitti** — 16-bit depth PNGs, meters = value/256, 0 = no LiDAR return;
  valid range (1e-3, 80] m; Garg/Eigen evaluation crop expressed as frame
  fractions ``rows [0.40810811, 0.99189189], cols [0.03594771, 0.96405229]``
  so it applies at any resolution.
* **nyu** — 16-bit depth PNGs, meters = value/1000 (millimeter dumps);
  valid range (1e-3, 10] m; the standard border crop ``rows [45, 471],
  cols [41, 601]`` of the 480x640 frames, applied fractionally.

Layout: ``root/image/*.png|jpg`` (alias ``rgb/``) paired with
``root/depth/*.png`` by filename stem.  Scoring follows the benchmark
protocol end to end: the model predicts at its own square resolution, the
prediction is upsampled to native GT resolution inside ``evaluate_model``,
and the caps + crop enter as the mask — never by resizing ground truth
(resampling sparse LiDAR interpolates across depth discontinuities).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, Optional

import numpy as np

__all__ = [
    "DATASETS",
    "DatasetSpec",
    "benchmark_eval_batches",
    "benchmark_train_batches",
]


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    name: str
    depth_scale: float  # meters = png_value / depth_scale
    min_depth: float
    max_depth: float
    # evaluation crop as frame fractions (row0, row1, col0, col1)
    crop_frac: tuple

    def valid_mask(self, depth_m: np.ndarray) -> np.ndarray:
        """Protocol mask at the depth map's own resolution: caps ∧ crop."""
        h, w = depth_m.shape
        r0, r1, c0, c1 = self.crop_frac
        mask = np.zeros((h, w), np.float32)
        mask[int(r0 * h) : int(r1 * h), int(c0 * w) : int(c1 * w)] = 1.0
        mask *= (depth_m > self.min_depth) & (depth_m <= self.max_depth)
        return mask


DATASETS = {
    "kitti": DatasetSpec(
        "kitti", depth_scale=256.0, min_depth=1e-3, max_depth=80.0,
        crop_frac=(0.40810811, 0.99189189, 0.03594771, 0.96405229),
    ),
    "nyu": DatasetSpec(
        "nyu", depth_scale=1000.0, min_depth=1e-3, max_depth=10.0,
        crop_frac=(45 / 480, 471 / 480, 41 / 640, 601 / 640),
    ),
}

_IMG_DIRS = ("image", "rgb", "images")
_DEPTH_DIRS = ("depth", "groundtruth", "gt")


def _find_dir(root: str, names) -> str:
    for n in names:
        p = os.path.join(root, n)
        if os.path.isdir(p):
            return p
    raise FileNotFoundError(f"none of {names} under {root}")


def _pair_files(root: str) -> list:
    from burn_depth_tpu.api.native import IMAGE_EXTS

    img_dir = _find_dir(root, _IMG_DIRS)
    depth_dir = _find_dir(root, _DEPTH_DIRS)
    stem = lambda f: os.path.splitext(f)[0]  # noqa: E731
    imgs = {
        stem(f): os.path.join(img_dir, f)
        for f in os.listdir(img_dir)
        if f.lower().endswith(IMAGE_EXTS)
    }
    depths = {
        stem(f): os.path.join(depth_dir, f)
        for f in os.listdir(depth_dir)
        if f.lower().endswith(".png")
    }
    common = sorted(set(imgs) & set(depths))
    if not common:
        raise FileNotFoundError(
            f"no image/depth stem pairs under {root} "
            f"({len(imgs)} images, {len(depths)} depth maps)"
        )
    return [(imgs[s], depths[s]) for s in common]


def _center_square(a: np.ndarray) -> np.ndarray:
    h, w = a.shape[:2]
    s = min(h, w)
    y, x = (h - s) // 2, (w - s) // 2
    return a[y : y + s, x : x + s]


def _depth_to_square_nearest(dep: np.ndarray, size: int) -> np.ndarray:
    """Shortest-side scale + center crop to ``size``² with NEAREST sampling,
    mirroring the native RGB ingest geometry (``api/native.py`` fallback /
    ``loader.cc``: ``round_half_away`` scaled dims, centered crop) so pixel
    (i, j) of the depth stays paired with pixel (i, j) of the image.

    Nearest (half-pixel-center index map) rather than bilinear: sparse LiDAR
    must stay sparse — bilinear interpolates across depth discontinuities and
    smears no-return zeros into valid pixels, poisoning the masked loss.
    """
    h, w = dep.shape
    if (h, w) == (size, size):
        return dep
    from burn_depth_tpu.api.preprocess import round_half_away

    scale = size / min(h, w)
    sw = max(round_half_away(w * scale), size)
    sh = max(round_half_away(h * scale), size)
    ys = np.minimum((np.arange(sh) + 0.5) * (h / sh), h - 1).astype(np.int64)
    xs = np.minimum((np.arange(sw) + 0.5) * (w / sw), w - 1).astype(np.int64)
    resized = dep[ys[:, None], xs[None, :]]
    cy, cx = (sh - size) // 2, (sw - size) // 2
    return resized[cy : cy + size, cx : cx + size]


def benchmark_train_batches(
    root: str,
    size: int,
    *,
    dataset: str = "kitti",
    batch: int = 1,
    depth_scale: Optional[float] = None,
    seed: int = 0,
    threads: int = 4,
    limit: Optional[int] = None,
) -> Iterator[dict]:
    """Endless fine-tune batches from a benchmark-layout directory.

    Training counterpart of :func:`benchmark_eval_batches` — fine-tune
    directly on a KITTI/NYU tree (``root/image/`` + ``root/depth/`` 16-bit
    PNGs) with no conversion step:

    * RGB rides the native square-crop ingest lane (shortest-side CatmullRom
      resize + center crop + ImageNet normalize — the exact serving geometry,
      so the fine-tune never trains on a distribution inference won't see).
    * Depth is decoded by the dataset's published scale and nearest-resampled
      through the SAME crop geometry (:func:`_depth_to_square_nearest`).
    * The mask is the dataset's validity caps only (``min_depth`` <
      d ≤ ``max_depth``); the Eigen evaluation crop is deliberately NOT
      applied — it is a scoring convention, and training uses every valid
      pixel (KITTI's sky region masks itself: no LiDAR return ⇒ depth 0).

    The pair list is shuffled once (``seed``) and cycled; per-step
    stochasticity comes from ``train/augment.py``.  Square geometry means
    batches never change shape, so one XLA program serves the whole run.
    """
    from PIL import Image

    from burn_depth_tpu.api.native import ImageLoader

    spec = DATASETS[dataset]
    if depth_scale is not None:
        spec = dataclasses.replace(spec, depth_scale=float(depth_scale))
    pairs = _pair_files(root)
    if limit is not None:
        pairs = pairs[: int(limit)]
    order = np.random.default_rng(seed).permutation(len(pairs))
    pairs = [pairs[i] for i in order]

    with ImageLoader(
        [p for p, _ in pairs], size, mode="nchw", loop=True,
        threads=threads, window=max(2 * batch, 4), crop=True,
        # GT-paired lane: the depth PNG is stored in the file's raw pixel
        # orientation, so the RGB must NOT be EXIF-rotated — rotating one
        # side would silently pair every pixel with the wrong depth.
        exif_rotate=False,
    ) as loader:
        i = 0
        while True:
            imgs, deps = [], []
            for _ in range(batch):
                imgs.append(next(loader))
                raw = np.asarray(Image.open(pairs[i % len(pairs)][1]))
                if raw.ndim != 2:
                    raise ValueError(
                        f"{pairs[i % len(pairs)][1]}: expected single-channel "
                        f"depth PNG, got {raw.shape}"
                    )
                dep = raw.astype(np.float32) / spec.depth_scale
                deps.append(_depth_to_square_nearest(dep, size))
                i += 1
            deps_np = np.stack(deps)
            mask = (deps_np > spec.min_depth) & (deps_np <= spec.max_depth)
            yield {
                "image": np.stack(imgs),
                "depth": deps_np,
                "mask": mask.astype(np.float32),
            }


def benchmark_eval_batches(
    root: str,
    size: int,
    *,
    dataset: str = "kitti",
    ingest: str = "aspect",
    batch: int = 1,
    depth_scale: Optional[float] = None,
    limit: Optional[int] = None,
    threads: int = 4,
    patch: int = 14,
) -> Iterator[dict]:
    """Yield eval batches for a benchmark directory.

    ``size`` is the model's input resolution; ``ingest`` selects the model's
    ingest geometry:

    * ``"aspect"`` (default) — shortest side to ``size``, both dims rounded
      to ``patch`` multiples, no crop (``prepare_depth_anything3_image_aspect``).
      GT stays full-frame, so scores are comparable to the published
      full-frame protocol.  The right mode for DA3 on KITTI's wide frames —
      a center-square crop would score only ~30% of the frame.
    * ``"squash"`` — squash resize to ``size``² (Depth Pro's canonical
      ingest; its network resizes internally and predicts full-frame).  GT
      stays full-frame.
    * ``"crop"`` — shortest-side resize + center crop to ``size``² (the
      reference's DA3 prep).  GT and mask are center-square-cropped at
      native resolution so prediction and target cover the same pixels;
      NOT comparable to published full-frame numbers — offered for parity
      with the reference's serving ingest.

    Frames whose native shape differs (KITTI sequences vary by a few rows)
    are batched only with same-shape neighbors — a smaller batch is flushed
    at every shape change, so stacking never pads or resamples ground truth.
    """
    from PIL import Image

    if ingest not in ("aspect", "squash", "crop"):
        raise ValueError(f"ingest must be aspect|squash|crop, got {ingest!r}")
    spec = DATASETS[dataset]
    if depth_scale is not None:
        spec = dataclasses.replace(spec, depth_scale=float(depth_scale))
    pairs = _pair_files(root)
    if limit is not None:
        pairs = pairs[: int(limit)]

    def flush(buf):
        return {
            "image": np.stack([b[0] for b in buf]),
            "depth": np.stack([b[1] for b in buf]),
            "mask": np.stack([b[2] for b in buf]),
        }

    def gts():
        for _, depth_path in pairs:
            raw = np.asarray(Image.open(depth_path))
            if raw.ndim != 2:
                raise ValueError(f"{depth_path}: expected single-channel depth PNG, got {raw.shape}")
            gt = raw.astype(np.float32) / spec.depth_scale
            yield gt, spec.valid_mask(gt)

    def batched(items):
        buf: list = []
        for img, gt, mask in items:
            if buf and buf[-1][1].shape != gt.shape:
                yield flush(buf)
                buf = []
            buf.append((img, gt, mask))
            if len(buf) == batch:
                yield flush(buf)
                buf = []
        if buf:
            yield flush(buf)

    if ingest == "aspect":
        # per-image shapes vary -> PIL decode + aspect prep (the native
        # loader's lanes are square-target); normalize on host like mode
        # "nchw" does.
        from burn_depth_tpu.api.native import rgb_to_nchw_norm
        from burn_depth_tpu.api.preprocess import prepare_depth_anything3_image_aspect

        def items():
            for (img_path, _), (gt, mask) in zip(pairs, gts()):
                rgb = np.asarray(Image.open(img_path).convert("RGB"))
                prep = prepare_depth_anything3_image_aspect(rgb, size, patch=patch)
                yield rgb_to_nchw_norm(prep.rgb), gt, mask

        yield from batched(items())
        return

    from burn_depth_tpu.api.native import ImageLoader

    crop = ingest == "crop"
    with ImageLoader(
        [p for p, _ in pairs], size, mode="nchw", threads=threads,
        window=max(2 * batch, 4), crop=crop,
        # GT stays in raw pixel orientation (and the aspect lane's PIL decode
        # never rotates) — keep the RGB un-rotated too so image and depth
        # cover the same pixels.
        exif_rotate=False,
    ) as loader:
        def items():
            for gt, mask in gts():
                img = next(loader)
                if crop:
                    gt, mask = _center_square(gt), _center_square(mask)
                yield img, gt, mask

        yield from batched(items())
