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

Layouts:

* directory — ``root/image/*.png|jpg`` (alias ``rgb/``) paired with
  ``root/depth/*.png`` by filename stem.
* KITTI official trees — ``root`` holding the raw-sync drives
  (``<date>/<drive>_sync/image_0N/data/*.png``) together with the
  annotated depth maps (``[train/|val/]<drive>_sync/proj_depth/
  groundtruth/image_0N/*.png``) is walked directly — no relayout step.
* split file — ``split=`` points at a BTS/monodepth-style list
  (``rgb_rel gt_rel [focal]`` per line, ``None`` = no GT) resolved
  against ``root`` / ``gt_root``; the standard Eigen split files work
  as published.
* NYU official archive — ``root`` may be the ``nyu_depth_v2_labeled.mat``
  FILE (MATLAB v7.3 == HDF5; needs ``h5py``): datasets ``images`` /
  ``depths`` are read in place, no PNG conversion step.  Depths in the
  archive are already float meters, so no decode scale applies.  With
  ``split=`` = the official ``splits.mat`` (or a text file of 0-based
  indices), only the test subset is read.

Scoring follows the benchmark protocol end to end: the model predicts at
its own square resolution, the prediction is upsampled to native GT
resolution inside ``evaluate_model``, and the caps + crop enter as the
mask — never by resizing ground truth (resampling sparse LiDAR
interpolates across depth discontinuities).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, Optional

import numpy as np

__all__ = [
    "DATASETS",
    "DatasetSpec",
    "NyuH5Archive",
    "benchmark_eval_batches",
    "benchmark_train_batches",
    "load_split_pairs",
    "nyu_split_indices",
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
_H5_EXTS = (".mat", ".h5", ".hdf5")


class NyuH5Archive:
    """Reader for the official NYU Depth v2 labeled archive
    (``nyu_depth_v2_labeled.mat``, a MATLAB v7.3 file = HDF5).

    MATLAB stores column-major, so h5py sees every dataset with its axes
    reversed: ``images`` is ``(N, 3, W, H) u8`` (MATLAB ``[H W 3 N]``) and
    ``depths``/``rawDepths`` are ``(N, W, H) f32`` (MATLAB ``[H W N]``).
    Accessors undo the transpose and return conventional ``(H, W, 3)`` RGB
    and ``(H, W)`` depth.  Depth values are float METERS already — the
    millimeter ``/1000`` decode of PNG dumps does not apply.

    ``depth_key`` selects ``"depths"`` (the official in-painted maps the
    published protocol scores against) or ``"rawDepths"`` (Kinect returns
    with 0 = invalid).  ``indices`` restricts to a subset (e.g. a vendored
    Eigen test split); default is the full archive in file order.
    """

    def __init__(self, path: str, depth_key: str = "depths", indices=None):
        try:
            import h5py
        except ImportError as e:  # pragma: no cover - h5py present in CI
            raise ImportError(
                "reading the NYU .mat archive needs h5py (pip install h5py)"
            ) from e
        self._f = h5py.File(path, "r")
        missing = [k for k in ("images", depth_key) if k not in self._f]
        if missing:
            have = sorted(self._f.keys())
            self._f.close()
            raise KeyError(
                f"{path}: not an NYU labeled archive — missing {missing} "
                f"(has {have[:8]})"
            )
        self._depth_key = depth_key
        n = self._f["images"].shape[0]
        self._indices = list(range(n)) if indices is None else [int(i) for i in indices]
        for i in self._indices:
            if not 0 <= i < n:
                raise IndexError(f"index {i} out of range for {n}-image archive")

    def __len__(self) -> int:
        return len(self._indices)

    def rgb(self, i: int) -> np.ndarray:
        a = self._f["images"][self._indices[i]]  # (3, W, H) u8
        return np.ascontiguousarray(np.transpose(a, (2, 1, 0)))

    def depth(self, i: int) -> np.ndarray:
        a = self._f[self._depth_key][self._indices[i]]  # (W, H) f32 meters
        return np.ascontiguousarray(a.T.astype(np.float32))

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _is_h5_archive(root: str) -> bool:
    return os.path.isfile(root) and root.lower().endswith(_H5_EXTS)


def _require_nyu_archive(root: str, dataset: str) -> None:
    if dataset != "nyu":
        raise ValueError(
            f"{root}: HDF5 archives are the NYU labeled format — use "
            f"dataset='nyu' (got {dataset!r}; KITTI ships as PNG trees)"
        )


def _find_dir(root: str, names) -> str:
    for n in names:
        p = os.path.join(root, n)
        if os.path.isdir(p):
            return p
    raise FileNotFoundError(f"none of {names} under {root}")


def _flat_pairs(root: str) -> list:
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


# the official "annotated depth maps" archive keeps drives under train/ and
# val/; merged checkouts put them at the root — resolve GT under all three
_KITTI_GT_SUBDIRS = ("", "train", "val")


def _kitti_sync_pairs(root: str) -> list:
    """Walk the official KITTI checkout shape with no relayout step:

    * annotated depth maps (depth-prediction benchmark archive) —
      ``{root|root/train|root/val}/<drive>_sync/proj_depth/groundtruth/
      image_0N/<frame>.png`` (16-bit, meters = value/256)
    * raw-sync RGB — ``root/<date>/<drive>_sync/image_0N/data/<frame>.png``
      (``<date>`` = first 10 chars of the drive name, e.g. ``2011_09_26``)

    Pairs every GT frame with its RGB; drives whose raw half was not
    downloaded are skipped (partial checkouts are the norm — the Eigen
    split needs only 29 of the 151 raw drives).
    """
    pairs = []
    for sub in _KITTI_GT_SUBDIRS:
        base = os.path.join(root, sub) if sub else root
        if not os.path.isdir(base):
            continue
        for drive in sorted(os.listdir(base)):
            gt_base = os.path.join(base, drive, "proj_depth", "groundtruth")
            if not os.path.isdir(gt_base):
                continue
            date = drive[:10]
            for cam in sorted(os.listdir(gt_base)):
                cam_dir = os.path.join(gt_base, cam)
                rgb_dir = os.path.join(root, date, drive, cam, "data")
                if not (os.path.isdir(cam_dir) and os.path.isdir(rgb_dir)):
                    continue
                for f in sorted(os.listdir(cam_dir)):
                    rgb = os.path.join(rgb_dir, f)
                    if f.endswith(".png") and os.path.isfile(rgb):
                        pairs.append((rgb, os.path.join(cam_dir, f)))
    return pairs


def _pair_files(root: str) -> list:
    """Resolve RGB/GT pairs under ``root``: flat ``image/``+``depth/``
    first, then the official KITTI raw-sync + annotated-depth tree."""
    try:
        return _flat_pairs(root)
    except FileNotFoundError as flat_err:
        pairs = _kitti_sync_pairs(root)
        if pairs:
            return pairs
        raise FileNotFoundError(
            f"{root}: neither a flat benchmark layout ({flat_err}) nor a "
            "KITTI raw-sync tree (<date>/<drive>_sync/image_0N/data + "
            "[train/|val/]<drive>_sync/proj_depth/groundtruth/image_0N)"
        ) from None


def _resolve_gt(gt_root: str, rel: str) -> Optional[str]:
    for sub in _KITTI_GT_SUBDIRS:
        p = os.path.join(gt_root, sub, rel) if sub else os.path.join(gt_root, rel)
        if os.path.isfile(p):
            return p
    return None


def load_split_pairs(root: str, split: str, gt_root: Optional[str] = None) -> list:
    """Resolve a BTS/monodepth-style split file to ``(rgb, gt)`` path pairs.

    Each line is ``rgb_rel gt_rel [focal]`` — RGB relative to ``root``, GT
    relative to ``gt_root`` (default ``root``; ``train/``/``val/`` of the
    official annotated-depth archive are searched automatically).  A
    ``gt_rel`` of ``None`` (frames without ground truth in the standard
    Eigen lists) is skipped, as are pairs whose files are absent on disk —
    partial raw checkouts are the norm.  Raises if *nothing* resolves;
    warns with counts when some lines were dropped so a silent protocol
    deviation cannot pass as a clean run.
    """
    import warnings

    gt_root = gt_root or root
    pairs, no_gt, missing = [], 0, []
    with open(split) as f:
        for line in f:
            toks = line.split()
            if not toks or toks[0].startswith("#"):
                continue
            if len(toks) < 2 or toks[1] == "None":
                no_gt += 1
                continue
            rgb = os.path.join(root, toks[0])
            gt = _resolve_gt(gt_root, toks[1])
            if gt is None or not os.path.isfile(rgb):
                missing.append(toks[0])
                continue
            pairs.append((rgb, gt))
    if not pairs:
        raise FileNotFoundError(
            f"{split}: no line resolved to files on disk under root={root} "
            f"gt_root={gt_root} (first misses: {missing[:3]})"
        )
    if missing:
        warnings.warn(
            f"{split}: {len(missing)}/{len(pairs) + len(missing)} entries "
            f"missing on disk (e.g. {missing[0]}) — scoring the rest",
            stacklevel=2,
        )
    if no_gt:
        warnings.warn(
            f"{split}: {no_gt} entries have no ground truth ('None') — skipped",
            stacklevel=2,
        )
    return pairs


def nyu_split_indices(split: str) -> list:
    """0-based archive indices from the official NYU ``splits.mat``
    (MATLAB v5 ``testNdxs``, 1-based — needs scipy; v7.3 falls back to
    h5py) or from a plain text file of 0-based indices."""
    if split.lower().endswith(".mat"):
        try:
            from scipy.io import loadmat

            m = loadmat(split)
            arr = m.get("testNdxs")
        except NotImplementedError:  # MATLAB v7.3 — HDF5
            import h5py

            with h5py.File(split, "r") as f:
                arr = np.asarray(f["testNdxs"]) if "testNdxs" in f else None
        if arr is None:
            raise KeyError(f"{split}: no 'testNdxs' dataset (not an NYU splits.mat?)")
        return [int(i) - 1 for i in np.asarray(arr).ravel()]
    with open(split) as f:
        return [int(t) for t in f.read().split()]


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


def _h5_train_batches(
    root: str, size: int, *, spec: DatasetSpec, scale: float, batch: int,
    seed: int, limit: Optional[int], indices=None,
) -> Iterator[dict]:
    """NYU-archive leg of :func:`benchmark_train_batches`: decode RGB/depth
    straight from the HDF5 datasets through the same square geometry as the
    native PNG lane (shortest-side resize + center crop / nearest depth)."""
    from burn_depth_tpu.api.native import resize_and_crop_u8, rgb_to_nchw_norm

    with NyuH5Archive(root, indices=indices) as ar:
        n = len(ar) if limit is None else min(len(ar), int(limit))
        order = np.random.default_rng(seed).permutation(n)
        i = 0
        while True:
            imgs, deps = [], []
            for _ in range(batch):
                j = int(order[i % n])
                imgs.append(rgb_to_nchw_norm(resize_and_crop_u8(ar.rgb(j), size)))
                deps.append(_depth_to_square_nearest(ar.depth(j) / scale, size))
                i += 1
            deps_np = np.stack(deps)
            mask = (deps_np > spec.min_depth) & (deps_np <= spec.max_depth)
            yield {
                "image": np.stack(imgs),
                "depth": deps_np,
                "mask": mask.astype(np.float32),
            }


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
    split: Optional[str] = None,
    gt_root: Optional[str] = None,
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
    if _is_h5_archive(root):
        _require_nyu_archive(root, dataset)
        # archive depths are float meters — a decode divisor applies only
        # when the caller explicitly passes one
        yield from _h5_train_batches(
            root, size, spec=spec,
            scale=float(depth_scale) if depth_scale is not None else 1.0,
            batch=batch, seed=seed, limit=limit,
            indices=nyu_split_indices(split) if split else None,
        )
        return
    pairs = load_split_pairs(root, split, gt_root) if split else _pair_files(root)
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


def _h5_eval_batches(
    root: str, size: int, *, spec: DatasetSpec, scale: float, ingest: str,
    batch: int, limit: Optional[int], patch: int, indices=None,
) -> Iterator[dict]:
    """NYU-archive leg of :func:`benchmark_eval_batches` — same three ingest
    geometries, RGB/GT decoded from the HDF5 datasets instead of PNG pairs.
    Archive frames share one shape (480x640), so fixed-size batching holds."""
    from burn_depth_tpu.api.native import (
        resize_and_crop_u8,
        resize_bicubic_u8,
        rgb_to_nchw_norm,
    )

    def flush(buf):
        return {
            "image": np.stack([b[0] for b in buf]),
            "depth": np.stack([b[1] for b in buf]),
            "mask": np.stack([b[2] for b in buf]),
        }

    with NyuH5Archive(root, indices=indices) as ar:
        n = len(ar) if limit is None else min(len(ar), int(limit))
        buf: list = []
        for i in range(n):
            rgb = ar.rgb(i)
            gt = ar.depth(i) / scale
            mask = spec.valid_mask(gt)
            if ingest == "aspect":
                from burn_depth_tpu.api.preprocess import (
                    prepare_depth_anything3_image_aspect,
                )

                img = rgb_to_nchw_norm(
                    prepare_depth_anything3_image_aspect(rgb, size, patch=patch).rgb
                )
            elif ingest == "squash":
                img = rgb_to_nchw_norm(resize_bicubic_u8(rgb, size, size))
            else:  # crop
                img = rgb_to_nchw_norm(resize_and_crop_u8(rgb, size))
                gt, mask = _center_square(gt), _center_square(mask)
            buf.append((img, gt, mask))
            if len(buf) == batch:
                yield flush(buf)
                buf = []
        if buf:
            yield flush(buf)


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
    split: Optional[str] = None,
    gt_root: Optional[str] = None,
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
    if _is_h5_archive(root):
        _require_nyu_archive(root, dataset)
        yield from _h5_eval_batches(
            root, size, spec=spec,
            scale=float(depth_scale) if depth_scale is not None else 1.0,
            ingest=ingest, batch=batch, limit=limit, patch=patch,
            indices=nyu_split_indices(split) if split else None,
        )
        return
    pairs = load_split_pairs(root, split, gt_root) if split else _pair_files(root)
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
