"""Benchmark dataset adapters (train/datasets.py): KITTI/NYU protocol —
depth decode scale, validity caps, Eigen crop, native-resolution scoring
with prediction upsampling."""

import numpy as np
import pytest

from burn_depth_tpu.train.datasets import DATASETS, benchmark_eval_batches


def _write_kitti(tmp_path, frames, img_hw=(48, 64)):
    """frames: list of uint16 depth arrays (native PNG values, meters*256)."""
    from PIL import Image

    (tmp_path / "image").mkdir()
    (tmp_path / "depth").mkdir()
    rng = np.random.default_rng(0)
    for i, d in enumerate(frames):
        rgb = rng.integers(0, 256, (*d.shape, 3), dtype=np.uint8)
        Image.fromarray(rgb).save(tmp_path / "image" / f"{i:04d}.png")
        Image.fromarray(d.astype(np.uint16)).save(tmp_path / "depth" / f"{i:04d}.png")
    return str(tmp_path)


def test_protocol_constants():
    k, n = DATASETS["kitti"], DATASETS["nyu"]
    assert k.depth_scale == 256.0 and k.max_depth == 80.0
    assert n.depth_scale == 1000.0 and n.max_depth == 10.0
    # Eigen/Garg crop fractions (literature constants)
    np.testing.assert_allclose(k.crop_frac, (0.40810811, 0.99189189, 0.03594771, 0.96405229))
    # NYU border crop [45:471, 41:601] on 480x640
    np.testing.assert_allclose(n.crop_frac, (45 / 480, 471 / 480, 41 / 640, 601 / 640))


def test_kitti_decode_caps_and_crop(tmp_path):
    h, w = 48, 64
    d = np.zeros((h, w), np.uint16)
    d[30, 10] = 256 * 5          # 5 m — valid, inside crop
    d[30, 11] = 256 * 81         # 81 m — beyond cap
    d[0, 10] = 256 * 5           # valid depth but above the Eigen crop
    root = _write_kitti(tmp_path, [d])
    batches = list(benchmark_eval_batches(root, size=32, dataset="kitti", ingest="squash"))
    assert len(batches) == 1
    b = batches[0]
    assert b["image"].shape == (1, 3, 32, 32) and b["image"].dtype == np.float32
    assert b["depth"].shape == (1, h, w)
    np.testing.assert_allclose(b["depth"][0, 30, 10], 5.0)
    np.testing.assert_allclose(b["depth"][0, 30, 11], 81.0)
    m = b["mask"][0]
    assert m[30, 10] == 1.0          # valid
    assert m[30, 11] == 0.0          # over the 80 m cap
    assert m[0, 10] == 0.0           # outside the Eigen crop (top of frame)
    assert m[30, 12] == 0.0          # no LiDAR return (depth 0)
    # crop row bounds: rows [int(.408*48), int(.992*48)) = [19, 47)
    assert m[18].sum() == 0 and m[47].sum() == 0


def test_crop_mode_center_square(tmp_path):
    h, w = 40, 60
    d = np.full((h, w), 256 * 4, np.uint16)
    root = _write_kitti(tmp_path, [d])
    b = next(iter(benchmark_eval_batches(root, size=28, dataset="kitti", ingest="crop")))
    # GT center-square-cropped at native resolution (40x40 of the 40x60)
    assert b["depth"].shape == (1, 40, 40)
    assert b["image"].shape == (1, 3, 28, 28)


def test_shape_change_flushes_batch(tmp_path):
    d1 = np.full((40, 60), 256 * 4, np.uint16)
    d2 = np.full((42, 60), 256 * 4, np.uint16)
    root = _write_kitti(tmp_path, [d1, d1, d2])
    shapes = [b["depth"].shape for b in
              benchmark_eval_batches(root, size=28, dataset="kitti", ingest="squash", batch=4)]
    assert shapes == [(2, 40, 60), (1, 42, 60)]


def test_depth_scale_override(tmp_path):
    d = np.full((48, 64), 1000, np.uint16)
    root = _write_kitti(tmp_path, [d])
    b = next(iter(benchmark_eval_batches(root, size=28, dataset="kitti",
                                         ingest="squash", depth_scale=1000.0)))
    np.testing.assert_allclose(b["depth"][0, 30, 10], 1.0)


def test_missing_layout_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="none of"):
        list(benchmark_eval_batches(str(tmp_path), size=28, dataset="kitti"))


def test_evaluate_model_upsamples_prediction_to_gt(tmp_path):
    """Benchmark protocol end to end: model predicts at its square input
    resolution, evaluate_model upsamples to native GT resolution; a constant
    ground truth scored against a constant prediction is exact."""
    from burn_depth_tpu.train import evaluate_model

    h, w = 48, 64
    d = np.full((h, w), 256 * 4, np.uint16)  # 4 m everywhere
    root = _write_kitti(tmp_path, [d])
    gen = benchmark_eval_batches(root, size=32, dataset="kitti", ingest="squash")

    scores = evaluate_model(lambda img: np.full((img.shape[0], 32, 32), 4.0, np.float32), gen)
    assert scores["abs_rel"] < 1e-6
    assert scores["delta1"] == 1.0


def test_evaluate_cli_kitti_end_to_end(tmp_path):
    """CLI drive: tiny random-weight DA3 on a 2-frame kitti-layout dir must
    print the metric battery and exit 0."""
    import contextlib
    import io

    from burn_depth_tpu.cli.evaluate import main

    d = np.full((40, 60), 256 * 4, np.uint16)
    root = _write_kitti(tmp_path, [d, d])
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = main([
            "--model", "depth-anything-3", "--preset", "tiny", "--data", root,
            "--dataset", "kitti", "--platform", "cpu",
        ])
    assert rc == 0
    assert "abs_rel=" in out.getvalue()


def test_aspect_ingest_full_frame(tmp_path):
    """Default DA3 ingest: aspect-preserving model input (dims rounded to
    patch multiples), GT at FULL native frame — published-protocol
    comparable, unlike the center-crop mode."""
    d = np.full((40, 60), 256 * 4, np.uint16)
    root = _write_kitti(tmp_path, [d])
    b = next(iter(benchmark_eval_batches(root, size=28, dataset="kitti",
                                         ingest="aspect", patch=14)))
    assert b["image"].shape == (1, 3, 28, 42)   # 60 * 28/40 = 42
    assert b["depth"].shape == (1, 40, 60)      # full frame, untouched
    assert b["mask"].shape == (1, 40, 60)


def test_per_image_averaging_skips_empty_and_weights_equally(tmp_path):
    """per_image=True: each image with valid GT counts once (published
    averaging); an image with an empty valid mask is skipped entirely."""
    from burn_depth_tpu.train import evaluate_model

    h, w = 48, 64
    dense = np.full((h, w), 256 * 4, np.uint16)     # 4 m everywhere
    sparse = np.zeros((h, w), np.uint16)
    sparse[30, 10] = 256 * 2                        # one valid pixel at 2 m
    empty = np.zeros((h, w), np.uint16)             # no valid GT at all
    root = _write_kitti(tmp_path, [dense, sparse, empty])

    def predict(img):
        return np.full((img.shape[0], 32, 32), 4.0, np.float32)

    gen = benchmark_eval_batches(root, size=32, dataset="kitti", ingest="squash", batch=3)
    scores = evaluate_model(predict, gen, per_image=True)
    # dense image: abs_rel 0; sparse image: |4-2|/2 = 1.0; empty: skipped.
    # equal per-image weighting -> mean 0.5 (pixel pooling would give ~0).
    np.testing.assert_allclose(scores["abs_rel"], 0.5, atol=1e-6)

    pooled = evaluate_model(
        predict,
        benchmark_eval_batches(root, size=32, dataset="kitti", ingest="squash", batch=3),
    )
    assert pooled["abs_rel"] < 0.01  # the skew per_image exists to fix


def test_per_image_rejects_extra_metrics():
    from burn_depth_tpu.train import evaluate_model

    with pytest.raises(ValueError, match="mutually exclusive"):
        evaluate_model(lambda x: x, [], per_image=True, extra_metrics=lambda a, b: {})


# ---- training lane (benchmark_train_batches) --------------------------------


def test_train_batches_geometry_and_mask(tmp_path):
    """Square serving-geometry batches; mask = validity caps WITHOUT the
    Eigen crop (training uses every valid pixel); nearest depth resampling
    invents no values (sparse LiDAR stays sparse)."""
    from burn_depth_tpu.train.datasets import benchmark_train_batches

    h, w = 48, 64
    d = np.zeros((h, w), np.uint16)
    d[2, 32] = 256 * 5       # valid pixel ABOVE the Eigen crop rows
    d[30, 32] = 256 * 81     # beyond the 80 m cap
    d[40, 40] = 256 * 7
    root = _write_kitti(tmp_path, [d, d])
    b = next(iter(benchmark_train_batches(root, 32, dataset="kitti", batch=2)))
    assert b["image"].shape == (2, 3, 32, 32) and b["image"].dtype == np.float32
    assert b["depth"].shape == (2, 32, 32) and b["mask"].shape == (2, 32, 32)
    # nearest resampling: every value in the resized depth existed in the
    # source (0, 5, 7, 81 m) — bilinear would interpolate new ones
    got = np.unique(b["depth"])
    assert set(np.round(got, 5)).issubset({0.0, 5.0, 7.0, 81.0})
    # caps: any surviving 81 m sample is masked out; 5/7 m samples are valid
    assert np.all(b["mask"][np.isclose(b["depth"], 81.0)] == 0.0)
    for v in (5.0, 7.0):
        hits = np.isclose(b["depth"], v)
        if hits.any():
            assert np.all(b["mask"][hits] == 1.0)
    # no Eigen crop in training: the surviving 5 m pixel near the top of the
    # frame must be maskable-valid somewhere (row scales 2*32/48 ≈ 1)
    assert b["mask"].sum() > 0


def test_train_batches_cycle_and_shuffle_determinism(tmp_path):
    """The endless generator cycles past the dataset length, and the same
    seed yields the same sample order."""
    from burn_depth_tpu.train.datasets import benchmark_train_batches

    frames = [np.full((40, 60), 256 * (i + 1), np.uint16) for i in range(3)]
    root = _write_kitti(tmp_path, frames)

    def first_depths(seed, n=5):
        gen = benchmark_train_batches(root, 32, dataset="kitti", batch=1, seed=seed)
        return [float(next(gen)["depth"].max()) for _ in range(n)]

    a = first_depths(0)
    assert len(set(a[:3])) == 3          # one epoch covers all 3 frames
    assert a[3] == a[0] and a[4] == a[1]  # then cycles in the same order
    assert first_depths(0) == a           # seed-deterministic


def test_train_cli_kitti_end_to_end(tmp_path):
    """One DA3-tiny fine-tune step directly on a kitti-layout dir, then the
    published-protocol eval leg, through the CLI."""
    import contextlib
    import io

    from burn_depth_tpu.cli.train import main as train_main

    d = np.full((40, 60), 256 * 4, np.uint16)
    root = _write_kitti(tmp_path, [d, d])
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = train_main([
            "--model", "depth-anything-3", "--preset", "tiny", "--steps", "1",
            "--batch", "1", "--log-every", "1", "--remat", "none",
            "--data", f"kitti:{root}", "--eval-data", f"kitti:{root}",
            "--eval-batches", "2", "--platform", "cpu",
        ])
    assert rc == 0
    text = out.getvalue()
    assert "step 1:" in text
    assert "eval(train-set): " in text and "abs_rel=" in text


def test_train_cli_rejects_benchmark_data_with_views(tmp_path):
    from burn_depth_tpu.cli.train import main as train_main

    with pytest.raises(SystemExit, match="single-view"):
        train_main([
            "--model", "depth-anything-3", "--preset", "tiny", "--steps", "1",
            "--batch", "2", "--views", "2", "--data", "kitti:/nonexistent",
            "--platform", "cpu",
        ])


def test_gt_paired_lanes_disable_exif_rotation(tmp_path, monkeypatch):
    """The benchmark lanes pair RGB with raw-orientation depth PNGs, so the
    RGB ingest must NOT EXIF-rotate (a rotated image against an unrotated GT
    would silently misalign every supervised pixel)."""
    from burn_depth_tpu.api import native
    from burn_depth_tpu.train import datasets as ds

    seen = []
    real = native.ImageLoader

    class Spy(real):
        def __init__(self, *a, **kw):
            seen.append(kw.get("exif_rotate", "default-on"))
            super().__init__(*a, **kw)

    monkeypatch.setattr(native, "ImageLoader", Spy)
    root = _write_kitti(tmp_path, [np.full((40, 60), 256 * 4, np.uint16)])
    gen = ds.benchmark_train_batches(root, 32, dataset="kitti")
    next(gen)
    gen.close()
    list(ds.benchmark_eval_batches(root, 32, dataset="kitti", ingest="squash"))
    assert seen == [False, False]


# ---- NYU official .mat (HDF5) archive ----


def _write_nyu_mat(tmp_path, n=3, h=32, w=48):
    """Synthetic archive in the official layout h5py sees: MATLAB's
    column-major [H W 3 N] / [H W N] arrive axis-reversed as
    images (N,3,W,H) u8 and depths (N,W,H) f32 meters."""
    import h5py

    rng = np.random.default_rng(0)
    rgbs = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    deps = rng.uniform(0.5, 9.5, (n, h, w)).astype(np.float32)
    path = str(tmp_path / "nyu_depth_v2_labeled.mat")
    with h5py.File(path, "w") as f:
        f.create_dataset("images", data=rgbs.transpose(0, 3, 2, 1))
        f.create_dataset("depths", data=deps.transpose(0, 2, 1))
        f.create_dataset("rawDepths", data=np.zeros((n, w, h), np.float32))
    return path, rgbs, deps


def test_nyu_archive_axis_order(tmp_path):
    """The MATLAB axis reversal is undone: rgb(i)/depth(i) return the
    conventional (H,W,3)/(H,W) frames that went in."""
    from burn_depth_tpu.train.datasets import NyuH5Archive

    path, rgbs, deps = _write_nyu_mat(tmp_path)
    with NyuH5Archive(path) as ar:
        assert len(ar) == 3
        np.testing.assert_array_equal(ar.rgb(1), rgbs[1])
        np.testing.assert_allclose(ar.depth(1), deps[1])
    with NyuH5Archive(path, indices=[2, 0]) as ar:
        assert len(ar) == 2
        np.testing.assert_array_equal(ar.rgb(0), rgbs[2])


def test_nyu_archive_eval_batches(tmp_path):
    path, rgbs, deps = _write_nyu_mat(tmp_path, n=3, h=32, w=48)
    batches = list(benchmark_eval_batches(
        path, size=28, dataset="nyu", ingest="squash", batch=2))
    assert [b["depth"].shape[0] for b in batches] == [2, 1]
    b = batches[0]
    assert b["image"].shape == (2, 3, 28, 28) and b["image"].dtype == np.float32
    # GT full-frame, already meters (no /1000), protocol mask applied
    np.testing.assert_allclose(b["depth"][0], deps[0])
    spec = DATASETS["nyu"]
    np.testing.assert_array_equal(b["mask"][0], spec.valid_mask(deps[0]))
    # crop mode: GT center-square at native resolution
    c = next(iter(benchmark_eval_batches(path, size=28, dataset="nyu", ingest="crop")))
    assert c["depth"].shape == (1, 32, 32)


def test_nyu_archive_train_batches(tmp_path):
    from burn_depth_tpu.train.datasets import benchmark_train_batches

    path, rgbs, deps = _write_nyu_mat(tmp_path, n=2, h=32, w=48)
    gen = benchmark_train_batches(path, 24, dataset="nyu", batch=2)
    b = next(gen)
    gen.close()
    assert b["image"].shape == (2, 3, 24, 24)
    assert b["depth"].shape == (2, 24, 24)
    assert set(np.unique(b["mask"])) <= {0.0, 1.0}
    # depths in (0.5, 9.5) m are all inside the NYU caps
    assert b["mask"].mean() == 1.0


def test_h5_archive_requires_nyu(tmp_path):
    path, _, _ = _write_nyu_mat(tmp_path)
    with pytest.raises(ValueError, match="dataset='nyu'"):
        list(benchmark_eval_batches(path, size=28, dataset="kitti"))


def test_non_archive_h5_named_file_raises(tmp_path):
    import h5py

    path = str(tmp_path / "other.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("foo", data=np.zeros(3))
    from burn_depth_tpu.train.datasets import NyuH5Archive

    with pytest.raises(KeyError, match="missing"):
        NyuH5Archive(path)


# ---- official KITTI raw-sync trees + split files ----


def _write_kitti_sync(tmp_path, drives, hw=(40, 56), gt_sub="train", cams=("image_02",)):
    """Official checkout shape: raw RGB under <date>/<drive>/<cam>/data/,
    annotated depth under [gt_sub/]<drive>/proj_depth/groundtruth/<cam>/."""
    from PIL import Image

    rng = np.random.default_rng(0)
    h, w = hw
    for drive, frames in drives.items():
        date = drive[:10]
        for cam in cams:
            rgb_dir = tmp_path / date / drive / cam / "data"
            gt_dir = tmp_path / gt_sub / drive / "proj_depth" / "groundtruth" / cam
            rgb_dir.mkdir(parents=True, exist_ok=True)
            gt_dir.mkdir(parents=True, exist_ok=True)
            for f in frames:
                rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                Image.fromarray(rgb).save(rgb_dir / f"{f:010d}.png")
                d = np.full((h, w), 256 * 4, np.uint16)
                Image.fromarray(d).save(gt_dir / f"{f:010d}.png")
    return str(tmp_path)


def test_kitti_sync_tree_walk(tmp_path):
    """The official raw-sync + annotated-depth tree is walked with no
    relayout; GT drives whose raw half is absent are skipped."""
    from burn_depth_tpu.train.datasets import _kitti_sync_pairs

    root = _write_kitti_sync(
        tmp_path, {"2011_09_26_drive_0002_sync": [5, 9]}, cams=("image_02", "image_03")
    )
    # GT-only drive (raw half not downloaded) must be skipped
    orphan = tmp_path / "val" / "2011_09_28_drive_0001_sync" / "proj_depth" / "groundtruth" / "image_02"
    orphan.mkdir(parents=True)
    from PIL import Image

    Image.fromarray(np.zeros((4, 4), np.uint16)).save(orphan / "0000000001.png")

    pairs = _kitti_sync_pairs(root)
    assert len(pairs) == 4  # 2 frames x 2 cams
    assert all("proj_depth" in gt and "/data/" in rgb for rgb, gt in pairs)
    # end-to-end through the public generator (layout auto-detected)
    b = next(iter(benchmark_eval_batches(root, size=28, dataset="kitti", ingest="squash")))
    np.testing.assert_allclose(b["depth"][0][b["mask"][0] > 0], 4.0)


def test_split_file_resolution_and_warnings(tmp_path):
    """BTS-style split lines resolve RGB against root and GT against
    gt_root (train/+val/ searched); 'None' GT and missing files warn."""
    from burn_depth_tpu.train.datasets import load_split_pairs

    drive = "2011_09_26_drive_0002_sync"
    root = _write_kitti_sync(tmp_path, {drive: [5, 9]})
    split = tmp_path / "eigen_test.txt"
    split.write_text(
        f"2011_09_26/{drive}/image_02/data/0000000005.png {drive}/proj_depth/groundtruth/image_02/0000000005.png 721.5377\n"
        f"2011_09_26/{drive}/image_02/data/0000000009.png {drive}/proj_depth/groundtruth/image_02/0000000009.png 721.5377\n"
        f"2011_09_26/{drive}/image_02/data/0000000099.png None None\n"
        f"2011_09_26/{drive}/image_02/data/0000000123.png {drive}/proj_depth/groundtruth/image_02/0000000123.png 721.5377\n"
    )
    with pytest.warns(UserWarning):
        pairs = load_split_pairs(root, str(split))
    assert len(pairs) == 2
    # generator honors the split subset
    batches = list(benchmark_eval_batches(
        root, size=28, dataset="kitti", ingest="squash", split=str(split)))
    assert sum(b["depth"].shape[0] for b in batches) == 2
    # nothing resolvable -> loud failure
    bad = tmp_path / "bad.txt"
    bad.write_text("nope/a.png nope/b.png\n")
    with pytest.raises(FileNotFoundError, match="no line resolved"):
        load_split_pairs(root, str(bad))


def test_nyu_split_indices_mat_and_text(tmp_path):
    """Official splits.mat (1-based testNdxs, MATLAB v5) and plain index
    files both restrict the archive lanes."""
    from scipy.io import savemat

    from burn_depth_tpu.train.datasets import nyu_split_indices

    mat = str(tmp_path / "splits.mat")
    savemat(mat, {"testNdxs": np.array([[1], [3]], dtype=np.int64)})
    assert nyu_split_indices(mat) == [0, 2]
    txt = tmp_path / "idx.txt"
    txt.write_text("2\n0\n")
    assert nyu_split_indices(str(txt)) == [2, 0]

    path, rgbs, deps = _write_nyu_mat(tmp_path, n=4)
    batches = list(benchmark_eval_batches(
        path, size=28, dataset="nyu", ingest="squash", split=mat))
    assert sum(b["depth"].shape[0] for b in batches) == 2
    np.testing.assert_allclose(batches[0]["depth"][0], deps[0])
    np.testing.assert_allclose(batches[1]["depth"][0], deps[2])


def test_train_batches_split_subset(tmp_path):
    from burn_depth_tpu.train.datasets import benchmark_train_batches

    drive = "2011_09_26_drive_0002_sync"
    root = _write_kitti_sync(tmp_path, {drive: [5, 9]})
    split = tmp_path / "train.txt"
    split.write_text(
        f"2011_09_26/{drive}/image_02/data/0000000005.png {drive}/proj_depth/groundtruth/image_02/0000000005.png\n"
    )
    gen = benchmark_train_batches(root, 24, dataset="kitti", batch=2, split=str(split))
    b = next(gen)
    gen.close()
    assert b["image"].shape == (2, 3, 24, 24)
    # single-pair split cycled: both batch rows decode the same frame
    np.testing.assert_allclose(b["depth"][0], b["depth"][1])
