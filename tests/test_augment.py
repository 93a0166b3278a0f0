"""Training augmentation tests (``train/augment.py``)."""

import numpy as np

from burn_depth_tpu.api.predict import IMAGENET_MEAN, IMAGENET_STD
from burn_depth_tpu.train.augment import augment_batch, augmented_batches
from burn_depth_tpu.train.data import synthetic_depth_batches


def _batch(b=4, s=8, seed=0):
    return next(synthetic_depth_batches(seed, b, s, steps=1))


def test_identity_when_disabled():
    batch = _batch()
    rng = np.random.default_rng(0)
    out = augment_batch(batch, rng, hflip=0.0, brightness=0.0, contrast=0.0, noise=0.0)
    for k in ("image", "depth", "mask"):
        np.testing.assert_array_equal(out[k], batch[k])
        assert out[k] is not batch[k]  # copies, inputs unmutated


def test_hflip_consistent_across_fields():
    batch = _batch()
    rng = np.random.default_rng(1)
    out = augment_batch(batch, rng, hflip=1.0, brightness=0.0, contrast=0.0, noise=0.0)
    np.testing.assert_array_equal(out["image"], batch["image"][:, :, :, ::-1])
    np.testing.assert_array_equal(out["depth"], batch["depth"][:, :, ::-1])
    np.testing.assert_array_equal(out["mask"], batch["mask"][:, :, ::-1])


def test_photometric_touches_image_only_and_stays_normalized():
    # the paired-file pipeline: images arrive ImageNet-normalized
    raw = _batch()
    mean = np.asarray(IMAGENET_MEAN).reshape(1, 3, 1, 1)
    std = np.asarray(IMAGENET_STD).reshape(1, 3, 1, 1)
    batch = dict(raw, image=((np.clip(raw["image"], 0, 1) - mean) / std).astype(np.float32))
    rng = np.random.default_rng(2)
    out = augment_batch(batch, rng, hflip=0.0, brightness=0.3, contrast=0.3, noise=0.02)
    assert not np.array_equal(out["image"], batch["image"])
    np.testing.assert_array_equal(out["depth"], batch["depth"])
    np.testing.assert_array_equal(out["mask"], batch["mask"])
    # re-normalized output maps back into [0, 1] exactly (clipped pre-norm)
    x01 = out["image"] * std + mean
    assert x01.min() >= -1e-5 and x01.max() <= 1.0 + 1e-5


def test_photometric_unnormalized_space():
    # the synthetic pipeline: images are raw [0,1]; jitter must clip there
    batch = _batch()
    rng = np.random.default_rng(5)
    out = augment_batch(
        batch, rng, hflip=0.0, brightness=0.3, contrast=0.3, noise=0.02, normalized=False
    )
    assert not np.array_equal(out["image"], batch["image"])
    assert out["image"].min() >= -1e-5 and out["image"].max() <= 1.0 + 1e-5
    # a brightness shift lands 1:1 in image space (no ~1/std amplification)
    shift_only = augment_batch(
        _batch(), np.random.default_rng(6),
        hflip=0.0, brightness=0.3, contrast=0.0, noise=0.0, normalized=False,
    )
    delta = np.abs(shift_only["image"] - np.clip(_batch()["image"], 0, 1))
    assert delta.max() <= 0.3 + 1e-5


def test_depth_scale_bounded_and_positive():
    batch = _batch()
    rng = np.random.default_rng(3)
    out = augment_batch(
        batch, rng, hflip=0.0, brightness=0.0, contrast=0.0, noise=0.0, depth_scale=0.4
    )
    ratio = out["depth"] / batch["depth"]
    # one global scale per sample
    per_sample = ratio.reshape(ratio.shape[0], -1)
    np.testing.assert_allclose(
        per_sample, np.broadcast_to(per_sample[:, :1], per_sample.shape), rtol=1e-5
    )
    assert np.all(per_sample > np.exp(-0.4) - 1e-6)
    assert np.all(per_sample < np.exp(0.4) + 1e-6)


def test_generator_wrapper_deterministic_per_seed():
    src1 = synthetic_depth_batches(0, 2, 8, steps=3)
    src2 = synthetic_depth_batches(0, 2, 8, steps=3)
    a = [b["image"] for b in augmented_batches(src1, seed=7)]
    b = [b["image"] for b in augmented_batches(src2, seed=7)]
    assert len(a) == 3
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_train_cli_augment_smoke(tmp_path):
    from burn_depth_tpu.cli.train import main as train_main

    rc = train_main([
        "--model", "depth-anything-3", "--preset", "tiny", "--steps", "1",
        "--batch", "1", "--log-every", "1", "--remat", "none",
        "--augment", "--aug-depth-scale", "0.2",
        "--out", str(tmp_path / "p.safetensors"),
    ])
    assert rc == 0
