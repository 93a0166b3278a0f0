"""Full-model Depth Pro parity vs the HuggingFace implementation.

``transformers``' DepthPro is an independent, validated port of
apple/ml-depth-pro — the same upstream the reference's correctness gate
replays (``/root/reference/tool/correctness_depth_pro.py``,
``example/correctness.rs:887-904``).  Running both frameworks at the real
flagship *geometry* (image 1536, window 384, grid 24, hooks [5, 11], 35-tile
split, merge pads 3/6) with a thin transformer exercises every structural
code path — split/merge seams, hook offsets, upsample stacks, 5-level fusion,
FOV tower — against independent code, with shared random weights.

This addresses two round-1 gaps at once: no cross-implementation parity
evidence, and flagship-geometry paths never executing off-TPU.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hf_depth_pro_oracle import build_hf_oracle, hf_to_params, ours_config  # noqa: E402


@pytest.fixture(scope="module")
def oracle_pair():
    hf, _dims = build_hf_oracle(embed_dim=32, depth=12, heads=2, fusion=32)
    cfg = ours_config(embed_dim=32, depth=12, heads=2, fusion=32)
    # route through io.importers' HF remap path so these oracle tests also
    # pin the production import table (hf_depth_pro_remap_rules + qkv merge)
    params = hf_to_params(hf, vit_depth=12, config=cfg)
    return hf, cfg, params


def test_depth_pro_full_model_vs_hf_flagship_geometry(oracle_pair):
    from burn_depth_tpu.models.depth_pro import DepthPro

    hf, cfg, params = oracle_pair
    model = DepthPro(cfg, params)
    assert cfg.img_size == 1536

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 1536, 1536), dtype=np.float32) * 0.5

    with torch.no_grad():
        hf_out = hf(pixel_values=torch.from_numpy(x))
    hf_depth = hf_out.predicted_depth.numpy()  # canonical inverse depth [B, H, W]
    hf_fov = hf_out.field_of_view.numpy()  # fovx degrees [B]

    canonical, fov_deg = model.forward(jnp.asarray(x))
    ours_depth = np.asarray(canonical)[:, 0]
    ours_fov = np.asarray(fov_deg)

    # reference Depth Pro gate: mean_abs <= 1e-3, max_abs <= 5e-3
    # (correctness.rs:887-897); the signal range here is O(1).
    d = np.abs(ours_depth - hf_depth)
    assert d.mean() <= 1e-3, f"canonical inverse depth mean_abs {d.mean():.2e}"
    assert d.max() <= 5e-3, f"canonical inverse depth max_abs {d.max():.2e}"
    # FOV gate: <= 1e-3 deg (correctness.rs:890-897)
    assert np.abs(ours_fov - hf_fov).max() <= 1e-3, (ours_fov, hf_fov)


def test_depth_pro_encoder_features_vs_hf(oracle_pair):
    """Per-feature parity (the reference checks every encoder feature with the
    same thresholds, ``correctness.rs:875``).  HF neck output order is
    low-res-first and already fusion-projected; compare pre-projection
    features by replaying HF's neck boundary = our encoder output."""
    from burn_depth_tpu.models.depth_pro import DepthPro

    hf, cfg, params = oracle_pair
    model = DepthPro(cfg, params)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 1536, 1536), dtype=np.float32) * 0.5

    with torch.no_grad():
        encodings = hf.depth_pro.encoder(torch.from_numpy(x), return_dict=True)
        hf_feats = hf.depth_pro.neck(list(encodings.features))
    # HF neck output: [global(48²), scaled1(96²), scaled2(192²), hook11(384²), hook5(768²)]
    hf_feats = [f.numpy() for f in hf_feats]

    features = model.encoder_features(jnp.asarray(x))
    # ours: [hook5(768²), hook11(384²), x0(192²), x1(96²), global(48²)] pre-projection;
    # apply our decoder projection convs to land on HF's neck output boundary.
    proj_params = model.params["decoder"]["convs"]

    def project(level, f):
        conv = proj_params[level]
        if conv is None:
            return f
        from burn_depth_tpu.ops.conv import conv2d

        pad = (conv["weight"].shape[-1] - 1) // 2
        return conv2d(f, conv["weight"], None, padding=pad)

    ours_projected = [np.asarray(project(i, f)) for i, f in enumerate(features)]
    pairs = list(zip(ours_projected, hf_feats[::-1]))  # reverse HF to high-res-first
    for i, (ours_f, hf_f) in enumerate(pairs):
        assert ours_f.shape == hf_f.shape, (i, ours_f.shape, hf_f.shape)
        d = np.abs(ours_f - hf_f)
        assert d.mean() <= 1e-3, f"feature {i} mean_abs {d.mean():.2e}"
        assert d.max() <= 5e-3, f"feature {i} max_abs {d.max():.2e}"


def test_depth_pro_int8_tier_drift_vs_hf(oracle_pair):
    """Quantify the SERVING_INT8 relaxed-parity tier at flagship geometry:
    the int8 model (calibrated static scales, all three encoders quantized)
    must stay within an order of magnitude of the float gate vs the torch
    oracle.

    Caveat (measured): with RANDOM weights the DINOv2 layerscale gammas are
    at their ~1e-5 init, which suppresses every block's contribution and with
    it the visible int8 drift (~6e-6 here).  Real-checkpoint gammas are O(1),
    so this test is a structural/regression gate, not a drift bound — the
    realistic tier drift must be measured against real weights (PARITY.md
    known-gaps)."""
    from burn_depth_tpu.models.depth_pro import DepthPro

    hf, cfg, params = oracle_pair
    model = DepthPro(cfg, params)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 1536, 1536), dtype=np.float32) * 0.5

    with torch.no_grad():
        hf_out = hf(pixel_values=torch.from_numpy(x))
    hf_depth = hf_out.predicted_depth.numpy()

    qmodel = model.quantize_vit(calibration_input=jnp.asarray(x))
    canonical, _ = qmodel.forward(jnp.asarray(x))
    ours_depth = np.asarray(canonical)[:, 0]

    d = np.abs(ours_depth - hf_depth)
    # relaxed tier: 10x the float gate (float: mean<=1e-3, max<=5e-3)
    assert d.mean() <= 1e-2, f"int8 canonical depth mean_abs {d.mean():.2e}"
    assert d.max() <= 5e-2, f"int8 canonical depth max_abs {d.max():.2e}"
    print(f"int8 tier drift vs torch oracle: mean_abs={d.mean():.2e} max_abs={d.max():.2e}")
