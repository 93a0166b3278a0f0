"""Depth Pro tests: split/merge geometry goldens (ported reference tests),
decoder torch-oracle parity, and end-to-end shape smoke on a tiny config."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig
from burn_depth_tpu.models.depth_pro.decoder import decoder_forward, init_decoder
from burn_depth_tpu.models.depth_pro.encoder import (
    feature_padding,
    merge,
    reshape_feature,
    split,
    split_geometry,
)

# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------


def test_split_geometry_matches_reference_shapes():
    # encoder.rs:190-232 at the production resolution
    assert split_geometry(1536, 384, 0.25) == (5, 288)
    assert split_geometry(768, 384, 0.5) == (3, 192)
    assert split_geometry(384, 384, 0.0) == (1, 384)
    # feature-space paddings at grid 24 (SURVEY.md §2 #6)
    assert feature_padding(384, 288, 24) == 3
    assert feature_padding(384, 192, 24) == 6


@pytest.mark.parametrize("batch", [1, 3])
def test_split_merge_roundtrip_without_overlap(batch):
    # Reference test encoder.rs:501-519: 16 patches, overlap 0, exact rebuild
    # (extended to B>1: the image-major stack must round-trip per image).
    size, patch = 64, 16
    x = np.arange(batch * 3 * size * size, dtype=np.float32).reshape(batch, 3, size, size)
    tiles, steps, stride = split(jnp.asarray(x), patch, 0.0)
    assert steps * steps == 16
    pad = feature_padding(patch, stride, patch)
    merged = np.asarray(merge(tiles, batch, pad))
    np.testing.assert_allclose(merged, x, atol=1e-6)


def test_batched_forward_matches_per_image(tiny_model):
    """Batched encoder/decoder forward must equal two stacked B=1 passes —
    pins the image-major tile-stack convention through the full model
    (the property DP batch sharding relies on)."""
    size = tiny_model.img_size
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 3, size, size)).astype(np.float32)
    )
    canon_b, fov_b = tiny_model.forward(x)
    canon_0, fov_0 = tiny_model.forward(x[:1])
    canon_1, fov_1 = tiny_model.forward(x[1:])
    np.testing.assert_allclose(
        np.asarray(canon_b), np.concatenate([canon_0, canon_1]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fov_b), np.concatenate([fov_0, fov_1]), rtol=1e-5, atol=1e-4
    )


@pytest.mark.parametrize("batch_size", [1, 2])
def test_merge_overlapping_layout_matches_expected(batch_size):
    # Reference test encoder.rs:521-586: 5x5 patches of 8², pad 1, constant
    # per-patch values; checks the exact seam layout.  Dim-0 order is
    # image-major (ours — DP-local; the reference cats tile-major), so the
    # B=2 case pins our convention while B=1 is the reference golden.
    channels, fs, steps, padding = 2, 8, 5, 1
    patch_count = batch_size * steps * steps
    patches = np.stack(
        [np.full((channels, fs, fs), float(i), np.float32) for i in range(patch_count)]
    )
    merged = np.asarray(merge(jnp.asarray(patches), batch_size, padding))
    out_h = merged.shape[2]
    expected = np.full_like(merged, -1.0)
    for b in range(batch_size):
        for j in range(steps):
            for i in range(steps):
                idx = b * steps * steps + (j * steps + i)
                top = 0 if j == 0 else padding
                bottom = fs - (0 if j == steps - 1 else padding)
                left = 0 if i == 0 else padding
                right = fs - (0 if i == steps - 1 else padding)
                base_y = j * (fs - 2 * padding) + (0 if j == 0 else padding)
                base_x = i * (fs - 2 * padding) + (0 if i == 0 else padding)
                expected[
                    b, :, base_y : base_y + bottom - top, base_x : base_x + right - left
                ] = float(idx)
    assert out_h == steps * (fs - 2 * padding) + 2 * padding
    np.testing.assert_allclose(merged, expected, atol=1e-6)


def test_reshape_feature_offsets():
    tokens = np.arange(2 * 5 * 3, dtype=np.float32).reshape(2, 5, 3)
    # cls offset 1: drop leading token
    out = np.asarray(reshape_feature(jnp.asarray(tokens), 2, 2, 1))
    assert out.shape == (2, 3, 2, 2)
    np.testing.assert_allclose(out[0, :, 0, 0], tokens[0, 1])


# ---------------------------------------------------------------------------
# decoder torch oracle
# ---------------------------------------------------------------------------


class TorchResidualBlock(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(c, c, 3, padding=1)
        self.conv2 = torch.nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        out = torch.relu(x)
        out = self.conv1(out)
        out = torch.relu(out)
        out = self.conv2(out)
        return out + x


class TorchFusion2d(torch.nn.Module):
    def __init__(self, c, deconv):
        super().__init__()
        self.resnet1 = TorchResidualBlock(c)
        self.resnet2 = TorchResidualBlock(c)
        self.deconv = torch.nn.ConvTranspose2d(c, c, 2, 2, bias=False) if deconv else None
        self.out_conv = torch.nn.Conv2d(c, c, 1)

    def forward(self, x0, x1=None):
        x = x0
        if x1 is not None:
            x = x + self.resnet1(x1)
        x = self.resnet2(x)
        if self.deconv is not None:
            x = self.deconv(x)
        return self.out_conv(x)


def test_decoder_matches_torch_oracle():
    dims = [8, 8, 12, 16, 16]
    dd = 8
    params = init_decoder(jax.random.PRNGKey(0), dims, dd)

    def t(a):
        return torch.from_numpy(np.asarray(a)).clone()

    fusions = []
    convs = []
    for level in range(5):
        c = params["convs"][level]
        if c is None:
            convs.append(None)
        else:
            k = c["weight"].shape[-1]
            m = torch.nn.Conv2d(dims[level], dd, k, padding=(k - 1) // 2, bias=False)
            with torch.no_grad():
                m.weight.copy_(t(c["weight"]))
            convs.append(m)
        f = TorchFusion2d(dd, deconv=level != 0)
        pf = params["fusions"][level]
        with torch.no_grad():
            for rn in ("resnet1", "resnet2"):
                getattr(f, rn).conv1.weight.copy_(t(pf[rn]["conv1"]["weight"]))
                getattr(f, rn).conv1.bias.copy_(t(pf[rn]["conv1"]["bias"]))
                getattr(f, rn).conv2.weight.copy_(t(pf[rn]["conv2"]["weight"]))
                getattr(f, rn).conv2.bias.copy_(t(pf[rn]["conv2"]["bias"]))
            if f.deconv is not None:
                f.deconv.weight.copy_(t(pf["deconv"]["weight"]))
            f.out_conv.weight.copy_(t(pf["out_conv"]["weight"]))
            f.out_conv.bias.copy_(t(pf["out_conv"]["bias"]))
        fusions.append(f)

    rng = np.random.default_rng(0)
    res = [32, 16, 8, 4, 2]
    encodings = [rng.standard_normal((1, dims[i], res[i], res[i])).astype(np.float32) for i in range(5)]

    ours_feats, ours_lowres, ours_fusion = decoder_forward(params, [jnp.asarray(e) for e in encodings])

    with torch.no_grad():
        feats = encodings[4] if convs[4] is None else convs[4](torch.from_numpy(encodings[4]))
        feats = feats if isinstance(feats, torch.Tensor) else torch.from_numpy(feats)
        lowres = feats.clone()
        feats = fusions[4](feats)
        outs = [feats]
        for level in range(3, -1, -1):
            e = torch.from_numpy(encodings[level])
            projected = e if convs[level] is None else convs[level](e)
            feats = fusions[level](feats, projected)
            outs.append(feats)
        outs.reverse()

    np.testing.assert_allclose(np.asarray(ours_feats), feats.numpy(), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_lowres), lowres.numpy(), atol=5e-5, rtol=1e-4)
    for a, b in zip(ours_fusion, outs):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=5e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# end-to-end smoke
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_model():
    cfg = DepthProConfig.tiny_test()
    cfg = __import__("dataclasses").replace(cfg, attn_impl="jnp")
    return DepthPro.init(jax.random.PRNGKey(0), cfg)


def test_depth_pro_infer_shapes(tiny_model):
    size = tiny_model.img_size  # 256 for tiny preset
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, size, size)).astype(np.float32))
    out = tiny_model.infer(x)
    assert out.depth.shape == (1, size, size)
    assert out.focallength_px.shape == (1,)
    assert out.fovx_deg.shape == (1,)
    assert np.isfinite(np.asarray(out.depth)).all()
    # depth is positive and clamped into [1e-4, 1e4] reciprocal range
    d = np.asarray(out.depth)
    assert (d >= 1e-4).all() and (d <= 1e4).all()


def test_depth_pro_infer_resizes_arbitrary_input(tiny_model):
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 3, 100, 140)).astype(np.float32))
    out = tiny_model.infer(x)
    assert out.depth.shape == (1, 100, 140)


def test_encoder_feature_pyramid_shapes(tiny_model):
    cfg = tiny_model.config
    size = tiny_model.img_size
    x = jnp.zeros((1, 3, size, size))
    features = tiny_model.encoder_features(x)
    g = cfg.patch_encoder.grid_size  # 4
    dims = cfg.encoder_feature_dims
    # [latent0@8g, latent1@4g, x0@2g_merged... ] per encoder.rs:423-434
    assert features[0].shape[1] == cfg.decoder_features
    assert features[1].shape[1] == dims[0]
    assert features[2].shape[1] == dims[1]
    assert features[3].shape[1] == dims[2]
    assert features[4].shape[1] == dims[3]
    # spatial ladder: [img/2, img/4, img/8, img/16, img/32] (encoder.rs:423-434)
    img = tiny_model.img_size
    assert [f.shape[-1] for f in features] == [img // 2, img // 4, img // 8, img // 16, img // 32]
    assert features[4].shape[-1] == 2 * g


def test_fovy_formula():
    from burn_depth_tpu.models.depth_pro.model import fovy_from_fovx_rad

    fovx = np.array([1.0], np.float32)
    expected = 2 * np.arctan(0.75 * np.tan(0.5))
    np.testing.assert_allclose(np.asarray(fovy_from_fovx_rad(jnp.asarray(fovx), 1080, 1440)), expected, atol=1e-6)


def test_depth_pro_without_fov_head():
    """use_fov_head=False: forward works, infer raises (focal math needs the
    FOV head — reference mod.rs:330)."""
    import dataclasses

    cfg = dataclasses.replace(DepthProConfig.tiny_test(), use_fov_head=False)
    model = DepthPro.init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 3, cfg.img_size, cfg.img_size))
    canonical, fov = model.forward(x)
    assert fov is None
    assert canonical.shape[0] == 1
    with pytest.raises(ValueError, match="FOV head required"):
        model.infer(x)


def test_verify_restored_metric_depth_stage():
    """Golden metric depth at a different size gets restore-resized and
    reported (not gated)."""
    import numpy as np

    from burn_depth_tpu.verify import run_depth_pro_parity

    model = DepthPro.init(jax.random.PRNGKey(0), DepthProConfig.tiny_test())
    size = model.img_size
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (1, 3, size, size)) * 0.3)
    out = model.infer(jnp.asarray(x))
    from burn_depth_tpu.cli.infer import resize_depth_field

    restored = resize_depth_field(np.asarray(out.depth[0], np.float32), 100, 150)[None]
    golden = {"network_input": x, "metric_depth": restored}
    report = run_depth_pro_parity(model, golden)
    names = {s.name for s in report.stages}
    assert "metric_depth(restored)" in names
    st = next(s for s in report.stages if s.name == "metric_depth(restored)")
    assert st.max_abs < 1e-5  # same restore path → near-exact


def test_nhwc_tail_matches_nchw():
    """to_nhwc_tail (serving layout: NHWC decoder + depth head) must be
    numerically identical to the NCHW checkpoint layout."""
    import dataclasses as _dc

    import jax
    import numpy as np

    from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

    cfg = DepthProConfig.tiny_test()
    model = DepthPro.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cfg.img_size, cfg.img_size)) * 0.4
    ref = model.infer(x)
    got = model.to_nhwc_tail().infer(x)
    np.testing.assert_allclose(
        np.asarray(got.depth), np.asarray(ref.depth), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.focallength_px), np.asarray(ref.focallength_px), rtol=1e-4
    )


def test_fused_head_matches_sequential():
    """``fuse_depth_head`` (deconv→conv1 fused into a phase-packed 3x3 conv +
    grouped 1x1) must reproduce the sequential head exactly, including the
    1-pixel border where the deconv bias loses out-of-bounds conv1 taps.
    Small odd spatial dims + nonzero conv_out/deconv biases stress every
    edge/corner correction."""
    import numpy as np

    from burn_depth_tpu.models.depth_pro.model import (
        _depth_head_forward,
        _init_depth_head,
        fuse_depth_head,
    )

    rng = jax.random.PRNGKey(3)
    head = _init_depth_head(rng, 64)
    # exercise the conv_out bias path (init zeroes it, reference mod.rs:92-95)
    head["conv_out"]["bias"] = jnp.full_like(head["conv_out"]["bias"], 0.37)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 64, 7, 9)) * 0.5

    ref = _depth_head_forward(head, x)
    got = _depth_head_forward(fuse_depth_head(head), x)
    assert got.shape == ref.shape == (2, 1, 14, 18)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fuse_tail_matches_base():
    """``fuse_tail`` (fused head + decoder out_conv folded into deconvs) is a
    numerics-preserving serving transform end-to-end."""
    import numpy as np

    cfg = DepthProConfig.tiny_test()
    model = DepthPro.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cfg.img_size, cfg.img_size)) * 0.4

    ref = model.infer(x)
    fused = model.fuse_tail()
    assert "fused" in fused.params["head"]
    assert fused.params["decoder"]["fusions"][1]["out_conv"] is None
    assert fused.params["decoder"]["fusions"][0]["out_conv"] is not None  # level 0: no deconv
    got = fused.infer(x)
    np.testing.assert_allclose(
        np.asarray(got.depth), np.asarray(ref.depth), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.focallength_px), np.asarray(ref.focallength_px), rtol=1e-4
    )


def test_stack_dual_encoders_matches_unstacked():
    """``stack_dual_encoders`` (serving transform: image+fov ViT passes fused
    into one weight-stacked pass) must be numerics-preserving — the stacked
    batched dot contracts per-model exactly like the two separate passes."""
    import numpy as np

    cfg = DepthProConfig.tiny_test()
    model = DepthPro.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cfg.img_size, cfg.img_size)) * 0.4

    ref = model.infer(x)
    stacked = model.stack_dual_encoders()
    assert "image_encoder" not in stacked.params["encoder"]
    assert stacked.params["fov"]["encoder"] is None
    got = stacked.infer(x)

    np.testing.assert_allclose(
        np.asarray(got.depth), np.asarray(ref.depth), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.fovx_deg), np.asarray(ref.fovx_deg), rtol=2e-5, atol=2e-5
    )


def test_stack_dual_encoders_composes_with_int8():
    """Transform order quantize → stack: the stacked tree carries int8 leaves
    and still matches the unstacked int8 model."""
    import numpy as np

    cfg = DepthProConfig.tiny_test()
    model = DepthPro.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cfg.img_size, cfg.img_size)) * 0.4

    q = model.quantize_vit()
    ref = q.infer(x)
    got = q.stack_dual_encoders().infer(x)
    np.testing.assert_allclose(
        np.asarray(got.depth), np.asarray(ref.depth), rtol=1e-4, atol=1e-5
    )


def test_nhwc_pallas_conv_route_matches(monkeypatch):
    """BDT_CONV3_PALLAS=1 + NHWC tail: decoder/head 3x3 convs through the
    Pallas kernel (interpret mode on CPU) must match the XLA route."""
    import functools
    import os

    from jax.experimental import pallas as pl

    import burn_depth_tpu.ops.conv3x3_pallas as m

    cfg = DepthProConfig.tiny_test()
    model = DepthPro.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cfg.img_size, cfg.img_size)) * 0.4
    ref = model.to_nhwc_tail().infer(x)

    monkeypatch.setitem(os.environ, "BDT_CONV3_PALLAS", "1")
    monkeypatch.setattr(m.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    got = model.to_nhwc_tail().infer(x)
    np.testing.assert_allclose(
        np.asarray(got.depth), np.asarray(ref.depth), rtol=2e-5, atol=2e-6
    )

    # selective mode: Pallas only for the head's conv0, decoder + conv1 XLA
    monkeypatch.setitem(os.environ, "BDT_CONV3_PALLAS", "head0")
    got0 = model.to_nhwc_tail().infer(x)
    np.testing.assert_allclose(
        np.asarray(got0.depth), np.asarray(ref.depth), rtol=2e-5, atol=2e-6
    )

    # Winograd route (decoder residual blocks + head conv0); MIN=2 so the
    # tiny-config shapes actually route (default gate is >= 384)
    monkeypatch.setitem(os.environ, "BDT_CONV3_PALLAS", "0")
    monkeypatch.setitem(os.environ, "BDT_CONV3_WINO", "1")
    monkeypatch.setitem(os.environ, "BDT_CONV3_WINO_MIN", "2")
    import burn_depth_tpu.ops.winograd3x3_pallas as wm

    monkeypatch.setattr(wm.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))
    gotw = model.to_nhwc_tail().infer(x)
    np.testing.assert_allclose(
        np.asarray(gotw.depth), np.asarray(ref.depth), rtol=1e-4, atol=1e-5
    )

    # C-blocked accumulation route (BDT_CONV3_WINO_CBLK + explicit tile):
    # same numerics through the f32-accumulating revisited-output path
    monkeypatch.setitem(os.environ, "BDT_CONV3_WINO_TILE", "4x8")
    monkeypatch.setitem(os.environ, "BDT_CONV3_WINO_CBLK", "8")
    gotc = model.to_nhwc_tail().infer(x)
    np.testing.assert_allclose(
        np.asarray(gotc.depth), np.asarray(ref.depth), rtol=1e-4, atol=1e-5
    )


def test_tile_chunked_encoder_matches_batched(tiny_model):
    """``tile_chunks`` (the training form: scan over rematerialized tile
    chunks) must be numerically identical to the single batched 35-tile pass
    — forward AND gradients (the scan body is jax.checkpoint-wrapped, so the
    backward recomputes each chunk)."""
    import dataclasses

    cfg5 = dataclasses.replace(tiny_model.config, tile_chunks=5)
    chunked = DepthPro(cfg5, tiny_model.params)

    size = tiny_model.img_size
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, size, size)) * 0.3
    ref = tiny_model.infer(x)
    got = chunked.infer(x)
    np.testing.assert_allclose(np.asarray(got.depth), np.asarray(ref.depth), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.focallength_px), np.asarray(ref.focallength_px), rtol=1e-5
    )

    # gradient equality through the scanned/rematerialized pass
    def loss(model):
        def fn(p):
            canonical, *_ = model._forward_internal(p, x)
            return jnp.mean(canonical.astype(jnp.float32) ** 2)

        return fn

    g_ref = jax.grad(loss(tiny_model))(tiny_model.params)
    g_got = jax.grad(loss(chunked))(tiny_model.params)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_got = jax.tree_util.tree_leaves(g_got)
    assert len(flat_ref) == len(flat_got)
    for a, b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-6)
