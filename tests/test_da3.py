"""DA3 parity + shape tests.

* mono DPT head vs an in-test torch oracle (reference semantics from
  ``dpt.rs``), shared random weights, hard tolerance — the reference's
  golden-dump strategy made self-contained,
* camera geometry roundtrips,
* end-to-end shape smoke for both config variants (the reference's
  ``depth_anything3_emits_depth_tensor`` test, ``mod.rs:634-641``, shrunk).
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config
from burn_depth_tpu.models.da3.dpt import (
    DepthAnything3HeadConfig,
    init_head,
    mono_head_forward_raw,
)

# ---------------------------------------------------------------------------
# torch oracle for the mono DPT head (pos_embed=False so the oracle does not
# need the sincos table; the pos-embed path has its own golden test).
# ---------------------------------------------------------------------------

HCFG = DepthAnything3HeadConfig(
    dim_in=32,
    features=16,
    out_channels=(8, 12, 16, 16),
    output_dim=1,
    activation="exp",
    pos_embed=False,
)


class TorchRCU(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(c, c, 3, padding=1)
        self.conv2 = torch.nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        y = self.conv1(torch.relu(x))
        y = self.conv2(torch.relu(y))
        return y + x


class TorchFusion(torch.nn.Module):
    def __init__(self, c, has_residual):
        super().__init__()
        self.residual1 = TorchRCU(c) if has_residual else None
        self.residual2 = TorchRCU(c)
        self.out_conv = torch.nn.Conv2d(c, c, 1)

    def forward(self, top, lateral=None, size=None):
        y = top
        if self.residual1 is not None and lateral is not None:
            y = y + self.residual1(lateral)
        y = self.residual2(y)
        target = size if size is not None else (y.shape[-2] * 2, y.shape[-1] * 2)
        y = torch.nn.functional.interpolate(y, size=target, mode="bilinear", align_corners=True)
        return self.out_conv(y)


class TorchMonoHead(torch.nn.Module):
    def __init__(self, cfg):
        super().__init__()
        oc = cfg.out_channels
        f = cfg.features
        self.cfg = cfg
        self.projects = torch.nn.ModuleList([torch.nn.Conv2d(cfg.dim_in, c, 1) for c in oc])
        self.resize0 = torch.nn.ConvTranspose2d(oc[0], oc[0], 4, 4)
        self.resize1 = torch.nn.ConvTranspose2d(oc[1], oc[1], 2, 2)
        self.resize3 = torch.nn.Conv2d(oc[3], oc[3], 3, stride=2, padding=1)
        self.rn = torch.nn.ModuleList([torch.nn.Conv2d(c, f, 3, padding=1, bias=False) for c in oc])
        self.refinenet1 = TorchFusion(f, True)
        self.refinenet2 = TorchFusion(f, True)
        self.refinenet3 = TorchFusion(f, True)
        self.refinenet4 = TorchFusion(f, False)
        self.output_conv1 = torch.nn.Conv2d(f, f // 2, 3, padding=1)
        self.oc2_conv1 = torch.nn.Conv2d(f // 2, 32, 3, padding=1)
        self.oc2_conv2 = torch.nn.Conv2d(32, cfg.output_dim, 1)

    def forward(self, hooks, height, width, patch_size):
        ph, pw = height // patch_size, width // patch_size
        feats = []
        for stage, tokens in enumerate(hooks):
            var, mean = torch.var_mean(tokens, dim=2, unbiased=False, keepdim=True)
            t = (tokens - mean) / (var + 1e-5).sqrt()
            b, n, c = t.shape
            x = t.permute(0, 2, 1).reshape(b, c, ph, pw)
            x = self.projects[stage](x)
            x = [self.resize0, self.resize1, lambda v: v, self.resize3][stage](x)
            feats.append(x)
        l1, l2, l3, l4 = [self.rn[i](feats[i]) for i in range(4)]
        out = self.refinenet4(l4, None, (l3.shape[-2], l3.shape[-1]))
        out = self.refinenet3(out, l3, (l2.shape[-2], l2.shape[-1]))
        out = self.refinenet2(out, l2, (l1.shape[-2], l1.shape[-1]))
        out = self.refinenet1(out, l1, None)
        out = self.output_conv1(out)
        out = torch.nn.functional.interpolate(out, size=(height, width), mode="bilinear", align_corners=True)
        out = self.oc2_conv2(torch.relu(self.oc2_conv1(out)))
        return out.exp()


def _load_torch_from_params(tm: TorchMonoHead, params):
    def t(a):
        return torch.from_numpy(np.asarray(a)).clone()

    with torch.no_grad():
        for i in range(4):
            tm.projects[i].weight.copy_(t(params["projects"][i]["weight"]))
            tm.projects[i].bias.copy_(t(params["projects"][i]["bias"]))
            tm.rn[i].weight.copy_(t(params["scratch"][f"layer{i + 1}_rn"]["weight"]))
        tm.resize0.weight.copy_(t(params["resize_layers"][0]["weight"]))
        tm.resize0.bias.copy_(t(params["resize_layers"][0]["bias"]))
        tm.resize1.weight.copy_(t(params["resize_layers"][1]["weight"]))
        tm.resize1.bias.copy_(t(params["resize_layers"][1]["bias"]))
        tm.resize3.weight.copy_(t(params["resize_layers"][3]["weight"]))
        tm.resize3.bias.copy_(t(params["resize_layers"][3]["bias"]))
        for name in ("refinenet1", "refinenet2", "refinenet3", "refinenet4"):
            tf = getattr(tm, name)
            pf = params["scratch"][name]
            if pf["residual1"] is not None:
                tf.residual1.conv1.weight.copy_(t(pf["residual1"]["conv1"]["weight"]))
                tf.residual1.conv1.bias.copy_(t(pf["residual1"]["conv1"]["bias"]))
                tf.residual1.conv2.weight.copy_(t(pf["residual1"]["conv2"]["weight"]))
                tf.residual1.conv2.bias.copy_(t(pf["residual1"]["conv2"]["bias"]))
            tf.residual2.conv1.weight.copy_(t(pf["residual2"]["conv1"]["weight"]))
            tf.residual2.conv1.bias.copy_(t(pf["residual2"]["conv1"]["bias"]))
            tf.residual2.conv2.weight.copy_(t(pf["residual2"]["conv2"]["weight"]))
            tf.residual2.conv2.bias.copy_(t(pf["residual2"]["conv2"]["bias"]))
            tf.out_conv.weight.copy_(t(pf["out_conv"]["weight"]))
            tf.out_conv.bias.copy_(t(pf["out_conv"]["bias"]))
        tm.output_conv1.weight.copy_(t(params["scratch"]["output_conv1"]["weight"]))
        tm.output_conv1.bias.copy_(t(params["scratch"]["output_conv1"]["bias"]))
        tm.oc2_conv1.weight.copy_(t(params["scratch"]["output_conv2"]["conv1"]["weight"]))
        tm.oc2_conv1.bias.copy_(t(params["scratch"]["output_conv2"]["conv1"]["bias"]))
        tm.oc2_conv2.weight.copy_(t(params["scratch"]["output_conv2"]["conv2"]["weight"]))
        tm.oc2_conv2.bias.copy_(t(params["scratch"]["output_conv2"]["conv2"]["bias"]))


def test_mono_dpt_head_matches_torch_oracle():
    params = init_head(jax.random.PRNGKey(0), HCFG)
    height = width = 8
    patch = 2
    rng = np.random.default_rng(1)
    hooks = [rng.standard_normal((2, 16, HCFG.dim_in)).astype(np.float32) * 0.5 for _ in range(4)]

    ours = np.asarray(
        mono_head_forward_raw(params, [jnp.asarray(h) for h in hooks], HCFG, height, width, 0, patch)
    )
    tm = TorchMonoHead(HCFG)
    _load_torch_from_params(tm, params)
    with torch.no_grad():
        theirs = tm([torch.from_numpy(h) for h in hooks], height, width, patch).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-5, rtol=1e-4)


def test_mono_head_patch_start_slices_prefix():
    params = init_head(jax.random.PRNGKey(0), HCFG)
    rng = np.random.default_rng(2)
    patches = [rng.standard_normal((1, 16, HCFG.dim_in)).astype(np.float32) for _ in range(4)]
    with_prefix = [
        np.concatenate([rng.standard_normal((1, 1, HCFG.dim_in)).astype(np.float32), p], axis=1)
        for p in patches
    ]
    a = mono_head_forward_raw(params, [jnp.asarray(p) for p in patches], HCFG, 8, 8, 0, 2)
    b = mono_head_forward_raw(params, [jnp.asarray(p) for p in with_prefix], HCFG, 8, 8, 1, 2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# ---------------------------------------------------------------------------
# camera geometry
# ---------------------------------------------------------------------------


def test_quaternion_matrix_roundtrip():
    from burn_depth_tpu.models.da3.camera import matrix_to_quaternion, quaternion_to_matrix

    rng = np.random.default_rng(3)
    q = rng.standard_normal((32, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    rot = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    # valid rotations: orthonormal, det 1
    np.testing.assert_allclose(
        rot @ rot.transpose(0, 2, 1), np.broadcast_to(np.eye(3), rot.shape), atol=1e-5
    )
    q_back = np.asarray(matrix_to_quaternion(jnp.asarray(rot)))
    # quaternion double cover: q and -q encode the same rotation
    sign = np.sign(np.sum(q_back * q, axis=1, keepdims=True))
    np.testing.assert_allclose(q_back * sign, q, atol=1e-4)


def test_pose_encoding_roundtrip():
    from burn_depth_tpu.models.da3.camera import (
        extri_intri_to_pose_encoding,
        pose_encoding_to_extri_intri,
    )

    rng = np.random.default_rng(4)
    q = rng.standard_normal((2, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    pose = np.concatenate(
        [
            rng.standard_normal((2, 3)).astype(np.float32),
            q,
            rng.uniform(0.4, 1.2, (2, 2)).astype(np.float32),
        ],
        axis=1,
    ).reshape(1, 2, 9)
    extr, intr = pose_encoding_to_extri_intri(jnp.asarray(pose), 518, 518)
    assert extr.shape == (1, 2, 3, 4) and intr.shape == (1, 2, 3, 3)
    back = np.asarray(extri_intri_to_pose_encoding(extr, intr, 518, 518))
    sign = np.sign(np.sum(back[..., 3:7] * pose[..., 3:7], axis=-1, keepdims=True))
    fixed = np.concatenate([back[..., :3], back[..., 3:7] * sign, back[..., 7:]], axis=-1)
    np.testing.assert_allclose(fixed, pose, atol=1e-3)


# ---------------------------------------------------------------------------
# end-to-end shape smoke (tiny image, real block counts)
# ---------------------------------------------------------------------------


def _tiny(config: DepthAnything3Config) -> DepthAnything3Config:
    return dataclasses.replace(config, image_size=28, attn_impl="jnp")


def test_da3_small_emits_all_outputs():
    cfg = _tiny(DepthAnything3Config.small())
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    out = model.infer(jnp.zeros((1, 3, 28, 28)))
    assert out.depth.shape == (1, 28, 28)
    assert out.depth_confidence.shape == (1, 28, 28)
    # aux branch has no final resize (build_aux_logits, dpt.rs:356-441):
    # it stays at the refinenet1 output resolution = 8·(H/patch).
    assert out.aux.shape == (1, 6, 16, 16)
    assert out.aux_confidence.shape == (1, 16, 16)
    assert out.pose_encoding.shape == (1, 1, 9)
    assert out.extrinsics.shape == (1, 1, 3, 4)
    assert out.intrinsics.shape == (1, 1, 3, 3)
    assert np.isfinite(np.asarray(out.depth)).all()


def test_da3_metric_large_emits_depth():
    cfg = _tiny(DepthAnything3Config.metric_large())
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    out = model.infer(jnp.zeros((1, 3, 28, 28)))
    assert out.depth.shape == (1, 28, 28)
    assert out.depth_confidence is None
    assert out.pose_encoding is None
    assert np.isfinite(np.asarray(out.depth)).all()


def test_da3_rejects_non_divisible_input():
    cfg = _tiny(DepthAnything3Config.metric_large())
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="divisible"):
        model.infer(jnp.zeros((1, 3, 30, 30)))


def test_da3_infer_from_tokens_matches_full_pass():
    """The reference's parity-bisection idiom (da3_small_correctness.rs:279-326):
    head-only replay from traced tokens must equal the full pass."""
    cfg = _tiny(DepthAnything3Config.metric_large())
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((1, 3, 28, 28)).astype(np.float32))
    full, trace = model.infer_with_trace(x)
    replay = model.infer_from_tokens(trace.backbone_tokens, 28, 28)
    np.testing.assert_allclose(np.asarray(full.depth), np.asarray(replay.depth), atol=1e-6)


def test_cached_da3_wrapper_matches_and_reuses():
    """CachedDepthAnything3: same outputs as the plain model, one cache entry
    per input shape (reference mod.rs:652-686 invariants)."""
    from burn_depth_tpu.models.da3.model import CachedDepthAnything3

    cfg = _tiny(DepthAnything3Config.metric_large())
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    cached = CachedDepthAnything3(model)
    x = jnp.zeros((1, 3, 28, 28))
    a = cached.infer(x)
    b = model.infer_with_cache(x)
    # jitted (cached) vs eager differ only by float reassociation
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth), rtol=1e-6)
    cached.infer(x)
    assert cached.cache_len() == 1  # same shape reuses the compiled entry
    cached.infer(jnp.zeros((1, 3, 14, 14)))
    assert cached.cache_len() == 2


def test_infer_with_camera_conditions_backbone():
    """Camera-context path (mod.rs:522-527): a camera token from the encoder
    replaces the learned placeholder, changing every downstream output."""
    cfg = _tiny(DepthAnything3Config.small())
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28)) * 0.5

    extr = jnp.broadcast_to(jnp.eye(3, 4), (1, 1, 3, 4))
    intr = jnp.asarray([[[[20.0, 0.0, 14.0], [0.0, 20.0, 14.0], [0.0, 0.0, 1.0]]]])

    base = model.infer(x)
    cond = model.infer_with_camera(x, extr, intr)
    assert cond.depth.shape == base.depth.shape
    assert np.isfinite(np.asarray(cond.depth)).all()
    # conditioning must actually flow: the encoder token replaces the learned
    # placeholder, so the camera slot at the hooks changes.  (Depth itself
    # barely moves at random init — LayerScale starts at 1e-5, which damps
    # cross-token influence to ~1e-6; asserting on depth would be flaky.)
    head_out, camera_pred, hooks_cond = model._forward_internal(model.params, x, extr, intr)
    _, _, hooks_base = model._forward_internal(model.params, x, None, None)
    cam_diff = np.abs(np.asarray(hooks_cond[-1].camera) - np.asarray(hooks_base[-1].camera)).max()
    assert cam_diff > 1e-2, cam_diff
    assert cond.pose_encoding is not None and cond.pose_encoding.shape == (1, 1, 9)
    # metric-large has no camera encoder: context is ignored gracefully
    cfg_l = _tiny(DepthAnything3Config.metric_large())
    model_l = DepthAnything3.init(jax.random.PRNGKey(0), cfg_l)
    out_l = model_l.infer_with_camera(x, extr, intr)
    np.testing.assert_array_equal(np.asarray(out_l.depth), np.asarray(model_l.infer(x).depth))
