"""Multi-view DA3 (S>1) — extension beyond the reference's S=1 surface.

The reference's backbone carries alternating-block config (`alt_block_start`,
SURVEY §2 #10) that is degenerate at S=1; here the S>1 schedule makes it
real: blocks past `alt_block_start` alternate cross-view ("global") and
view-local attention.  Two structural invariants pin the plumbing without an
upstream oracle:

1. S=1 degeneracy: `infer_multiview` with one view == `infer` exactly.
2. Duplicate-view invariance: with S identical views, softmax attention over
   the S-times-duplicated key set equals attention over one copy (each key's
   weight is split S ways but the weighted sum is unchanged) — so every
   view's output must equal the S=1 output, even through global blocks.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config
from burn_depth_tpu.vit.dinov2 import DinoViTConfig, _is_global_block, dinov2_forward, init_dinov2

TINY = dataclasses.replace(DepthAnything3Config.small(), image_size=28, attn_impl="jnp")


def test_global_block_schedule():
    cfg = DinoViTConfig.vits(28, 14, depth=8).da3_small_variant()  # alt_start=4
    assert [_is_global_block(cfg, i) for i in range(8)] == [
        False, False, False, False, True, False, True, False,
    ]
    mono = DinoViTConfig.vits(28, 14, depth=8)  # no alt blocks
    assert not any(_is_global_block(mono, i) for i in range(8))


def test_backbone_multiview_s1_degenerate():
    cfg = DinoViTConfig.vits(28, 14, depth=6).da3_small_variant()
    params = init_dinov2(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 28, 28))
    ref = dinov2_forward(params, x, cfg, hook_ids=[5], attn_impl="jnp")
    got = dinov2_forward(params, x, cfg, hook_ids=[5], attn_impl="jnp", views=1)
    np.testing.assert_array_equal(
        np.asarray(got.x_norm_patchtokens), np.asarray(ref.x_norm_patchtokens)
    )


def test_backbone_duplicate_view_invariance():
    cfg = DinoViTConfig.vits(28, 14, depth=6).da3_small_variant()
    params = init_dinov2(jax.random.PRNGKey(0), cfg)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28))
    ref = dinov2_forward(params, x1, cfg, hook_ids=[3, 5], attn_impl="jnp")
    x3 = jnp.concatenate([x1, x1, x1], axis=0)  # S=3 identical views
    got = dinov2_forward(params, x3, cfg, hook_ids=[3, 5], attn_impl="jnp", views=3)
    for view in range(3):
        np.testing.assert_allclose(
            np.asarray(got.x_norm_patchtokens[view]),
            np.asarray(ref.x_norm_patchtokens[0]),
            rtol=1e-5,
            atol=1e-6,
        )
        for h_got, h_ref in zip(got.hooks, ref.hooks):
            np.testing.assert_allclose(
                np.asarray(h_got.patches[view]), np.asarray(h_ref.patches[0]), rtol=1e-5, atol=1e-6
            )


def test_backbone_multiview_views_actually_interact():
    """With DIFFERENT views, a view's output must differ from its
    single-view output (the cross-view blocks really mix information)."""
    cfg = DinoViTConfig.vits(28, 14, depth=6).da3_small_variant()
    params = init_dinov2(jax.random.PRNGKey(0), cfg)
    xa = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28))
    xb = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    solo = dinov2_forward(params, xa, cfg, attn_impl="jnp").x_norm_patchtokens
    joint = dinov2_forward(
        params, jnp.concatenate([xa, xb]), cfg, attn_impl="jnp", views=2
    ).x_norm_patchtokens
    assert np.abs(np.asarray(joint[0]) - np.asarray(solo[0])).max() > 1e-7


def test_infer_multiview_model_api():
    model = DepthAnything3.init(jax.random.PRNGKey(0), TINY)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 28, 28)) * 0.4

    # S=1 degeneracy at the model level
    ref = model.infer(x1)
    got = model.infer_multiview(x1[:, None])
    np.testing.assert_array_equal(np.asarray(got.depth[:, 0]), np.asarray(ref.depth))

    # S=2: shapes carry the view axis end-to-end
    x2 = jnp.stack([x1, x1 * 0.9], axis=1)  # [B=2, S=2, 3, 28, 28]
    out = model.infer_multiview(x2)
    assert out.depth.shape == (2, 2, 28, 28)
    assert out.depth_confidence.shape == (2, 2, 28, 28)
    # camera decode carries its seq dim: per view [1, 3, 4] / [1, 3, 3]
    assert out.extrinsics.shape == (2, 2, 1, 3, 4)
    assert out.intrinsics.shape == (2, 2, 1, 3, 3)
    assert np.isfinite(np.asarray(out.depth)).all()


def test_multiview_batch_views_layout():
    """Views of one set must be CONTIGUOUS in the flattened batch: sets must
    not leak into each other."""
    cfg = DinoViTConfig.vits(28, 14, depth=6).da3_small_variant()
    params = init_dinov2(jax.random.PRNGKey(0), cfg)
    xa = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 28, 28))  # set A: S=2
    xb = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 28, 28))  # set B: S=2
    both = jnp.concatenate([xa, xb])  # [4] = A0 A1 B0 B1
    joint = dinov2_forward(params, both, cfg, attn_impl="jnp", views=2).x_norm_patchtokens
    solo_a = dinov2_forward(params, xa, cfg, attn_impl="jnp", views=2).x_norm_patchtokens
    np.testing.assert_allclose(np.asarray(joint[:2]), np.asarray(solo_a), rtol=1e-5, atol=1e-6)
