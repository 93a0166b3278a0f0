"""Conv / convT / norm / linear / activation parity against PyTorch CPU.

This is the self-contained analog of the reference's golden-dump strategy
(SURVEY.md §4): torch is the oracle, random weights, hard tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from burn_depth_tpu.ops.activations import gelu, head_activation
from burn_depth_tpu.ops.conv import conv2d, conv_transpose2d
from burn_depth_tpu.ops.linear import linear
from burn_depth_tpu.ops.norm import layer_norm, layer_norm_2d, token_norm


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad",
    [
        (3, 8, 3, 1, 1),  # standard 3x3
        (8, 4, 1, 1, 0),  # 1x1 projection
        (4, 2, 3, 2, 1),  # strided (DA3 resize_layers[3], fov downsample)
        (4, 1, 6, 1, 0),  # fov head final 6x6 valid conv
        (3, 16, 14, 14, 0),  # ViT-S/14 patch embed
    ],
)
def test_conv2d_matches_torch(cin, cout, k, stride, pad):
    x = _rand(2, cin, 20, 20, seed=1)
    w = _rand(cout, cin, k, k, seed=2) * 0.1
    b = _rand(cout, seed=3)
    ours = np.asarray(conv2d(x, w, b, stride=stride, padding=pad))
    theirs = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), stride=stride, padding=pad
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "cin,cout,k,stride",
    [
        (8, 4, 2, 2),  # the ubiquitous 2x2 s2 deconv
        (6, 6, 4, 4),  # DA3 resize_layers[0] 4x4 s4
        (5, 3, 3, 2),  # overlap case (not used by models, must still be exact)
    ],
)
def test_conv_transpose2d_matches_torch(cin, cout, k, stride):
    x = _rand(2, cin, 9, 9, seed=4)
    w = _rand(cin, cout, k, k, seed=5) * 0.1
    b = _rand(cout, seed=6)
    ours = np.asarray(conv_transpose2d(x, w, b, stride=stride))
    theirs = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), stride=stride
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_layer_norm_matches_torch():
    x = _rand(4, 17, 64, seed=7)
    w = _rand(64, seed=8)
    b = _rand(64, seed=9)
    ours = np.asarray(layer_norm(x, w, b, eps=1e-6))
    theirs = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (64,), torch.from_numpy(w), torch.from_numpy(b), eps=1e-6
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_token_norm_matches_reference_formula():
    # dpt.rs:764-771 — biased var, eps inside sqrt, no affine.
    x = _rand(2, 10, 32, seed=10)
    ours = np.asarray(token_norm(x))
    xt = torch.from_numpy(x)
    var, mean = torch.var_mean(xt, dim=2, unbiased=False, keepdim=True)
    theirs = ((xt - mean) / (var + 1e-5).sqrt()).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_layer_norm_2d_matches_torch_permute():
    x = _rand(2, 12, 5, 7, seed=11)
    w = _rand(12, seed=12)
    b = _rand(12, seed=13)
    ours = np.asarray(layer_norm_2d(x, w, b))
    xt = torch.from_numpy(x).permute(0, 2, 3, 1)
    theirs = (
        torch.nn.functional.layer_norm(xt, (12,), torch.from_numpy(w), torch.from_numpy(b))
        .permute(0, 3, 1, 2)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_linear_matches_torch():
    x = _rand(3, 11, 24, seed=14)
    w = _rand(16, 24, seed=15)
    b = _rand(16, seed=16)
    ours = np.asarray(linear(x, w, b))
    theirs = torch.nn.functional.linear(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_gelu_is_exact_erf_gelu():
    x = _rand(1000, seed=17)
    ours = np.asarray(gelu(x))
    theirs = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_head_activations():
    x = _rand(50, seed=18)
    xt = torch.from_numpy(x)
    cases = {
        "linear": xt,
        "exp": xt.exp(),
        "exp_p1": xt.exp() + 1,
        "exp_m1": xt.exp() - 1,
        "relu": xt.relu(),
        "sigmoid": xt.sigmoid(),
        "softplus": (xt.exp() + 1).log(),
        "tanh": xt.tanh(),
    }
    for kind, expected in cases.items():
        np.testing.assert_allclose(
            np.asarray(head_activation(x, kind)), expected.numpy(), atol=1e-5, rtol=1e-5, err_msg=kind
        )


def test_preprocessing_matches_reference_constants():
    # Reference inference.rs:146-173 golden normalization values.
    from burn_depth_tpu.api import rgb_to_input_tensor

    rgb = bytes([0, 255, 128, 255, 0, 128])
    out = np.asarray(rgb_to_input_tensor(rgb, 1, 2))
    assert out.shape == (1, 3, 2, 1)
    expected = [-2.1179039, 2.2489083, 2.4285715, -2.0357141, 0.42649257, 0.42649257]
    np.testing.assert_allclose(out.ravel(), expected, atol=1e-5)


def test_preprocessing_rejects_bad_length():
    from burn_depth_tpu.api import rgb_to_input_tensor

    with pytest.raises(ValueError):
        rgb_to_input_tensor(bytes(5), 1, 2)


def test_convt_matmul_path_matches_dilated():
    """BDT_CONVT_MM=1 routes k==stride transposed convs through matmul +
    depth-to-space — must match the fractionally-strided conv exactly."""
    import jax

    from burn_depth_tpu.ops.conv import _conv_transpose2d_matmul

    rng = jax.random.PRNGKey(0)
    for (k, s), (c, o) in [((2, 2), (16, 24)), ((4, 4), (8, 8))]:
        kx, kw, kb = jax.random.split(jax.random.fold_in(rng, k * 10 + c), 3)
        x = jax.random.normal(kx, (2, c, 6, 5))
        w = jax.random.normal(kw, (c, o, k, k)) * 0.1
        b = jax.random.normal(kb, (o,))
        ref = conv_transpose2d(x, w, b, stride=s)
        got = _conv_transpose2d_matmul(x, w, b, s, s)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_gelu_serving_forms_close_to_erf(monkeypatch):
    """BDT_GELU serving forms stay within their documented error budgets."""
    import os

    from burn_depth_tpu.ops.activations import gelu

    x = jnp.linspace(-6, 6, 4001, dtype=jnp.float32)
    ref = np.asarray(gelu(x))
    monkeypatch.setitem(os.environ, "BDT_GELU", "tanh")
    tanh_err = np.abs(np.asarray(gelu(x)) - ref).max()
    monkeypatch.setitem(os.environ, "BDT_GELU", "sigmoid")
    sig_err = np.abs(np.asarray(gelu(x)) - ref).max()
    assert tanh_err < 3e-3, tanh_err
    assert sig_err < 2.5e-2, sig_err


def test_layer_norm_mixed_close_to_f32(monkeypatch):
    """BDT_LN=mixed (f32 reductions, bf16 normalize passes) ~1e-2 of the
    f32 island on bf16 inputs; exact fallback on f32 inputs."""
    import os

    x = (jax.random.normal(jax.random.PRNGKey(0), (4, 64, 256)) * 3 + 0.5).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (256,)) * 0.5 + 1
    b = jax.random.normal(jax.random.PRNGKey(2), (256,)) * 0.1
    ref = np.asarray(layer_norm(x, w, b)).astype(np.float32)
    monkeypatch.setitem(os.environ, "BDT_LN", "mixed")
    got = np.asarray(layer_norm(x, w, b)).astype(np.float32)
    rel = (np.abs(got - ref) / (np.abs(ref) + 1.0)).max()  # bf16 ulp-level
    assert rel < 0.02, rel
    # f32 inputs ignore the knob entirely
    xf = x.astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(layer_norm(xf, w, b)), np.asarray(layer_norm(xf, w, b)))


def test_conv3x3_pallas_matches_xla_nhwc():
    """Pallas 3x3 SAME conv (interpret mode) — plain and with the fused
    ResidualBlock epilogue (relu_in + bias + residual) — vs conv2d_nhwc."""
    import functools

    import jax
    from jax.experimental import pallas as pl

    import burn_depth_tpu.ops.conv3x3_pallas as m
    from burn_depth_tpu.ops.conv import conv2d_nhwc

    orig = m.pl.pallas_call
    m.pl.pallas_call = functools.partial(pl.pallas_call, interpret=True)
    try:
        rng = jax.random.PRNGKey(0)
        n, h, w, c, o = 2, 12, 16, 8, 8
        x = jax.random.normal(jax.random.fold_in(rng, 1), (n, h, w, c))
        wt = jax.random.normal(jax.random.fold_in(rng, 2), (3, 3, c, o)) * 0.1
        b = jax.random.normal(jax.random.fold_in(rng, 3), (o,))
        res = jax.random.normal(jax.random.fold_in(rng, 4), (n, h, w, o))

        ref = jnp.maximum(conv2d_nhwc(jnp.maximum(x, 0), wt, b, padding=1) + res, 0)
        got = m.conv3x3_nhwc_pallas(x, wt, b, residual=res, relu_in=True, relu_out=True, tile_h=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

        got2 = m.conv3x3_nhwc_pallas(x, wt, tile_h=3)
        ref2 = conv2d_nhwc(x, wt, None, padding=1)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=1e-4)
    finally:
        m.pl.pallas_call = orig


def test_conv3x3_winograd_matches_xla_nhwc():
    """Winograd F(2x2,3x3) Pallas kernel (interpret mode) vs conv2d_nhwc —
    plain, fused epilogues, and the tile-shrink path."""
    import functools

    import jax
    from jax.experimental import pallas as pl

    import burn_depth_tpu.ops.winograd3x3_pallas as m
    from burn_depth_tpu.ops.conv import conv2d_nhwc

    orig = m.pl.pallas_call
    m.pl.pallas_call = functools.partial(pl.pallas_call, interpret=True)
    try:
        rng = jax.random.PRNGKey(0)
        n, h, w, c, o = 2, 12, 16, 8, 8
        x = jax.random.normal(jax.random.fold_in(rng, 1), (n, h, w, c))
        wt = jax.random.normal(jax.random.fold_in(rng, 2), (3, 3, c, o)) * 0.1
        b = jax.random.normal(jax.random.fold_in(rng, 3), (o,))
        res = jax.random.normal(jax.random.fold_in(rng, 4), (n, h, w, o))

        ref = jnp.maximum(conv2d_nhwc(jnp.maximum(x, 0), wt, b, padding=1) + res, 0)
        got = m.conv3x3_wino_pallas(x, wt, b, residual=res, relu_in=True, relu_out=True,
                                    tile_h=4, tile_w=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)

        # tile-shrink path: tile_h/tile_w larger than H/W shrink to fit
        got2 = m.conv3x3_wino_pallas(x, wt, tile_h=16, tile_w=128)
        ref2 = conv2d_nhwc(x, wt, None, padding=1)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=2e-4)

        # C-blocked accumulation path (innermost grid dim walks C in blocks,
        # f32 accumulation into a revisited output block; bias moves to the
        # XLA epilogue) — must match the direct conv and the unblocked kernel
        got3 = m.conv3x3_wino_pallas(x, wt, b, residual=res, relu_in=True,
                                     relu_out=True, tile_h=4, tile_w=8, c_block=4)
        np.testing.assert_allclose(np.asarray(got3), np.asarray(ref), atol=2e-4)

        # odd spatial dims are rejected (F(2x2) needs even tiling)
        with pytest.raises(ValueError):
            m.conv3x3_wino_pallas(x[:, :11], wt)
    finally:
        m.pl.pallas_call = orig
