"""Attention parity: jnp path vs torch SDPA; pallas kernel vs jnp path
(pallas runs in interpreter mode on CPU)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from burn_depth_tpu.ops.attention import _attention_jnp, multi_head_attention


def _qkv(b=2, h=3, t=17, d=8, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((b, h, t, d)).astype(np.float32) for _ in range(3)]


def test_jnp_attention_matches_torch_sdpa():
    q, k, v = _qkv()
    ours = np.asarray(multi_head_attention(q, k, v, impl="jnp"))
    theirs = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_quiet_softmax_reduces_attention_mass():
    q, k, v = _qkv(seed=1)
    standard = np.asarray(multi_head_attention(q, k, v, impl="jnp"))
    quiet = np.asarray(multi_head_attention(q, k, v, impl="jnp", quiet_softmax=True))
    assert not np.allclose(standard, quiet)
    # quiet softmax denominators are strictly larger -> smaller magnitudes on average
    assert np.mean(np.abs(quiet)) < np.mean(np.abs(standard))


@pytest.mark.parametrize("t", [64, 577, 130])
def test_pallas_kernel_matches_jnp_interpret(t):
    """Run the TPU kernel in interpreter mode on CPU and diff vs the jnp path.

    t=577 is Depth Pro's real token count (24²+1); 130 exercises padding.
    """
    from jax.experimental.pallas import tpu as pltpu

    q, k, v = _qkv(b=1, h=2, t=t, d=64, seed=2)
    ref = np.asarray(_attention_jnp(q, k, v, 64.0**-0.5, False))
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(multi_head_attention(q, k, v, impl="pallas"))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_fused_ln_matmul_kernel_matches_composition():
    """Interpret-mode Pallas run == the jnp composition (LN → linear → GELU),
    including M not a multiple of the tile and multi-chunk N."""
    import jax
    import jax.numpy as jnp

    from burn_depth_tpu.ops.fused_ln_matmul import ln_matmul

    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    m, d, n = 300, 256, 512  # m % tile_m != 0
    x = jax.random.normal(k1, (2, m // 2, d), jnp.float32)
    gamma = jax.random.normal(k2, (d,)) * 0.1 + 1.0
    beta = jax.random.normal(k3, (d,)) * 0.1
    w = jax.random.normal(k4, (n, d)) * 0.05
    b = jax.random.normal(k5, (n,)) * 0.1

    for act in ("none", "gelu"):
        ref = ln_matmul(x, gamma, beta, w, b, act=act, impl="jnp")
        got = ln_matmul(x, gamma, beta, w, b, act=act, impl="pallas", interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_packed_qkv_kernel_matches_head_major():
    """Interpret-mode packed kernel == jnp head-major path (incl. padded T)."""
    import functools

    import jax
    import jax.numpy as jnp

    from burn_depth_tpu.ops import attention as A

    b, t, h, hd = 2, 37, 4, 16
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, t, 3, h, hd), jnp.float32)
    ref = A.attention_packed_qkv(qkv, impl="jnp")

    orig = A._flash_kernel_packed
    # run the pallas path in interpreter mode on CPU
    import jax.experimental.pallas as pl

    real_call = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(real_call, interpret=True)
        got = A._attention_pallas_packed(qkv, scale=hd ** -0.5, quiet_softmax=False)
    finally:
        pl.pallas_call = real_call
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("quiet", [False, True])
def test_no_max_kernel_matches_standard(quiet):
    """``no_max=True`` (serving knob): clamp-only softmax with the
    compile-time pad-count denominator correction must match the
    max-subtracted form at f32 tolerance, including padded T."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from burn_depth_tpu.ops import attention as A

    q, k, v = _qkv(b=1, h=2, t=130, d=64, seed=6)
    ref = np.asarray(A._attention_jnp(q, k, v, 64.0**-0.5, quiet))
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(
            A._attention_pallas(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 64.0**-0.5, quiet,
                no_max=True,
            )
        )
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("quiet", [False, True])
def test_exp2_mode_matches_standard(monkeypatch, quiet):
    """BDT_ATTN_EXP2 (scale·log2e folded into q + in-kernel exp2) must equal
    the standard exp softmax: exp2(x·log2e) ≡ exp(x)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from burn_depth_tpu.ops import attention as A

    monkeypatch.setenv("BDT_ATTN_EXP2", "1")
    monkeypatch.setattr(A, "_on_tpu", lambda: True)

    q, k, v = _qkv(b=1, h=2, t=130, d=64, seed=5)
    ref = np.asarray(A._attention_jnp(q, k, v, 64.0**-0.5, quiet))
    qf, scale = A.fold_softmax_scale(jnp.asarray(q), 64.0**-0.5, "pallas")
    assert scale == 1.0
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(A._attention_pallas(qf, jnp.asarray(k), jnp.asarray(v), 1.0, quiet))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("t,quiet", [(37, False), (300, True)])
def test_packed4_kernel_matches_jnp(t, quiet):
    """Interpret-mode 4-D packed kernel ([B,T,3H,hd] in-place q/k/v slices)
    == jnp head-major path; t=300 forces a q-block split + key padding."""
    import functools

    import jax
    import jax.numpy as jnp

    from burn_depth_tpu.ops import attention as A

    b, h, hd = 2, 8, 16
    qkv5 = jax.random.normal(jax.random.PRNGKey(1), (b, t, 3, h, hd), jnp.float32)
    ref = A.attention_packed_qkv(qkv5, quiet_softmax=quiet, impl="jnp")

    import jax.experimental.pallas as pl

    real_call = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(real_call, interpret=True)
        got = A._attention_pallas_packed4(
            qkv5.reshape(b, t, 3 * h, hd), h, scale=hd ** -0.5,
            quiet_softmax=quiet, q_block=256,
        )
    finally:
        pl.pallas_call = real_call
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("t,quiet", [(64, False), (77, False), (130, True), (577, False)])
def test_pallas_flash_backward_matches_jnp_vjp(t, quiet, monkeypatch):
    """The training path's flash backward kernel (interpret mode) must match
    the exact VJP of the jnp formulation — incl. pad-key masking at non-128
    T and the quiet-softmax denominator."""
    from burn_depth_tpu.ops.attention import _attention_jnp, _attention_pallas_diff

    monkeypatch.setenv("BDT_ATTN_BWD", "pallas")  # bypass the small-T auto gate
    b, h, hd = 2, 2, 64 if t >= 130 else 32
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v = (jax.random.normal(ks[i], (b, h, t, hd), jnp.float32) * 0.5 for i in range(3))
    g = jax.random.normal(ks[3], (b, h, t, hd), jnp.float32)
    scale = hd**-0.5

    _, ref_vjp = jax.vjp(lambda a, b_, c: _attention_jnp(a, b_, c, scale, quiet), q, k, v)
    ref = ref_vjp(g)
    with pltpu.force_tpu_interpret_mode():
        out, vjp = jax.vjp(
            lambda a, b_, c: _attention_pallas_diff(a, b_, c, scale, quiet), q, k, v
        )
        got = vjp(g)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_attention_jnp(q, k, v, scale, quiet)), rtol=2e-5, atol=2e-5
    )
    for a, r, name in zip(got, ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=2e-4, atol=2e-4, err_msg=name)


def test_pallas_backward_jnp_fallback_knob(monkeypatch):
    """BDT_ATTN_BWD=jnp routes the backward through the jax.vjp fallback."""
    from burn_depth_tpu.ops.attention import _attention_jnp, _attention_pallas_diff

    monkeypatch.setenv("BDT_ATTN_BWD", "jnp")
    b, h, t, hd = 1, 2, 48, 32
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q, k, v = (jax.random.normal(ks[i], (b, h, t, hd), jnp.float32) for i in range(3))
    g = jax.random.normal(ks[3], (b, h, t, hd), jnp.float32)
    _, ref_vjp = jax.vjp(lambda a, b_, c: _attention_jnp(a, b_, c, 0.25, False), q, k, v)
    with pltpu.force_tpu_interpret_mode():
        _, vjp = jax.vjp(lambda a, b_, c: _attention_pallas_diff(a, b_, c, 0.25, False), q, k, v)
        got = vjp(g)
    for a, r in zip(got, ref_vjp(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-5, atol=1e-5)


def test_fold_softmax_scale_matches_consumer_base(monkeypatch):
    """BDT_ATTN_EXP2 folds log2e ONLY for a Pallas-bound consumer; an
    explicit jnp consumer (e.g. the SP island's base-e einsum path) must get
    the plain power-of-two fold — a mismatch runs softmax at the wrong
    temperature (ln2 / log2e off)."""
    import math

    from burn_depth_tpu.ops import attention as A

    monkeypatch.setenv("BDT_ATTN_EXP2", "1")
    monkeypatch.setattr(A, "_on_tpu", lambda: True)
    q = jnp.ones((1, 2, 256, 64), jnp.float32)
    qf, scale = A.fold_softmax_scale(q, 64.0 ** -0.5, "jnp")
    np.testing.assert_allclose(np.asarray(qf), 0.125, rtol=1e-6)
    assert scale == 1.0
    qp, scale_p = A.fold_softmax_scale(q, 64.0 ** -0.5, "pallas")
    np.testing.assert_allclose(
        np.asarray(qp), 0.125 * math.log2(math.e), rtol=1e-6
    )
    assert scale_p == 1.0
