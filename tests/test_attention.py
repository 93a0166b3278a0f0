"""Attention parity: jnp path vs torch SDPA; pallas kernel vs jnp path
(pallas runs in interpreter mode on CPU)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

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
