"""Backend-matrix tests (reference ``src/lib.rs:24-305``): the same
init / checkpoint-roundtrip / zero-input-inference suite parametrized over
backends, with graceful skip when a backend is unavailable
(``Availability::Optional`` prints "ignored" and passes, ``lib.rs:126-148``).

The CPU leg runs in-process (conftest pins the suite to the virtual CPU
mesh).  The TPU leg must escape that pin, so it runs in a subprocess with a
clean JAX_PLATFORMS — opt in with ``BURN_DEPTH_TPU_TESTS=1`` (the TPU claim
through the tunnel can take minutes, so it is not on by default)."""

import dataclasses
import os
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_depth_tpu.io import load_checkpoint, save_checkpoint
from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

_TINY = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")


def test_cpu_init_record_roundtrip_zero_infer(tmp_path):
    """The reference's per-backend triple on the CPU backend."""
    model = DepthAnything3.init(jax.random.PRNGKey(0), _TINY)
    path = str(tmp_path / "m.safetensors")
    save_checkpoint(path, model.params)
    loaded = DepthAnything3(_TINY, load_checkpoint(path, model.params))
    out = loaded.infer(jnp.zeros((1, 3, 28, 28)))
    assert out.depth.shape == (1, 28, 28)
    assert np.isfinite(np.asarray(out.depth)).all()


@pytest.mark.skipif(
    not os.environ.get("BURN_DEPTH_TPU_TESTS"),
    reason="TPU backend optional: set BURN_DEPTH_TPU_TESTS=1 (claim can take minutes)",
)
def test_tpu_zero_infer_smoke():
    script = textwrap.dedent(
        """
        import dataclasses, jax, jax.numpy as jnp, numpy as np, sys
        sys.path.insert(0, %r)
        assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
        from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config
        cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28)
        m = DepthAnything3.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        out = m.infer(jnp.zeros((1, 3, 28, 28), jnp.bfloat16))
        assert out.depth.shape == (1, 28, 28)
        assert np.isfinite(np.asarray(out.depth, np.float32)).all()
        print("TPU smoke OK")
        """
    ) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Keep the session env (incl. JAX_PLATFORMS=axon) but drop the test
    # suite's host-device-count flag so the subprocess sees the real chip.
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run([sys.executable, "-c", script], env=env, capture_output=True, text=True, timeout=900)
    if r.returncode != 0 and "claim" in (r.stderr or "").lower():
        pytest.skip(f"TPU unavailable: {r.stderr[-200:]}")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "TPU smoke OK" in r.stdout


def test_bf16_policy_stays_near_f32():
    """SERVING (bf16) vs PARITY (f32) divergence on depth stays small — the
    dtype-policy contract (core/dtypes.py): bf16 params/compute with f32
    norm islands and f32 MXU accumulation."""
    import dataclasses as dc

    import jax.numpy as jnp

    from burn_depth_tpu.core.pytree import tree_cast

    cfg = dc.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    m32 = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    m16 = DepthAnything3(cfg, tree_cast(m32.params, jnp.bfloat16))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28)) * 0.5

    d32 = np.asarray(m32.infer(x).depth, np.float32)
    d16 = np.asarray(m16.infer(x.astype(jnp.bfloat16)).depth, np.float32)
    rel = np.abs(d16 - d32) / np.maximum(np.abs(d32), 1e-6)
    assert np.median(rel) < 2e-2, float(np.median(rel))
    assert np.isfinite(d16).all()
