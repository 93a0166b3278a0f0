"""``core.knobs.kjit``: BDT_* env knobs are part of the jit cache key.

The trace-time knob hazard (round-4 verdict weak #6): the ``BDT_*`` serving
knobs select program structure at trace time, but a bare ``jax.jit`` cache
key excludes the environment — toggling a knob after a same-shape call
silently reused the stale program.  ``kjit`` folds a snapshot of every set
``BDT_*`` variable into the cache key; these tests pin the guarantee at the
op level, at the wrapper level, and at a real model entry point.
"""

import os
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np

from burn_depth_tpu.core.knobs import kjit, knob_key


@contextmanager
def _env(**kv):
    old = {k: os.environ.get(k) for k in kv}
    for k, v in kv.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = str(v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_knob_key_reflects_bdt_env():
    with _env(BDT_GELU=None):
        base = knob_key()
        with _env(BDT_GELU="tanh"):
            assert ("BDT_GELU", "tanh") in knob_key()
        assert knob_key() == base  # restored


def test_knob_flip_retraces_same_shape_call():
    """The hazard case verbatim: same-shape second call after an env flip
    must produce the NEW program's numbers, not the stale cached ones."""
    from burn_depth_tpu.ops.activations import gelu

    f = kjit(lambda x: gelu(x))
    x = jnp.asarray(np.linspace(-3, 3, 64, dtype=np.float32))
    with _env(BDT_GELU="erf"):
        y_erf = np.asarray(f(x))
    with _env(BDT_GELU="tanh"):
        y_tanh = np.asarray(f(x))
    # erf vs tanh GELU differ at ~1e-3 absolute around |x|≈2
    assert np.abs(y_erf - y_tanh).max() > 1e-4
    # and the tanh program really is the tanh form, not a third thing
    np.testing.assert_allclose(
        y_tanh, np.asarray(jax.nn.gelu(x, approximate=True)), rtol=0, atol=1e-6
    )


def test_same_knobs_hit_the_cache():
    from burn_depth_tpu.ops.activations import gelu

    f = kjit(lambda x: gelu(x))
    x = jnp.ones((8,), jnp.float32)
    with _env(BDT_GELU="erf"):
        f(x)
        n1 = f._knob_jitted._cache_size()
        f(x)
        assert f._knob_jitted._cache_size() == n1
        with _env(BDT_GELU="tanh"):
            f(x)
        assert f._knob_jitted._cache_size() == n1 + 1


def test_static_and_donate_argnums_shift():
    f = kjit(lambda x, n: x * n, static_argnums=(1,))
    assert float(f(jnp.asarray(2.0), 3)) == 6.0

    g = kjit(lambda s, x: s + x, donate_argnums=(0,))  # CPU ignores donation
    assert float(g(jnp.asarray(1.0), jnp.asarray(2.0))) == 3.0


def test_lower_passthrough():
    f = kjit(lambda x: x + 1)
    lowered = f.lower(jnp.ones((4,), jnp.float32))
    assert "stablehlo" in lowered.as_text().lower() or "module" in lowered.as_text()


def test_model_entry_point_honors_knob_flip():
    """Product surface: one long-lived jitted closure from
    ``DepthPro.jit_infer`` must re-specialize when BDT_GELU flips —
    exactly the sequence that used to silently serve the stale program."""
    from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

    cfg = DepthProConfig.tiny_test()
    m = DepthPro.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

    # Random init keeps DINOv2's 1e-5 layerscale, which zeroes every block's
    # contribution — the GELU form would be numerically invisible.  Excite
    # the layerscales so the knob actually reaches the output (same trick as
    # tools/tier_drift.py::build_base).
    def excite(path, leaf):
        if any(getattr(p, "key", None) in ("ls1", "ls2") for p in path):
            return jnp.full_like(leaf, 0.5)
        return leaf

    m = DepthPro(cfg, jax.tree_util.tree_map_with_path(excite, m.params))
    fn = m.jit_infer()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 3, cfg.img_size, cfg.img_size)),
        jnp.float32,
    )
    # Compare on fovx_deg: random-weight depth saturates at the 1e4 clamp,
    # but the FOV head's output is continuous and flows through the excited
    # GELU blocks.
    with _env(BDT_GELU="erf"):
        f_erf = np.asarray(fn(x).fovx_deg)
    with _env(BDT_GELU="sigmoid"):  # coarsest form: |err| up to 2e-2 per op
        f_sig = np.asarray(fn(x).fovx_deg)
    assert np.abs(f_erf - f_sig).max() > 0  # the program changed
