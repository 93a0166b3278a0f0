"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This mirrors the reference's CI strategy of testing on the NdArray CPU backend
(``.github/workflows/test.yml:34-36``) — correctness is checked on CPU-jit;
the same jitted code runs on TPU unchanged.  The 8 virtual devices let the
multi-chip sharding tests (``tests/test_parallel.py``) validate mesh layouts
without TPU hardware.
"""

import os

# Must be set before jax is imported anywhere.  Force-set: the session env
# pins JAX_PLATFORMS to the TPU platform, but tests always run on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Parity tests compare against PyTorch f32 — forbid bf16 matmul demotion.
# (The serving path on TPU deliberately keeps the fast default.)
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"

# Persistent XLA compilation cache (BDT_TEST_CACHE=0 disables): the suite
# compiles the same tiny models in dozens of fresh pytest processes; warm
# cache hits skip those CPU compiles (~45% of a heavy file's runtime).  The
# XLA:CPU AOT loader logs a spurious machine-feature mismatch per hit AT
# ERROR level (prefer-no-scatter/-gather are compile-time pseudo-features),
# so nothing short of level 3 silences it.  Trade-off: all native-layer
# logs are muted for the session — genuine XLA failures still raise as
# Python exceptions with messages, but their C++-side diagnostics are
# hidden; set BDT_TEST_CACHE=0 when debugging one.
if os.environ.get("BDT_TEST_CACHE", "1") != "0":
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# The session's TPU platform plugin ignores the JAX_PLATFORMS env var, so pin
# the platform through the config as well.
jax.config.update("jax_platforms", "cpu")

if os.environ.get("BDT_TEST_CACHE", "1") != "0":
    _cache_dir = os.path.join(os.path.dirname(__file__), ".jax_test_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
