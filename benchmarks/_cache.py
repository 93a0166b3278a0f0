"""Shared persistent-compilation-cache setup for all benchmark scripts.

Import BEFORE any jax compilation: repeat probe runs then skip the multi-
minute flagship XLA compiles (same cache bench.py uses).
"""

import os

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
