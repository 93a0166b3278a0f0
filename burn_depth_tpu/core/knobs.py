"""Trace-time serving-knob snapshot + knob-keyed jit.

The ``BDT_*`` environment knobs select program STRUCTURE at trace time —
attention formulation (``BDT_ATTN_*``), GELU form (``BDT_GELU``), int8
epilogue/impl (``BDT_INT8_*``), conv kernels (``BDT_CONV3_*``), layernorm
math (``BDT_LN``), deconv lowering (``BDT_CONVT_MM``).  ``jax.jit``'s cache
key covers argument shapes/dtypes and static arguments, NOT the process
environment, so a bare ``jax.jit`` around a knob-reading forward would
silently reuse the stale program when a knob is toggled between same-shape
calls (the round-4 verdict's "trace-time knob hazard").

``kjit`` closes the hazard: it is ``jax.jit`` plus one implicit leading
static argument — a snapshot of every ``BDT_*`` variable currently set —
filled in at each call.  Toggling any knob changes the snapshot, which
changes the jit cache key, which forces a retrace that re-reads the
environment.  Same-knob calls hit the existing executable exactly as
before (the snapshot is a small tuple; building it is nanoseconds against
a jit dispatch).

Env vars stay the knobs' source of truth — this module only makes the
compilation cache honest about them.  Every long-lived jitted entry point
in the package (model ``infer``/``predict`` closures, the serving step
builders, the train step, the CLI lanes, the knob-reading attention
dispatchers) routes through ``kjit``; short-lived one-shot jits (a local
``jax.jit(fn)(x)`` used once, e.g. calibration) don't cache across knob
changes and may stay bare.
"""

from __future__ import annotations

import functools
import inspect
import os
from typing import Any, Callable

_PREFIX = "BDT_"


def knob_key() -> tuple:
    """Hashable snapshot of every currently-set ``BDT_*`` env var.

    Prefix-scanned rather than allowlisted so a future knob is covered the
    day it is introduced; the cost of over-matching (a non-trace knob like
    ``BDT_TEST_CACHE`` forcing one extra retrace when toggled mid-process)
    is a compile, not a wrong program."""
    return tuple(sorted((k, v) for k, v in os.environ.items() if k.startswith(_PREFIX)))


def _shift(nums) -> tuple:
    if nums is None:
        return ()
    if isinstance(nums, int):
        nums = (nums,)
    return tuple(n + 1 for n in nums)


def kjit(
    fn: Callable = None,
    *,
    static_argnums=(),
    static_argnames=(),
    donate_argnums=(),
    **jit_kwargs: Any,
):
    """``jax.jit`` with the ``BDT_*`` knob snapshot as an implicit leading
    static argument (see module docstring).  Positional ``static_argnums`` /
    ``donate_argnums`` refer to ``fn``'s own signature and are shifted
    internally.  Usable as ``kjit(fn)``, ``kjit(fn, donate_argnums=0)`` or
    as a decorator ``@kjit`` / ``@kjit(static_argnames=...)``.

    The returned callable exposes ``.lower(*args)`` (AOT lowering under the
    CURRENT knob snapshot) and ``._knob_jitted`` (the underlying jit, whose
    ``_cache_size()`` the regression test asserts grows on a knob flip).
    """
    if fn is None:
        return functools.partial(
            kjit,
            static_argnums=static_argnums,
            static_argnames=static_argnames,
            donate_argnums=donate_argnums,
            **jit_kwargs,
        )

    def with_key(_bdt_knobs, *args, **kwargs):
        del _bdt_knobs  # cache-key only; the body re-reads os.environ
        return fn(*args, **kwargs)

    # ``with_key``'s (*args, **kwargs) signature hides ``fn``'s parameter
    # names from jax.jit, so a static_argnames arg passed POSITIONALLY would
    # silently become a traced argument.  Translate names to positions from
    # ``fn``'s own signature and register both forms.
    if isinstance(static_argnames, str):
        static_argnames = (static_argnames,)
    nums = set(static_argnums if not isinstance(static_argnums, int) else (static_argnums,))
    if static_argnames:
        try:
            params = list(inspect.signature(fn).parameters)
            nums |= {params.index(n) for n in static_argnames if n in params}
        except (TypeError, ValueError):  # builtins / C callables: keyword-only
            pass

    jitted = jax_jit(
        with_key,
        static_argnums=(0, *_shift(sorted(nums))),
        static_argnames=static_argnames,
        donate_argnums=_shift(donate_argnums),
        **jit_kwargs,
    )

    @functools.wraps(fn)
    def call(*args, **kwargs):
        return jitted(knob_key(), *args, **kwargs)

    call.lower = lambda *a, **k: jitted.lower(knob_key(), *a, **k)
    call._knob_jitted = jitted
    return call


def jax_jit(*args, **kwargs):
    """Late-bound ``jax.jit`` so importing this module (doc tooling imports
    ``core.tiers`` → ``core``) does not initialize a JAX backend."""
    import jax

    return jax.jit(*args, **kwargs)
