"""Activations, including DA3's 8-variant head activation table
(reference ``HeadActivation``, ``src/model/depth_anything3/dpt.rs:97-114,719-730``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf-based) GELU — torch ``nn.GELU()`` default, as used by
    DINOv2 MLPs and DA3's camera pose branch (``camera.rs:224-231``).

    Serving knob ``BDT_GELU`` (linear_shape_probe: the erf epilogue drops the
    fc1+fc2 chain from 142 to 104 TFLOP/s-equivalent — the MLP activation is
    a first-order VPU cost at [35,577,4096]):

    * ``erf`` (default) — exact, the parity form;
    * ``tanh`` — torch ``approximate='gelu_tanh'``, |err| ≲ 1e-3;
    * ``sigmoid`` — ``x·σ(1.702x)``, |err| ≲ 0.02 absolute, cheapest.
    """
    import os

    form = os.environ.get("BDT_GELU", "erf")
    if form == "tanh":
        return jax.nn.gelu(x, approximate=True)
    if form == "sigmoid":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)


def head_activation(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    """DA3 head output activation (``dpt.rs:719-730``).

    ``exp_p1``/``exp_m1`` are literal ``exp(x) ± 1`` (the reference's ExpP1 is
    NOT log1p-style); ``softplus`` is the reference's manual
    ``log(exp(x) + 1)`` formulation.
    """
    kind = kind.lower()
    if kind == "linear":
        return x
    if kind == "exp":
        return jnp.exp(x)
    if kind == "exp_p1":
        return jnp.exp(x) + 1.0
    if kind == "exp_m1":
        return jnp.exp(x) - 1.0
    if kind == "relu":
        return relu(x)
    if kind == "sigmoid":
        return jax.nn.sigmoid(x)
    if kind == "softplus":
        return jnp.log(jnp.exp(x) + 1.0)
    if kind == "tanh":
        return jnp.tanh(x)
    raise ValueError(f"unknown head activation `{kind}`")
