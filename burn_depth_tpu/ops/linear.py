"""Linear layer with PyTorch weight layout ``[out, in]``.

The transpose is folded into the ``dot_general`` contraction dims — on the MXU
this costs nothing, and keeping torch layout makes checkpoint import a pure
copy (no transposition table like the reference's ``PyTorchToBurnAdapter``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def linear(x: jnp.ndarray, weight: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    # No preferred_element_type=f32: the MXU accumulates bf16×bf16 in f32
    # internally regardless; forcing an f32 *output* makes XLA materialize a
    # 2x-size intermediate plus a convert pass after every matmul.  Rounding
    # to the storage dtype happens either way, so numerics are unchanged.
    out = jnp.einsum("...i,oi->...o", x, weight.astype(x.dtype))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
