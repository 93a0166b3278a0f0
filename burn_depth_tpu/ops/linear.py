"""Linear layer with PyTorch weight layout ``[out, in]``.

The transpose is folded into the ``dot_general`` contraction dims — on the MXU
this costs nothing, and keeping torch layout makes checkpoint import a pure
copy (no transposition table like the reference's ``PyTorchToBurnAdapter``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def linear(x: jnp.ndarray, weight: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    out = jnp.einsum(
        "...i,oi->...o",
        x,
        weight.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
