"""2-D convolution / transposed convolution with PyTorch layout + semantics.

Weights keep the PyTorch layouts — ``Conv2d: [out, in, kh, kw]``,
``ConvTranspose2d: [in, out, kh, kw]`` — so checkpoint import is a pure
structural copy (the reference instead has to dim-swap convT weights after
import, ``maybe_fix_conv_transpose2d`` in ``src/model/depth_pro/mod.rs:416-431``;
keeping torch layout end-to-end removes that failure mode entirely).

Both lower to ``lax.conv_general_dilated`` which XLA:TPU maps onto the MXU.
MXU accumulation is f32 internally; outputs stay in the storage dtype.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def _pair(v):
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def conv2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride=1,
    padding=0,
    dilation=1,
    groups: int = 1,
) -> jnp.ndarray:
    """``torch.nn.functional.conv2d`` equivalent. ``x: [N,C,H,W]``, ``weight: [O,I/g,kh,kw]``."""
    stride = _pair(stride)
    dilation = _pair(dilation)
    pad_h, pad_w = _pair(padding)
    out = lax.conv_general_dilated(
        x,
        weight.astype(x.dtype),
        window_strides=stride,
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        rhs_dilation=dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        # No preferred_element_type=f32 — MXU accumulation is f32 internally;
        # forcing an f32 output adds a materialized convert after every conv.
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)[None, :, None, None]
    return out


def _convt_mm_enabled() -> bool:
    import os

    return os.environ.get("BDT_CONVT_MM", "0") == "1"


def _conv_transpose2d_matmul(x, weight, bias, sh: int, sw: int) -> jnp.ndarray:
    """``k == stride`` transposed conv as matmul + depth-to-space.

    With no output overlap, ``out[b,o,sh·i+di,sw·j+dj] = Σ_c x[b,c,i,j]·
    W[c,o,di,dj]`` — a per-pixel linear to ``O·sh·sw`` features followed by a
    pixel shuffle.  Avoids the zero-inserting fractionally-strided conv
    lowering and gives the MXU an ``N = O·sh·sw`` contraction (512 for the
    2x2 s2 deconvs) instead of ``N = O`` with 3/4 of the dilated taps zero.
    """
    b, c, h, w = x.shape
    o = weight.shape[1]
    wm = weight.reshape(c, o * sh * sw).astype(x.dtype)  # (o, di, dj) minor order
    y = jnp.einsum("bchw,cf->bhwf", x, wm)
    y = y.reshape(b, h, w, o, sh, sw).transpose(0, 3, 1, 4, 2, 5).reshape(b, o, h * sh, w * sw)
    if bias is not None:
        y = y + bias.astype(y.dtype)[None, :, None, None]
    return y


def conv_transpose2d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride=1,
    padding=0,
) -> jnp.ndarray:
    """``torch.nn.functional.conv_transpose2d`` equivalent.

    ``x: [N,I,H,W]``, ``weight: [I,O,kh,kw]`` (torch layout).  Implemented as a
    fractionally-strided convolution: dilate the input by ``stride``, convolve
    with the spatially-flipped, IO-swapped kernel, pad ``k-1-p``.  Every convT
    in these models has ``k == stride`` (2x2 s2 / 4x4 s4, e.g. reference
    ``encoder.rs:60-68``, ``dpt.rs:164-191``) so there is no output overlap;
    ``BDT_CONVT_MM=1`` routes that case through the matmul + depth-to-space
    form (``_conv_transpose2d_matmul``) instead.
    """
    stride = _pair(stride)
    pad_h, pad_w = _pair(padding)
    kh, kw = weight.shape[2], weight.shape[3]
    if (kh, kw) == stride and (pad_h, pad_w) == (0, 0) and _convt_mm_enabled():
        return _conv_transpose2d_matmul(x, weight, bias, kh, kw)
    # [I,O,kh,kw] -> flip spatial -> [O,I,kh,kw]
    w = jnp.flip(weight, axis=(2, 3)).swapaxes(0, 1)
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((kh - 1 - pad_h, kh - 1 - pad_h), (kw - 1 - pad_w, kw - 1 - pad_w)),
        lhs_dilation=stride,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)[None, :, None, None]
    return out


# --------------------------------------------------------------------------
# NHWC variants (serving layout).
#
# The TPU's native conv layout is feature-minor: NHWC activations put the
# channel dim on the 128-lane axis with no relayout.  Weights are converted
# once at model-transform time (``HWIO``); the NCHW entry points above stay
# the checkpoint-facing layout.
# --------------------------------------------------------------------------


def conv2d_nhwc(
    x: jnp.ndarray,
    weight_hwio: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride=1,
    padding=0,
    dilation=1,
    groups: int = 1,
) -> jnp.ndarray:
    """``x: [N,H,W,C]``, ``weight: [kh,kw,I/g,O]`` -> ``[N,H,W,O]``."""
    stride = _pair(stride)
    dilation = _pair(dilation)
    pad_h, pad_w = _pair(padding)
    out = lax.conv_general_dilated(
        x,
        weight_hwio.astype(x.dtype),
        window_strides=stride,
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv_transpose2d_nhwc(
    x: jnp.ndarray,
    weight_hwio: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    stride=1,
    padding=0,
) -> jnp.ndarray:
    """NHWC fractionally-strided conv.  ``weight_hwio`` must already be the
    flipped/IO-swapped kernel in ``[kh,kw,I,O]`` (see ``convt_weight_to_hwio``)."""
    stride = _pair(stride)
    pad_h, pad_w = _pair(padding)
    kh, kw = weight_hwio.shape[0], weight_hwio.shape[1]
    out = lax.conv_general_dilated(
        x,
        weight_hwio.astype(x.dtype),
        window_strides=(1, 1),
        padding=((kh - 1 - pad_h, kh - 1 - pad_h), (kw - 1 - pad_w, kw - 1 - pad_w)),
        lhs_dilation=stride,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv_weight_to_hwio(weight) -> jnp.ndarray:
    """torch Conv2d ``[O,I,kh,kw]`` -> ``[kh,kw,I,O]``."""
    return jnp.transpose(weight, (2, 3, 1, 0))


def convt_weight_to_hwio(weight) -> jnp.ndarray:
    """torch ConvTranspose2d ``[I,O,kh,kw]`` -> pre-flipped ``[kh,kw,I,O]``
    ready for ``conv_transpose2d_nhwc``."""
    w = jnp.flip(weight, axis=(2, 3))  # [I,O,kh,kw] spatially flipped
    return jnp.transpose(w, (2, 3, 0, 1))
