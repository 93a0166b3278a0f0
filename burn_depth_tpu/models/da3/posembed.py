"""DA3 DPT sin/cos positional embedding, precomputed at trace time.

The reference builds this on the HOST per shape and caches it in a RefCell
(``PosEmbedCache``, ``src/model/depth_anything3/dpt.rs:775-932``) — a
device-upload on every cache miss.  Under jit the embedding is a pure function
of static shapes, so here it is a numpy constant folded into the XLA graph;
the "cache" is an ``lru_cache`` over shape keys and costs nothing at runtime.

The reference's exact quirks are replicated:

* aspect-normalized coordinate spans over the image diagonal
  (``dpt.rs:851-859``),
* per-axis sin/cos tables with ``ω₀ = 100`` and split-half exponent schedules
  (``make_sincos_embedding``, ``dpt.rs:904-932``),
* the **x-major pixel write order** (``pixel_index = x_idx * height + y_idx``,
  ``dpt.rs:877-891``) — for square feature maps this transposes the grid
  relative to the natural row-major order; we reproduce the flat layout
  bit-for-bit rather than "fixing" it,
* applied as ``t + 0.1 * embed`` (``POS_EMBED_RATIO``, ``dpt.rs:827``).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

POS_EMBED_RATIO = 0.1
POS_EMBED_OMEGA0 = 100.0


def _sincos_table(dim: int, positions: np.ndarray) -> np.ndarray:
    """``[len(positions), dim]`` table: first ``dim//2`` channels sin, rest cos,
    each with its own exponent schedule (``dpt.rs:904-932``)."""
    if dim == 0:
        return np.zeros((positions.shape[0], 0), np.float32)
    half = dim // 2
    rem = dim - half
    out = np.empty((positions.shape[0], dim), np.float64)
    if half:
        omega = POS_EMBED_OMEGA0 ** (-(np.arange(half) / half))
        out[:, :half] = np.sin(positions[:, None] * omega[None, :])
    omega = POS_EMBED_OMEGA0 ** (-(np.arange(rem) / rem))
    out[:, half:] = np.cos(positions[:, None] * omega[None, :])
    return out.astype(np.float32)


@functools.lru_cache(maxsize=128)
def positional_embedding(
    channels: int, height: int, width: int, image_width: int, image_height: int
) -> np.ndarray:
    """``[1, channels, height, width]`` constant, reference-exact."""
    if channels == 0 or height == 0 or width == 0:
        return np.zeros((1, channels, height, width), np.float32)
    aspect = image_width / image_height
    diag = np.sqrt(aspect * aspect + 1.0)
    span_x = aspect / diag
    span_y = 1.0 / diag

    def ref_linspace(start, end, steps):
        if steps <= 1:
            return np.array([start], np.float64)
        step = (end - start) / (steps - 1.0)
        return start + step * np.arange(steps)

    x_coords = ref_linspace(-span_x * (width - 1.0) / width, span_x * (width - 1.0) / width, width)
    y_coords = ref_linspace(-span_y * (height - 1.0) / height, span_y * (height - 1.0) / height, height)

    x_channels = channels // 2
    y_channels = channels - x_channels
    emb_x = _sincos_table(x_channels, x_coords)  # [W, x_channels]
    emb_y = _sincos_table(y_channels, y_coords)  # [H, y_channels]

    # Reference flat write order: chw[c*H*W + x_idx*H + y_idx] (dpt.rs:877-891).
    pix = np.arange(width * height)
    x_idx = pix // height
    y_idx = pix % height
    chw = np.empty((channels, height * width), np.float32)
    chw[:x_channels, :] = emb_x[x_idx].T
    chw[x_channels:, :] = emb_y[y_idx].T
    return chw.reshape(1, channels, height, width)


def add_pos_embed(x: jnp.ndarray, image_width: int, image_height: int) -> jnp.ndarray:
    """``x + 0.1·embed`` for an NCHW tensor (reference ``PosEmbedCache::add``)."""
    _, c, h, w = x.shape
    if c == 0 or h == 0 or w == 0:
        return x
    emb = jnp.asarray(positional_embedding(c, h, w, image_width, image_height))
    return x + emb.astype(x.dtype) * POS_EMBED_RATIO
