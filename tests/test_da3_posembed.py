"""DA3 positional embedding: vectorized impl vs a literal transcription of the
reference's host loop (``dpt.rs:841-932``), including the x-major write quirk."""

import math

import numpy as np

from burn_depth_tpu.models.da3.posembed import add_pos_embed, positional_embedding


def _ref_sincos(dim, position):
    # literal port of make_sincos_embedding (dpt.rs:904-932)
    if dim == 0:
        return []
    half = dim // 2
    values = []
    for i in range(half):
        omega = 100.0 ** (-(i / half)) if half > 0 else 1.0
        values.append(math.sin(position * omega))
    remaining = dim - half
    for i in range(remaining):
        omega = 100.0 ** (-(i / remaining)) if remaining > 0 else 1.0
        values.append(math.cos(position * omega))
    return values


def _ref_build(channels, height, width, image_width, image_height):
    # literal port of build_positional_embedding (dpt.rs:841-894)
    aspect = image_width / image_height
    diag = math.sqrt(aspect * aspect + 1.0)
    span_x = aspect / diag
    span_y = 1.0 / diag

    def linspace(start, end, steps):
        if steps <= 1:
            return [start]
        step = (end - start) / (steps - 1.0)
        return [start + step * i for i in range(steps)]

    x_coords = linspace(-span_x * (width - 1.0) / width, span_x * (width - 1.0) / width, width)
    y_coords = linspace(-span_y * (height - 1.0) / height, span_y * (height - 1.0) / height, height)
    chw = np.zeros(height * width * channels, np.float32)
    x_channels = channels // 2
    embed_x = [_ref_sincos(x_channels, x) for x in x_coords]
    embed_y = [_ref_sincos(channels - x_channels, y) for y in y_coords]
    for x_idx, ex in enumerate(embed_x):
        for y_idx, ey in enumerate(embed_y):
            pixel_index = x_idx * height + y_idx
            for i, value in enumerate(ex):
                chw[i * height * width + pixel_index] = value
            for i, value in enumerate(ey):
                chw[(x_channels + i) * height * width + pixel_index] = value
    return chw.reshape(channels, height, width)


def test_positional_embedding_matches_reference_loop():
    for c, h, w, iw, ih in [(16, 7, 7, 98, 98), (13, 5, 9, 126, 70), (8, 1, 4, 56, 14)]:
        ours = positional_embedding(c, h, w, iw, ih)[0]
        ref = _ref_build(c, h, w, iw, ih)
        np.testing.assert_allclose(ours, ref, atol=1e-6, err_msg=f"{(c, h, w, iw, ih)}")


def test_add_pos_embed_ratio():
    x = np.zeros((2, 6, 4, 4), np.float32)
    out = np.asarray(add_pos_embed(x, 56, 56))
    emb = positional_embedding(6, 4, 4, 56, 56)
    np.testing.assert_allclose(out, np.broadcast_to(emb * 0.1, out.shape), atol=1e-6)


def test_zero_channel_passthrough():
    x = np.ones((1, 0, 4, 4), np.float32)
    out = np.asarray(add_pos_embed(x, 56, 56))
    assert out.shape == x.shape
