"""Colormaps for depth visualization (beyond-parity; the reference CLI only
writes normalized grayscale, ``example/inference.rs:145-167``).

``turbo`` uses Google's published 5th-order polynomial approximation of the
Turbo colormap — self-contained, no matplotlib dependency.
"""

from __future__ import annotations

import numpy as np

# Polynomial coefficients of the Turbo approximation (per channel, in
# ascending powers of x), from the Google AI "Turbo" colormap release.
_TURBO_R = (0.13572138, 4.61539260, -42.66032258, 132.13108234, -152.94239396, 59.28637943)
_TURBO_G = (0.09140261, 2.19418839, 4.84296658, -14.18503333, 4.27729857, 2.82956604)
_TURBO_B = (0.10667330, 12.64194608, -60.58204836, 110.36276771, -89.90310912, 27.34824973)


def _poly(x: np.ndarray, coeffs) -> np.ndarray:
    out = np.zeros_like(x)
    for c in reversed(coeffs):
        out = out * x + c
    return out


def turbo(norm01: np.ndarray) -> np.ndarray:
    """``[...]`` values in [0, 1] → ``[..., 3]`` u8 RGB (Turbo)."""
    x = np.clip(np.asarray(norm01, np.float32), 0.0, 1.0)
    rgb = np.stack([_poly(x, _TURBO_R), _poly(x, _TURBO_G), _poly(x, _TURBO_B)], axis=-1)
    return np.clip(np.round(rgb * 255.0), 0, 255).astype(np.uint8)


def grayscale(norm01: np.ndarray) -> np.ndarray:
    """``[...]`` values in [0, 1] → ``[..., 3]`` u8 RGB (gray)."""
    x = np.clip(np.asarray(norm01, np.float32), 0.0, 1.0)
    g = np.clip(np.round(x * 255.0), 0, 255).astype(np.uint8)
    return np.repeat(g[..., None], 3, axis=-1)


COLORMAPS = {"gray": grayscale, "turbo": turbo}


def apply_colormap(norm01: np.ndarray, name: str) -> np.ndarray:
    """Dispatch by name; raises ``KeyError`` listing options for a bad name."""
    try:
        fn = COLORMAPS[name]
    except KeyError:
        raise KeyError(f"unknown colormap {name!r}; options: {sorted(COLORMAPS)}") from None
    return fn(norm01)
