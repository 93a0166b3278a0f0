"""Preprocessing + prediction types.

Counterpart of reference ``src/inference.rs:9-137``: ``DepthPrediction``,
``rgb_to_input_tensor`` (packed RGB u8 → normalized NCHW f32), and
``infer_from_rgb``.  Unlike the reference — a host-side per-pixel loop — the
normalization here is expressed in jnp so callers can fuse it into the jitted
forward (``fused=True`` returns a function suitable for tracing).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

# ImageNet statistics used by the DINO encoders (reference inference.rs:100-101).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


@dataclasses.dataclass
class DepthPrediction:
    """Reference ``DepthPrediction`` (``src/inference.rs:9-20``), extended
    with the per-pixel confidence DA3's dual head emits (the reference keeps
    it only on its DA3-specific inference struct)."""

    depth: jnp.ndarray  # [B, H, W] metric depth (or relative for DA3)
    focallength_px: Optional[jnp.ndarray] = None  # [B]
    fovy_rad: Optional[jnp.ndarray] = None  # [B]
    confidence: Optional[jnp.ndarray] = None  # [B, H, W] (DA3 dual head only)

    @property
    def has_intrinsics(self) -> bool:
        return self.focallength_px is not None or self.fovy_rad is not None


def normalize_image(rgb01: jnp.ndarray) -> jnp.ndarray:
    """ImageNet-normalize an NCHW float image in [0, 1].  jit-fusable."""
    mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(IMAGENET_STD).reshape(1, 3, 1, 1)
    return (rgb01 - mean) / std


def rgb_to_input_tensor(rgb: np.ndarray | bytes, width: int, height: int) -> jnp.ndarray:
    """Packed row-major RGB u8 → normalized ``[1, 3, H, W]`` f32 tensor.

    Mirrors reference ``rgb_to_input_tensor`` (``src/inference.rs:79-121``)
    including its error contract for wrong buffer sizes.
    """
    buf = np.frombuffer(rgb, dtype=np.uint8) if isinstance(rgb, (bytes, bytearray)) else np.asarray(rgb, dtype=np.uint8).ravel()
    expected = width * height * 3
    if buf.size != expected:
        raise ValueError(f"expected {expected} RGB bytes for {width}x{height}, got {buf.size}")
    hwc = buf.reshape(height, width, 3).astype(np.float32) / 255.0
    chw = np.transpose(hwc, (2, 0, 1))[None]
    return normalize_image(jnp.asarray(chw))


def infer_from_rgb(model, rgb, width: int, height: int) -> DepthPrediction:
    """Reference ``infer_from_rgb`` (``src/inference.rs:128-137``): preprocess
    then call the model's ``infer_depth``."""
    x = rgb_to_input_tensor(rgb, width, height)
    return model.infer_depth(x)
