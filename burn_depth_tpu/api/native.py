"""ctypes bindings for the native host-preprocessing library.

Loads ``native/libburn_depth_host.so`` (built with ``make -C native``); every
entry point has a numpy fallback (``api/preprocess.py``) so the framework is
fully functional without the native build — the library is a throughput
optimization for the streaming ingest lane (BASELINE config 4/5), mirroring
how the reference's preprocessing is compiled Rust rather than interpreted.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from burn_depth_tpu.api.predict import IMAGENET_MEAN, IMAGENET_STD
from burn_depth_tpu.api.preprocess import CATMULL_ROM

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libburn_depth_host.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    path = os.environ.get("BURN_DEPTH_NATIVE_LIB", os.path.abspath(_LIB_PATH))
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        _load_failed = True
        return None
    lib.bd_resize_bicubic_u8.argtypes = [
        _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
    ]
    lib.bd_rgb_to_nchw_norm.argtypes = [_u8p, ctypes.c_int, ctypes.c_int, _f32p, _f32p, _f32p]
    lib.bd_prepare_image_nchw.argtypes = [
        _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double, _f32p, _f32p, _f32p,
    ]
    lib.bd_version.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def resize_bicubic_u8(img: np.ndarray, out_h: int, out_w: int, a: float = CATMULL_ROM) -> np.ndarray:
    """Native bicubic resize of an ``[H,W,C] u8`` image; numpy fallback."""
    lib = _load()
    if lib is None:
        from burn_depth_tpu.api.preprocess import resize_bicubic

        return resize_bicubic(img, out_h, out_w, a=a)
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((out_h, out_w, img.shape[2]), np.uint8)
    lib.bd_resize_bicubic_u8(img, img.shape[0], img.shape[1], img.shape[2], out, out_h, out_w, a)
    return out


def rgb_to_nchw_norm(rgb: np.ndarray) -> np.ndarray:
    """``[H,W,3] u8`` → ImageNet-normalized ``[3,H,W] f32``; numpy fallback."""
    lib = _load()
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    if lib is None:
        chw = (rgb.astype(np.float32) / 255.0).transpose(2, 0, 1)
        return (chw - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]
    out = np.empty((3, h, w), np.float32)
    lib.bd_rgb_to_nchw_norm(rgb, h, w, out, np.ascontiguousarray(IMAGENET_MEAN), np.ascontiguousarray(IMAGENET_STD))
    return out


def prepare_image_nchw(rgb: np.ndarray, target: int, a: float = CATMULL_ROM) -> np.ndarray:
    """Fused DA3 ingest (resize + center crop + normalize) → ``[3,T,T] f32``."""
    lib = _load()
    rgb = np.ascontiguousarray(rgb, np.uint8)
    if lib is None:
        from burn_depth_tpu.api.preprocess import prepare_depth_anything3_image

        prep = prepare_depth_anything3_image(rgb, target)
        return rgb_to_nchw_norm(prep.rgb)
    out = np.empty((3, target, target), np.float32)
    lib.bd_prepare_image_nchw(
        rgb, rgb.shape[0], rgb.shape[1], target, a, out,
        np.ascontiguousarray(IMAGENET_MEAN), np.ascontiguousarray(IMAGENET_STD),
    )
    return out


def resize_and_crop_u8(rgb: np.ndarray, target: int, a: float = CATMULL_ROM) -> np.ndarray:
    """Shortest-side resize + center crop, staying in u8 HWC (the u8-ingest
    serving lane: the normalize runs on device).  Native bicubic when built."""
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    if h == target and w == target:
        return rgb
    shortest = max(min(h, w), 1)
    scale = target / shortest
    sw = max(int(round(w * scale)), target)
    sh = max(int(round(h * scale)), target)
    resized = resize_bicubic_u8(rgb, sh, sw, a=a)
    cx, cy = (sw - target) // 2, (sh - target) // 2
    return np.ascontiguousarray(resized[cy : cy + target, cx : cx + target])
