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

# Extensions the decode lane supports (native libjpeg/libpng/PPM and the
# PIL fallback agree on this set).
IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".ppm")


def list_image_files(path) -> list:
    """Sorted decodable image files directly under ``path``.

    The one canonical directory-listing used by every image-directory
    surface (batch CLI, realtime prefetch source, ``stream_image_dir``) so
    the supported-extension set cannot drift between them.
    """
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.lower().endswith(IMAGE_EXTS)
    )
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    return files


_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libburn_depth_host.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False
_load_error: Optional[str] = None  # last dlopen/bind failure, for diagnostics

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed, _load_error
    if _lib is not None or _load_failed:
        return _lib
    path = os.environ.get("BURN_DEPTH_NATIVE_LIB", os.path.abspath(_LIB_PATH))
    try:
        lib = ctypes.CDLL(path)
    except OSError as e:
        # cache the failure (don't re-dlopen on every hot-path call) but keep
        # the reason and let reload() retry: a dlopen failure can be
        # TRANSIENT (fd exhaustion under a big test session, memory
        # pressure), and a permanently poisoned flag turns one hiccup into
        # "native lane disabled for the rest of the process".
        _load_failed = True
        _load_error = str(e)
        return None
    try:
        _bind_symbols(lib)
    except AttributeError:
        # a .so from before the loader ABI existed: degrade to the pure
        # -Python fallbacks instead of crashing every native entry point
        import warnings

        warnings.warn(
            f"{path} predates the loader ABI (missing symbols) — native lane "
            "disabled; rebuild with `make -C native`",
            stacklevel=2,
        )
        _load_failed = True
        _load_error = f"{path}: missing loader-ABI symbols (stale build)"
        return None
    _lib = lib
    return _lib


def _bind_symbols(lib: ctypes.CDLL) -> None:
    lib.bd_resize_bicubic_u8.argtypes = [
        _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
    ]
    lib.bd_rgb_to_nchw_norm.argtypes = [_u8p, ctypes.c_int, ctypes.c_int, _f32p, _f32p, _f32p]
    lib.bd_prepare_image_nchw.argtypes = [
        _u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double, _f32p, _f32p, _f32p,
    ]
    lib.bd_version.restype = ctypes.c_int
    lib.bd_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, _f32p, _f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.bd_loader_create.restype = ctypes.c_void_p
    lib.bd_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
    ]
    lib.bd_loader_next.restype = ctypes.c_longlong  # 64-bit: loop mode can pass 2^31 items
    lib.bd_loader_destroy.argtypes = [ctypes.c_void_p]


def available() -> bool:
    return _load() is not None


def load_error() -> Optional[str]:
    """The last load failure's message (None when loaded or never tried)."""
    return _load_error


def reload() -> bool:
    """Clear the cached load failure and retry the dlopen.  Returns
    availability.  Use after rebuilding the .so, or to recover from a
    transient dlopen failure (fd/memory pressure) that ``_load`` cached."""
    global _lib, _load_failed, _load_error
    _lib = None
    _load_failed = False
    _load_error = None
    return available()


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
    from burn_depth_tpu.api.preprocess import round_half_away

    shortest = max(min(h, w), 1)
    scale = target / shortest
    sw = max(round_half_away(w * scale), target)
    sh = max(round_half_away(h * scale), target)
    resized = resize_bicubic_u8(rgb, sh, sw, a=a)
    cx, cy = (sw - target) // 2, (sh - target) // 2
    return np.ascontiguousarray(resized[cy : cy + target, cx : cx + target])


class ImageLoader:
    """Ordered, prefetching image loader (native decode lane).

    ``paths`` → per-image arrays at a canonical square ``target``: mode
    ``"u8"`` = shortest-side resize + center crop, ``[T,T,3] u8`` (the
    serving u8-ingest lane); mode ``"nchw"`` = fused resize + crop +
    ImageNet-normalize, ``[3,T,T] f32`` (the training ingest lane).

    Native path: ``native/loader.cc`` — N decode workers (libjpeg/libpng/PPM)
    behind an order-preserving bounded window, the same CatmullRom kernels as
    the numpy oracle bit-for-bit.  Fallback: PIL + a thread pool with the
    identical ordering/window contract, so callers never branch.

    Iteration yields arrays in path order; a decode failure raises
    ``RuntimeError`` naming the cause (the stream remains usable).  With
    ``loop=True`` iteration never ends (epoch cycling for training).
    """

    def __init__(self, paths, target: int, mode: str = "u8", *, threads: int = 4,
                 window: int = 8, a: float = CATMULL_ROM, loop: bool = False,
                 crop: bool = True, fast_jpeg: bool = False, exif_rotate: bool = True):
        if mode not in ("u8", "nchw"):
            raise ValueError(f"mode must be 'u8' or 'nchw', got {mode!r}")
        self.paths = [os.fspath(p) for p in paths]
        if not self.paths:
            raise ValueError("no paths")
        self.target = int(target)
        self.mode = mode
        self.loop = loop
        self.crop = crop  # True = shortest-side + center crop (DA3 prep);
        # False = squash resize, full frame preserved (Depth Pro ingest —
        # its canonical path squash-resizes in-graph, never crops FOV away)
        # fast_jpeg: DCT-domain downscaled JPEG decode (the PIL ``draft()``
        # trick) — decodes oversized JPEGs at the largest 1/{2,4,8} scale
        # whose shortest side still covers ``target``.  NOT bit-identical to
        # the exact lane for JPEGs that trigger it; opt-in throughput knob
        # for >=2x-oversized ingest (4K -> 518² decodes 1/16 of the pixels).
        self.fast_jpeg = fast_jpeg
        # exif_rotate (default ON): honor the JPEG EXIF orientation tag —
        # camera files are stored sensor-native and marked for rotation;
        # without this the model sees sideways frames.  Both lanes apply it
        # (native: APP1 parser in loader.cc; fallback: ImageOps.exif_transpose).
        self.exif_rotate = exif_rotate
        self._handle = None
        self._fallback = None
        lib = _load()
        if lib is not None:
            if lib.bd_version() < 3:
                import warnings

                warnings.warn("stale libburn_depth_host.so (< v3): fast_jpeg/"
                              "exif_rotate ignored — rebuild with `make -C native`",
                              stacklevel=2)
            arr = (ctypes.c_char_p * len(self.paths))(*[p.encode() for p in self.paths])
            self._handle = lib.bd_loader_create(
                arr, len(self.paths), self.target, 0 if mode == "u8" else 1,
                a, np.ascontiguousarray(IMAGENET_MEAN), np.ascontiguousarray(IMAGENET_STD),
                threads, window, int(loop), int(crop), int(fast_jpeg), int(exif_rotate),
            )
            if not self._handle:
                raise RuntimeError("bd_loader_create failed")
            self._lib = lib
        else:
            import concurrent.futures

            self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=max(1, threads))
            self._window = max(1, window)
            self._a = a
            self._fallback = self._fallback_iter()

    # -- fallback (PIL + thread pool, same ordering/window contract) --------

    def _decode_one(self, path: str) -> np.ndarray:
        from PIL import Image

        img = Image.open(path)
        if self.fast_jpeg and img.format == "JPEG":
            # PIL draft: the same DCT-scale trick as the native lane — decode
            # at >= target on the shortest side.  draft() scales both dims by
            # the same 1/{2,4,8} factor, so asking for (target, target)
            # guarantees min(h, w) >= target.  Must run BEFORE exif_transpose
            # (draft configures the decoder; transpose triggers the decode).
            img.draft("RGB", (self.target, self.target))
        if self.exif_rotate and img.format == "JPEG":
            from PIL import ImageOps

            img = ImageOps.exif_transpose(img)
        rgb = np.asarray(img.convert("RGB"))
        if not self.crop and rgb.shape[:2] != (self.target, self.target):
            rgb = resize_bicubic_u8(rgb, self.target, self.target, a=self._a)
        if self.mode == "u8":
            return resize_and_crop_u8(rgb, self.target, a=self._a)
        return prepare_image_nchw(rgb, self.target, a=self._a)

    def _path_stream(self):
        while True:
            yield from self.paths
            if not self.loop:
                return

    def _fallback_iter(self):
        """Yields ('ok', array) or ('err', msg) so one failed decode does not
        kill the generator — matching the native stream-continues contract."""
        import collections

        def result_of(fut):
            try:
                return ("ok", fut.result())
            except Exception as e:
                return ("err", str(e))

        futures = collections.deque()
        try:
            for p in self._path_stream():
                futures.append(self._pool.submit(self._decode_one, p))
                if len(futures) >= self._window:
                    yield result_of(futures.popleft())
            while futures:
                yield result_of(futures.popleft())
        finally:
            for f in futures:
                f.cancel()

    # -- iteration ------------------------------------------------------------

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._fallback is not None:
            status, payload = next(self._fallback)
            if status == "err":
                raise RuntimeError(f"decode failed: {payload}")
            return payload
        if self._handle is None:
            raise StopIteration
        if self.mode == "u8":
            out = np.empty((self.target, self.target, 3), np.uint8)
        else:
            out = np.empty((3, self.target, self.target), np.float32)
        errbuf = ctypes.create_string_buffer(512)
        rc = self._lib.bd_loader_next(
            self._handle, out.ctypes.data_as(ctypes.c_void_p), errbuf, len(errbuf)
        )
        if rc == -1:
            raise StopIteration
        if rc == -2:
            raise RuntimeError(f"decode failed: {errbuf.value.decode(errors='replace')}")
        return out

    def close(self) -> None:
        if self._handle is not None:
            self._lib.bd_loader_destroy(self._handle)
            self._handle = None
        if self._fallback is not None:
            self._fallback.close()
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._fallback = None

    def __enter__(self) -> "ImageLoader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
