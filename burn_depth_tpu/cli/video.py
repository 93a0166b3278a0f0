"""Video depth: an ordered frame directory or a video file → a depth video.

    python -m burn_depth_tpu.cli.video clip.mp4 --checkpoint da3.safetensors \\
        --output depth.mp4 --ema 0.8 --scene-reset 0.5 --colormap turbo

Beyond-parity surface (the reference's realtime app displays raw per-frame
depth): frames run through the same batched one-in-flight pipeline as
``cli/batch.py``, then host-side temporal post-processing stabilizes the
sequence — EMA smoothing with scene-cut reset and flicker-free running
normalization (``utils/temporal.py``).  Output is an ``.mp4`` (OpenCV) or a
directory of PNG frames.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Iterator, Optional, Tuple

import numpy as np


def _dir_frames(path: str, size: int, crop: bool, threads: int, batch: int) -> Tuple[Optional[float], Iterator[np.ndarray]]:
    """Ordered directory frames via the native prefetch loader.  Returns
    ``(source_fps=None, frames)`` — directories carry no frame rate."""
    from burn_depth_tpu.api.native import ImageLoader, list_image_files

    files = list_image_files(path)  # the one canonical listing — no ext drift
    loader = ImageLoader(files, size, mode="u8", threads=threads, window=max(2 * batch, 4), crop=crop)
    return None, iter(loader)


def _video_frames(path: str, size: int, crop: bool) -> Tuple[Optional[float], Iterator[np.ndarray]]:
    """Video-file frames, prepped with the SAME geometry as the directory
    loader (``api/native``: CatmullRom shortest-side + center crop for DA3,
    square squash otherwise).  Returns ``(source_fps, frames)``."""
    try:
        import cv2
    except ImportError as e:  # pragma: no cover - cv2 is in the image
        raise RuntimeError("video-file input needs OpenCV (cv2); pass a frame directory instead") from e

    from burn_depth_tpu.api.native import resize_and_crop_u8, resize_bicubic_u8

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video {path}")
    src_fps = float(cap.get(cv2.CAP_PROP_FPS)) or None

    def gen() -> Iterator[np.ndarray]:
        while True:
            ok, bgr = cap.read()
            if not ok:
                break
            rgb = np.ascontiguousarray(bgr[:, :, ::-1])
            yield resize_and_crop_u8(rgb, size) if crop else resize_bicubic_u8(rgb, size, size)
        cap.release()

    return src_fps, gen()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="video file (mp4/avi/...) or directory of ordered frames")
    p.add_argument("--model", choices=["depth-pro", "depth-anything-3"], default="depth-anything-3")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", default="depth.mp4", help=".mp4 file or a directory for PNG frames")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--threads", type=int, default=4, help="native decode workers (directory input)")
    p.add_argument("--ema", type=float, default=0.8, help="temporal smoothing weight of history (0 = off)")
    p.add_argument("--scene-reset", type=float, default=0.5, help="mean-rel-diff scene-cut threshold (0 = never reset)")
    p.add_argument("--norm", choices=["running", "frame"], default="running", help="visualization normalization")
    p.add_argument("--norm-momentum", type=float, default=0.9)
    p.add_argument("--colormap", default="turbo", choices=["gray", "turbo"])
    p.add_argument(
        "--fps",
        type=float,
        default=None,
        help="output video frame rate (default: the source video's rate, else 24)",
    )
    args = p.parse_args(argv)

    import jax

    from burn_depth_tpu.api import AnyDepthModel, DepthModelKind, load_model
    from burn_depth_tpu.serve.step import with_u8_ingest
    from burn_depth_tpu.utils.colormap import apply_colormap
    from burn_depth_tpu.utils.temporal import RunningNormalizer, TemporalSmoother

    kind = DepthModelKind.from_str(args.model)
    if args.checkpoint:
        model = AnyDepthModel.load(kind, args.checkpoint)
    else:
        print("no --checkpoint: random-init weights (smoke mode)", file=sys.stderr)
        model = load_model(kind)

    inner = model.model
    kind_da3 = model.preferred_input_resolution() is not None
    size = model.preferred_input_resolution() or inner.config.img_size

    if os.path.isdir(args.input):
        src_fps, frames = _dir_frames(args.input, size, kind_da3, args.threads, args.batch)
    else:
        src_fps, frames = _video_frames(args.input, size, kind_da3)
    out_fps = args.fps or src_fps or 24.0

    def forward(params, x):
        if kind_da3:
            head_out, camera_pred, _ = inner._forward_internal(params, x, None, None)
            return inner._finalize(head_out, camera_pred).depth
        return inner._infer_fn(params, x).depth

    from burn_depth_tpu.core.knobs import kjit

    fn = kjit(with_u8_ingest(forward))

    smoother = TemporalSmoother(args.ema, args.scene_reset or None) if args.ema > 0 else None
    normalizer = RunningNormalizer(args.norm_momentum) if args.norm == "running" else None

    to_mp4 = args.output.lower().endswith((".mp4", ".avi", ".mkv"))
    writer = None
    if not to_mp4:
        os.makedirs(args.output, exist_ok=True)

    def emit(idx: int, depth: np.ndarray) -> None:
        nonlocal writer
        if smoother is not None:
            depth = smoother(depth)
        if normalizer is not None:
            norm = normalizer(depth)
        else:
            from burn_depth_tpu.cli.infer import normalize_to_u8

            norm = normalize_to_u8(depth) / 255.0
        rgb = apply_colormap(norm, args.colormap)
        if to_mp4:
            import cv2

            if writer is None:
                h, w = rgb.shape[:2]
                writer = cv2.VideoWriter(
                    args.output, cv2.VideoWriter_fourcc(*"mp4v"), out_fps, (w, h)
                )
                if not writer.isOpened():
                    raise RuntimeError(f"cannot open video writer for {args.output}")
            writer.write(rgb[:, :, ::-1])  # RGB → BGR
        else:
            from PIL import Image

            Image.fromarray(rgb).save(os.path.join(args.output, f"depth_{idx:06d}.png"))

    from burn_depth_tpu.serve.bulk import batched_depth_iter

    t0 = time.perf_counter()
    done = 0
    for idx, depth_i in batched_depth_iter(
        lambda x: fn(inner.params, x), frames, args.batch
    ):
        emit(idx, depth_i)
        done += 1

    if writer is not None:
        writer.release()
    dt = time.perf_counter() - t0
    resets = smoother.resets if smoother is not None else 0
    print(
        f"{done} frames -> {args.output} in {dt:.2f}s ({done / max(dt, 1e-9):.2f} fps, "
        f"{resets} scene reset(s))"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
