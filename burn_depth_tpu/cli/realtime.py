"""Realtime streaming CLI (role of the reference's Bevy viewer,
``crates/bevy_burn_depth``): source frames → depth at live FPS, writing
normalized depth PNGs and printing the INFERENCE_FPS diagnostic."""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Realtime depth streaming")
    parser.add_argument("--model", default="depth-anything-3", choices=["depth-pro", "depth-anything-3"])
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument(
        "--source",
        default="synthetic",
        help="'synthetic', 'camera:N' (webcam index N, reference platform.rs:24-83), or a directory of images",
    )
    parser.add_argument("--frames", type=int, default=30, help="synthetic source length")
    parser.add_argument("--size", type=int, default=None, help="synthetic frame size (default 640x480)")
    parser.add_argument("--out-dir", default=None, help="write depth_NNNN.png frames here")
    parser.add_argument(
        "--prefetch", action="store_true",
        help="directory sources: decode+resize in native worker threads an "
             "ordered window ahead (api/native.ImageLoader)",
    )
    parser.add_argument(
        "--fast-jpeg", action="store_true",
        help="with --prefetch: DCT-scaled JPEG decode for oversized inputs "
             "(PIL draft-mode semantics; not bit-identical, much faster >=2x)",
    )
    args = parser.parse_args(argv)

    from burn_depth_tpu.api import AnyDepthModel, DepthModelKind, load_model
    from burn_depth_tpu.serve.realtime import (
        CameraSource,
        ImageDirSource,
        PrefetchedDirSource,
        SyntheticSource,
        run_realtime,
    )

    kind = DepthModelKind.from_str(args.model)
    if args.checkpoint:
        model = AnyDepthModel.load(kind, args.checkpoint)
    else:
        print("no --checkpoint: using random-init weights (smoke mode)", file=sys.stderr)
        model = load_model(kind)

    if args.source == "synthetic":
        s = args.size or 640
        source = SyntheticSource(s, max(s * 3 // 4, 1), args.frames)
    elif args.source.startswith("camera"):
        _, _, dev = args.source.partition(":")
        source = CameraSource(int(dev) if dev.isdigit() else (dev or 0))
    elif args.prefetch:
        kind_da3 = model.preferred_input_resolution() is not None
        target = model.preferred_input_resolution() or model.model.config.img_size
        source = PrefetchedDirSource(args.source, target, crop=kind_da3,
                                     fast_jpeg=args.fast_jpeg)
    else:
        source = ImageDirSource(args.source)

    sink = None
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
        from PIL import Image

        def sink(rf):
            Image.fromarray(rf.depth_u8, mode="L").save(
                os.path.join(args.out_dir, f"depth_{rf.index:04d}.png")
            )

    n = 0
    for rf in run_realtime(model, source, sink):
        n += 1
        print(f"frame {rf.index:4d}  depth {rf.depth_u8.shape}  fps={rf.fps:6.2f}", flush=True)
    print(f"processed {n} frames")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
