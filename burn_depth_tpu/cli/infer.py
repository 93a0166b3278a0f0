"""Inference CLI (reference ``example/inference.rs:17-297``).

Loads either model, runs one image, writes a normalized grayscale depth PNG
(cropped/restored to the original dimensions), prints intrinsics.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def resize_depth_field(values: np.ndarray, dst_h: int, dst_w: int) -> np.ndarray:
    """Half-pixel bilinear resize of a ``[H,W]`` f32 depth field — the CLI's
    own restore resize (reference ``inference.rs:183-250``), vectorized."""
    src_h, src_w = values.shape
    if (src_h, src_w) == (dst_h, dst_w):
        return values

    def axis(src, dst):
        if dst <= 1:
            coord = np.zeros(dst)
        else:
            coord = (np.arange(dst) + 0.5) * (src / dst) - 0.5
        i0 = np.clip(np.floor(coord), 0, src - 1).astype(np.int64)
        i1 = np.clip(i0 + 1, 0, src - 1)
        frac = (coord - i0).astype(np.float32)
        return i0, i1, frac

    y0, y1, fy = axis(src_h, dst_h)
    x0, x1, fx = axis(src_w, dst_w)
    top = values[y0][:, x0] * (1 - fx) + values[y0][:, x1] * fx
    bot = values[y1][:, x0] * (1 - fx) + values[y1][:, x1] * fx
    return top * (1 - fy[:, None]) + bot * fy[:, None]


def restore_depth_to_source(depth: np.ndarray, crop, orig_h: int, orig_w: int) -> np.ndarray:
    """Undo the model prep on a ``[H,W]`` field: crop the recorded region
    back out (when the prep set one), then half-pixel bilinear resize to the
    source dimensions.  Shared by the infer and multiview CLIs."""
    if crop is not None:
        depth = depth[crop.y : crop.y + crop.height, crop.x : crop.x + crop.width]
    if depth.shape != (orig_h, orig_w):
        depth = resize_depth_field(depth, orig_h, orig_w)
    return depth


def normalize_to_u8(depth: np.ndarray) -> np.ndarray:
    """Min/max normalize with non-finite handling (``inference.rs:145-167``)."""
    finite = depth[np.isfinite(depth)]
    if finite.size == 0:
        lo, hi = 0.0, 1.0
    else:
        lo, hi = float(finite.min()), float(finite.max())
    rng = max(hi - lo, np.finfo(np.float32).eps)
    norm = np.where(np.isfinite(depth), np.clip((depth - lo) / rng, 0.0, 1.0), 0.0)
    return np.clip(np.round(norm * 255.0), 0, 255).astype(np.uint8)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Monocular depth inference (TPU-native)")
    parser.add_argument("--model", default="depth-pro", choices=["depth-pro", "depth-anything-3"])
    parser.add_argument("--checkpoint", default=None, help="native or upstream checkpoint path")
    parser.add_argument("--image", required=True)
    parser.add_argument("--output", default=None, help="default: depth.png beside the input")
    parser.add_argument(
        "--pointcloud",
        default=None,
        metavar="OUT.ply",
        help="also write a colored metric point cloud (needs a focal length: "
        "predicted by Depth Pro, or given via --focal-px)",
    )
    parser.add_argument("--focal-px", type=float, default=None, help="override/provide focal length in pixels (at the output resolution)")
    parser.add_argument("--pc-stride", type=int, default=2, help="point-cloud pixel subsampling stride")
    parser.add_argument("--pc-max-depth", type=float, default=None, help="drop points beyond this depth")
    parser.add_argument("--colormap", default="gray", choices=["gray", "turbo"], help="depth PNG colormap")
    parser.add_argument(
        "--save-conf",
        default=None,
        metavar="OUT.png",
        help="write the per-pixel confidence map (DA3 dual-head models)",
    )
    parser.add_argument("--save-npy", default=None, metavar="OUT.npy", help="also write raw f32 metric depth")
    parser.add_argument(
        "--keep-aspect", action="store_true",
        help="DA3: aspect-preserving inference — shortest side to the model "
        "resolution, dims rounded to patch multiples, no center crop (no "
        "FOV discarded; each distinct shape compiles once)",
    )
    parser.add_argument(
        "--normals",
        default=None,
        metavar="OUT.png",
        help="also write camera-space surface normals (RGB-encoded; needs a focal length like --pointcloud)",
    )
    args = parser.parse_args(argv)

    from PIL import Image

    from burn_depth_tpu.api import AnyDepthModel, DepthModelKind, infer_from_rgb

    kind = DepthModelKind.from_str(args.model)
    checkpoint = args.checkpoint or kind.default_checkpoint()
    if not os.path.exists(checkpoint):
        print(
            f"Checkpoint `{checkpoint}` not found. Provide --checkpoint or run the "
            "appropriate importer first.",
            file=sys.stderr,
        )
        return 1
    model = AnyDepthModel.load(kind, checkpoint)

    image = np.asarray(Image.open(args.image).convert("RGB"))
    orig_h, orig_w = image.shape[:2]
    prep = model.prepare_input_image(image, keep_aspect=args.keep_aspect)

    result = infer_from_rgb(model, prep.rgb.tobytes(), prep.width, prep.height)
    depth = np.asarray(result.depth[0], dtype=np.float32)

    depth = restore_depth_to_source(depth, prep.crop, orig_h, orig_w)

    out_path = args.output or os.path.join(os.path.dirname(args.image) or ".", "depth.png")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    if args.colormap == "gray":
        Image.fromarray(normalize_to_u8(depth), mode="L").save(out_path)
    else:
        from burn_depth_tpu.utils.colormap import apply_colormap

        Image.fromarray(apply_colormap(normalize_to_u8(depth) / 255.0, args.colormap)).save(out_path)

    if args.save_npy is not None:
        os.makedirs(os.path.dirname(args.save_npy) or ".", exist_ok=True)
        np.save(args.save_npy, depth.astype(np.float32))

    if args.save_conf is not None:
        if result.confidence is None:
            print("--save-conf: this model emits no confidence map", file=sys.stderr)
            return 1
        conf = np.asarray(result.confidence[0], dtype=np.float32)
        if conf.shape != (orig_h, orig_w):
            conf = resize_depth_field(conf, orig_h, orig_w)
        os.makedirs(os.path.dirname(args.save_conf) or ".", exist_ok=True)
        Image.fromarray(normalize_to_u8(conf), mode="L").save(args.save_conf)
        print(f"Wrote confidence map to {args.save_conf}")

    # Focal lengths at the output raster, needed by --pointcloud / --normals.
    # The predicted focal is in pixels of the raster the model saw
    # (prep.width × prep.height); the depth map has since been resized to
    # (orig_h, orig_w) — anisotropic for DA3's square raster — so the two
    # axes rescale independently.  fy comes from the predicted vertical FOV
    # when available (DA3-small predicts fx and fy separately).
    focal = focal_y = args.focal_px
    if focal is None and result.focallength_px is not None:
        fx_raster = float(np.asarray(result.focallength_px).ravel()[0])
        fy_raster = fx_raster
        if result.fovy_rad is not None:
            fovy = float(np.asarray(result.fovy_rad).ravel()[0])
            tan_half = np.tan(fovy / 2.0)
            if np.isfinite(tan_half) and tan_half > 1e-8:
                fy_raster = (prep.height / 2.0) / tan_half
        focal = fx_raster * (orig_w / prep.width)
        focal_y = fy_raster * (orig_h / prep.height)

    if args.pointcloud is not None or args.normals is not None:
        if focal is None:
            print(
                "--pointcloud/--normals need a focal length, but this model "
                "predicts none and --focal-px was not given.",
                file=sys.stderr,
            )
            return 1

    if args.pointcloud is not None:
        from burn_depth_tpu.api.geometry import pointcloud_from_depth, write_ply

        pts, colors = pointcloud_from_depth(
            depth, focal, rgb=image, stride=args.pc_stride,
            max_depth=args.pc_max_depth, focal_y_px=focal_y,
        )
        os.makedirs(os.path.dirname(args.pointcloud) or ".", exist_ok=True)
        write_ply(args.pointcloud, pts, colors)
        print(f"Wrote {pts.shape[0]} points (focal {focal:.2f}/{focal_y:.2f} px) to {args.pointcloud}")

    if args.normals is not None:
        from burn_depth_tpu.api.geometry import intrinsics_from_focal, normals_from_depth

        k = intrinsics_from_focal(focal, orig_h, orig_w, focal_y_px=focal_y)
        n = np.asarray(normals_from_depth(np.asarray(depth, np.float32)[None], k)[0])
        rgb8 = np.clip(np.round((n * 0.5 + 0.5) * 255.0), 0, 255).astype(np.uint8)
        os.makedirs(os.path.dirname(args.normals) or ".", exist_ok=True)
        Image.fromarray(rgb8).save(args.normals)
        print(f"Wrote normals map to {args.normals}")

    if result.focallength_px is not None:
        print(f"Focal length (px): {np.asarray(result.focallength_px).tolist()}")
    else:
        print("Focal length (px): not provided by this model")
    if result.fovy_rad is not None:
        print(f"Vertical FOV (rad): {np.asarray(result.fovy_rad).tolist()}")
    else:
        print("Vertical FOV (rad): not provided by this model")
    print(f"Model `{kind.as_str}` wrote normalized depth map to {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
