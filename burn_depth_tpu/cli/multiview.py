"""Multi-view DA3 CLI: N images of ONE scene → per-view depth maps,
predicted camera poses, and a fused world-space point cloud.

Extension beyond the reference (its CLI is single-view,
``example/inference.rs:17-297``): drives ``DepthAnything3.infer_multiview``
(cross-view alternating attention, S>1) and the geometry consumers
(``api/geometry``).  All views run in ONE batched forward — the multi-view
set is the natural TPU batch.

Outputs under ``--outdir``:

* ``depth_NN.png`` — normalized depth per view, restored to the source
  image's dimensions (plus ``depth_NN.npy`` raw metric depth at the model
  raster with ``--save-npy``),
* ``poses.json`` — per-view predicted w2c extrinsics (3x4) and intrinsics
  (3x3, pixels of the model raster), plus the raster size they refer to,
* ``scene.ply`` — fused colored point cloud: each view's raster depth
  unprojected with its predicted intrinsics and carried to world space by
  its predicted extrinsics (disable with ``--no-pointcloud``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Multi-view depth + pose inference (DA3, cross-view attention)"
    )
    parser.add_argument("images", nargs="+", help="views of one scene, in order")
    parser.add_argument("--checkpoint", default=None, help="DA3 checkpoint (small variant: needs cross-view blocks)")
    parser.add_argument("--outdir", default="multiview_out")
    parser.add_argument("--no-pointcloud", action="store_true", help="skip the fused scene.ply")
    parser.add_argument("--pc-stride", type=int, default=2, help="point-cloud pixel subsampling stride")
    parser.add_argument("--pc-max-depth", type=float, default=None, help="drop points beyond this depth")
    parser.add_argument(
        "--min-conf-quantile", type=float, default=0.0,
        help="drop the lowest-confidence fraction of points (0 disables; needs a dual-head model)",
    )
    parser.add_argument("--colormap", default="gray", choices=["gray", "turbo"])
    parser.add_argument("--save-npy", action="store_true", help="also write raw f32 raster depth per view")
    args = parser.parse_args(argv)

    from PIL import Image

    from burn_depth_tpu.api import AnyDepthModel, DepthModelKind, rgb_to_input_tensor
    from burn_depth_tpu.cli.infer import normalize_to_u8

    kind = DepthModelKind.DEPTH_ANYTHING3
    checkpoint = args.checkpoint or kind.default_checkpoint()
    if not os.path.exists(checkpoint):
        print(
            f"Checkpoint `{checkpoint}` not found. Provide --checkpoint or run the "
            "DA3 importer first.",
            file=sys.stderr,
        )
        return 1
    model = AnyDepthModel.load(kind, checkpoint).model
    if getattr(model.config.backbone_config(), "alt_block_start", None) is None:
        print(
            "This DA3 backbone has no cross-view (alternating) blocks — "
            "multi-view inference needs a DA3-small variant checkpoint.",
            file=sys.stderr,
        )
        return 1
    if args.min_conf_quantile > 0.0 and not getattr(model.config.head, "dual_head", False):
        # fail BEFORE the forward and before any file is written
        print("--min-conf-quantile: this model emits no confidence map", file=sys.stderr)
        return 1

    import jax.numpy as jnp

    # One batched [1, S, 3, H, W] forward over all views.
    preps, sources, tensors = [], [], []
    for path in args.images:
        img = np.asarray(Image.open(path).convert("RGB"))
        prep = model_prepare(model, img)
        preps.append(prep)
        sources.append(img)
        tensors.append(rgb_to_input_tensor(prep.rgb.tobytes(), prep.width, prep.height))
    x = jnp.stack(tensors, axis=1)  # [1, S, 3, H, W]
    inf = model.infer_multiview(x)

    if inf.extrinsics is None or inf.intrinsics is None:
        print("This DA3 checkpoint predicts no camera — cannot fuse views.", file=sys.stderr)
        return 1

    s_views = len(args.images)
    raster = model.img_size
    depth = np.asarray(inf.depth[0], np.float32)  # [S, H, W]
    conf = None if inf.depth_confidence is None else np.asarray(inf.depth_confidence[0], np.float32)
    extr = np.asarray(inf.extrinsics[0], np.float32).reshape(s_views, 3, 4)
    intr = np.asarray(inf.intrinsics[0], np.float32).reshape(s_views, 3, 3)

    os.makedirs(args.outdir, exist_ok=True)
    poses = {"raster": [raster, raster], "views": []}
    for i, path in enumerate(args.images):
        restored = _restore(depth[i], preps[i], sources[i].shape[:2])
        out_png = os.path.join(args.outdir, f"depth_{i:02d}.png")
        if args.colormap == "gray":
            Image.fromarray(normalize_to_u8(restored), mode="L").save(out_png)
        else:
            from burn_depth_tpu.utils.colormap import apply_colormap

            Image.fromarray(apply_colormap(normalize_to_u8(restored) / 255.0, args.colormap)).save(out_png)
        if args.save_npy:
            np.save(os.path.join(args.outdir, f"depth_{i:02d}.npy"), depth[i])
        poses["views"].append(
            {
                "image": os.path.basename(path),
                "extrinsics_w2c": extr[i].tolist(),
                "intrinsics_px": intr[i].tolist(),
            }
        )
    poses_path = os.path.join(args.outdir, "poses.json")
    with open(poses_path, "w") as f:
        json.dump(poses, f, indent=1)

    n_pts = 0
    if not args.no_pointcloud:
        from burn_depth_tpu.api.geometry import camera_to_world, unproject_depth, write_ply

        cam_pts = np.asarray(unproject_depth(jnp.asarray(depth), jnp.asarray(intr)), np.float32)
        world = np.asarray(camera_to_world(jnp.asarray(cam_pts), jnp.asarray(extr)), np.float32)
        st = max(args.pc_stride, 1)
        pts = world[:, ::st, ::st].reshape(-1, 3)
        cols = np.stack([p.rgb for p in preps])[:, ::st, ::st].reshape(-1, 3)
        d = depth[:, ::st, ::st].ravel()
        keep = np.isfinite(d) & (d > 0.0) & np.isfinite(pts).all(axis=-1)
        if args.pc_max_depth is not None:
            keep &= d <= args.pc_max_depth
        if args.min_conf_quantile > 0.0:
            c = conf[:, ::st, ::st].ravel()
            keep &= c >= np.quantile(c[np.isfinite(c)], args.min_conf_quantile)
        ply_path = os.path.join(args.outdir, "scene.ply")
        write_ply(ply_path, pts[keep], cols[keep])
        n_pts = int(keep.sum())
        print(f"Fused {s_views} views into {n_pts} world-space points: {ply_path}")

    print(f"Wrote {s_views} depth maps + {poses_path}")
    return 0


def model_prepare(model, image: np.ndarray):
    """Square-raster DA3 prep (shortest-side resize + center crop)."""
    from burn_depth_tpu.api.preprocess import prepare_depth_anything3_image

    return prepare_depth_anything3_image(image, model.img_size)


def _restore(depth: np.ndarray, prep, orig_hw) -> np.ndarray:
    """Undo the square-raster prep (shared restore helper from the infer CLI)."""
    from burn_depth_tpu.cli.infer import restore_depth_to_source

    return restore_depth_to_source(depth, prep.crop, orig_hw[0], orig_hw[1])


if __name__ == "__main__":
    raise SystemExit(main())
