"""Evaluation CLI: score a checkpoint with the standard depth metric battery.

    python -m burn_depth_tpu.cli.evaluate --model depth-pro --preset tiny \\
        --checkpoint ft.safetensors --batches 8            # synthetic set
    python -m burn_depth_tpu.cli.evaluate --model depth-anything-3 \\
        --checkpoint da3.safetensors --data pairs/ --align

Prints one ``metric=value`` line (Eigen battery: abs-rel, sq-rel, RMSE,
log-RMSE, log10, delta<1.25^k, SiLog).  ``--align`` applies the per-image
affine-alignment protocol used for relative-depth models.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Evaluate a depth checkpoint")
    parser.add_argument("--model", default="depth-pro", choices=["depth-pro", "depth-anything-3"])
    parser.add_argument("--preset", default="tiny", choices=["tiny", "full"])
    parser.add_argument(
        "--variant", default="auto", choices=["auto", "small", "metric-large"],
        help="DA3 config variant; auto = detect from the checkpoint",
    )
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--data", default=None, help="dir of *_rgb.png/*_depth.npy pairs; default synthetic")
    parser.add_argument(
        "--dataset", default="pairs", choices=["pairs", "kitti", "nyu"],
        help="with --data: 'pairs' = *_rgb.png/*_depth.npy dumps; 'kitti'/'nyu' "
        "= standard benchmark layout (image/+depth/ subdirs, 16-bit depth "
        "PNGs) scored with the published protocol — depth decode scale, "
        "validity caps, Eigen eval crop, prediction upsampled to native GT "
        "resolution (train/datasets.py)",
    )
    parser.add_argument("--depth-scale", type=float, default=None,
                        help="override the dataset's PNG-to-meters divisor")
    parser.add_argument(
        "--split", default=None,
        help="with --dataset kitti|nyu: restrict to a standard split — a "
        "BTS/monodepth-style file list ('rgb_rel gt_rel [focal]' per line, "
        "resolved against --data / --gt-root), or for the NYU .mat archive "
        "the official splits.mat (testNdxs) / a text file of 0-based indices",
    )
    parser.add_argument(
        "--gt-root", default=None,
        help="with --split: root the split's GT paths resolve against "
        "(default --data; train/+val/ of the annotated-depth archive are "
        "searched automatically)",
    )
    parser.add_argument(
        "--batches", type=int, default=None,
        help="max batches to score (default: 8 for the endless synthetic/"
        "pairs generators; the FULL split for --dataset kitti|nyu)",
    )
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--align", action="store_true", help="affine-align predictions per image before scoring")
    parser.add_argument(
        "--boundary", action="store_true",
        help="add the occlusion-boundary F1 (Depth Pro paper's sharpness "
        "metric) to the battery — dense GT only (NYU, synthetic); "
        "meaningless on sparse LiDAR",
    )
    parser.add_argument(
        "--views", type=int, default=1,
        help="multi-view DA3: score scene dirs (cli/train schema) through "
        "cross-view inference; adds pose metrics when scenes carry poses.json",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args = parser.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from burn_depth_tpu.cli.train import _build_model, _image_dir_batches, build_predict_fn
    from burn_depth_tpu.train import evaluate_model, synthetic_depth_batches

    model, _loss, size = _build_model(args)
    params = model.params
    # full serving semantics (incl. Depth Pro's FOV-derived focal scaling) —
    # shared with the train CLI so the metric definition cannot drift
    predict = build_predict_fn(model, args.model)

    if args.views > 1:
        return _evaluate_multiview(args, model, size)

    benchmark = args.dataset != "pairs"
    # endless generators need a cap; the benchmark split is finite — score
    # ALL of it unless the user explicitly bounds it
    max_batches = args.batches if args.batches is not None else (None if benchmark else 8)
    if benchmark:
        if not args.data:
            print(f"--dataset {args.dataset} requires --data ROOT", file=sys.stderr)
            return 1
        from burn_depth_tpu.train.datasets import benchmark_eval_batches

        gen = benchmark_eval_batches(
            args.data, size, dataset=args.dataset, batch=args.batch,
            # DA3: aspect-preserving full-frame ingest (a center crop would
            # score ~30% of a KITTI frame); Depth Pro squash-resizes and
            # predicts full-frame natively.
            ingest="aspect" if args.model == "depth-anything-3" else "squash",
            patch=getattr(model, "patch_size", 14),
            depth_scale=args.depth_scale,
            split=args.split, gt_root=args.gt_root,
        )
    elif args.data:
        gen = _image_dir_batches(args.data, args.batch, size)
    else:
        gen = synthetic_depth_batches(args.seed, args.batch, size, steps=max_batches)
    scores = evaluate_model(
        lambda img: predict(params, jnp.asarray(img)),
        gen,
        align=args.align,
        max_batches=max_batches,
        # published benchmark averaging: per-image metrics, equal weight
        per_image=benchmark,
        boundary=args.boundary,
    )
    print(" ".join(f"{k}={v:.4f}" for k, v in sorted(scores.items())), flush=True)
    return 0


def _evaluate_multiview(args, model, size: int) -> int:
    """Score scene batches through cross-view inference: depth battery on the
    flat views (+ camera-pose battery vs poses.json targets when present),
    via ``evaluate_model``'s aux hook — one shared accumulation loop."""
    import jax
    import jax.numpy as jnp

    from burn_depth_tpu.cli.train import _scene_dir_batches
    from burn_depth_tpu.train import evaluate_model, pose_metrics, synthetic_depth_batches

    if args.model != "depth-anything-3":
        print("--views>1 is a DA3 (cross-view attention) feature", file=sys.stderr)
        return 1
    if args.batch % args.views:
        print(f"--batch {args.batch} not divisible by --views {args.views}", file=sys.stderr)
        return 1
    if args.data:
        gen = _scene_dir_batches(args.data, args.batch // args.views, args.views, size)
    else:
        gen = synthetic_depth_batches(args.seed, args.batch, size, steps=args.batches or 8)

    views = args.views

    from burn_depth_tpu.core.knobs import kjit

    @kjit
    def predict_mv(flat):
        head_out, camera, _ = model._forward_internal(
            model.params, flat, None, None, views=views
        )
        inf = model._finalize(head_out, camera)
        extr = None if inf.extrinsics is None else inf.extrinsics.reshape(-1, 3, 4)
        return inf.depth, extr

    # gauge-canonicalized comparison: SfM targets carry an arbitrary
    # per-scene world frame/scale — fix both sides to the first view
    pose_fn = kjit(lambda p, t: pose_metrics(p, t, views=views))

    def pose_battery(extr, batch):
        if extr is None or "extrinsics" not in batch:
            return {}
        return pose_fn(extr, jnp.asarray(batch["extrinsics"]))

    scores = evaluate_model(
        lambda img: predict_mv(jnp.asarray(img)),
        gen,
        align=args.align,
        max_batches=args.batches or 8,
        extra_metrics=pose_battery,
    )
    print(" ".join(f"{k}={v:.4f}" for k, v in sorted(scores.items())), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
