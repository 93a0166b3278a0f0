"""Fine-tuning CLI (beyond-parity: the reference framework is inference-only).

Runs the sharded train step (``burn_depth_tpu/train/``) on either model
family.  Without a dataset it trains on the built-in synthetic geometric
depth set, which makes it a self-contained end-to-end demo/smoke:

    python -m burn_depth_tpu.cli.train --model depth-pro --preset tiny \\
        --steps 20 --batch 2 --out /tmp/ft.safetensors

Real fine-tuning: start from an imported checkpoint (``--checkpoint``) and
point ``--data`` at a directory of paired ``*_rgb.png`` / ``*_depth.npy``
files — or at a standard benchmark tree directly::

    python -m burn_depth_tpu.cli.train --model depth-anything-3 --preset full \\
        --checkpoint da3.safetensors --data kitti:/data/kitti_eigen_train \\
        --eval-data kitti:/data/kitti_eigen_test --eval-batches 100

``kitti:ROOT`` / ``nyu:ROOT`` read the benchmark layout (``image/`` +
``depth/`` 16-bit PNGs) with the published decode scale and validity caps
(``train/datasets.py::benchmark_train_batches``); an ``--eval-data`` with
the same prefix scores through the full published protocol (full-frame
ingest, native-GT-resolution metrics, per-image averaging).

``--resume`` continues from a saved train state (params + Adam
moments + step counter — one safetensors file, ``io/checkpoint.py``).
State/param paths ending in ``.orbax`` (or existing directories) use the
Orbax directory format instead (``io/orbax_io.py``) — same strict
structure checks, sharding-aware restore.

Long fine-tunes: ``--ckpt-dir`` turns on the Orbax ``CheckpointManager`` —
periodic async train-state saves every ``--ckpt-every`` steps with
``--ckpt-keep`` retention, and automatic resume from the latest step when
the run restarts (no flags to remember; ``--resume`` overrides).
"""

from __future__ import annotations

import argparse
import sys
import time


def _build_model(args):
    import jax
    import jax.numpy as jnp

    if args.model == "depth-pro":
        from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

        import dataclasses

        cfg = (
            DepthProConfig.tiny_test()
            if args.preset == "tiny"
            else DepthProConfig.dinov2_l16_384()
        )
        if getattr(args, "tile_chunks", 0):
            cfg = dataclasses.replace(cfg, tile_chunks=args.tile_chunks)
        if args.checkpoint:
            model = DepthPro.load_with_config(args.checkpoint, cfg)
        else:
            model = DepthPro.init(jax.random.PRNGKey(args.seed), cfg, dtype=jnp.float32)
        from burn_depth_tpu.train import depth_pro_objective

        return model, depth_pro_objective(model, fov_weight=0.0), cfg.img_size
    else:
        import dataclasses

        from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

        # --variant: "small" (dual head) / "metric-large" (mono) / "auto" =
        # registry fallback-retry on the checkpoint (filename hints included),
        # small when training from scratch.
        variant = getattr(args, "variant", "auto")
        base = (
            DepthAnything3Config.metric_large()
            if variant == "metric-large"
            else DepthAnything3Config.small()
        )
        if args.preset == "tiny":
            cfg = dataclasses.replace(base, image_size=112, attn_impl="jnp")
            model = (
                DepthAnything3.load(args.checkpoint, cfg)
                if args.checkpoint
                else DepthAnything3.init(jax.random.PRNGKey(args.seed), cfg)
            )
        elif args.checkpoint:
            model = DepthAnything3.load(
                args.checkpoint, None if variant == "auto" else base
            )
            cfg = model.config
        else:
            cfg = base
            model = DepthAnything3.init(jax.random.PRNGKey(args.seed), cfg)
        from burn_depth_tpu.train import da3_objective

        return model, da3_objective(model), cfg.image_size


def build_predict_fn(model, model_name: str, views: int = 1):
    """Jitted ``(params, image) -> depth [B,H,W]`` with full serving semantics.

    For Depth Pro this is ``_infer_fn`` — canonical inverse depth scaled by
    the FOV-derived focal length, then inverted — NOT a bare inversion of the
    canonical output (the two differ by ``focal_px/width`` per image, which
    would silently skew every metric).  Shared by the train and evaluate
    CLIs so the definition cannot drift.
    """
    import jax

    from burn_depth_tpu.core.knobs import kjit

    if model_name == "depth-pro":
        return kjit(lambda p, x: model._infer_fn(p, x).depth)
    # views > 1: cross-view DA3 forward over the flat scenes·views batch
    return kjit(
        lambda p, x: model._finalize(
            model._forward_internal(p, x, None, None, views=views)[0], None
        ).depth
    )


def _resize_and_crop_depth(dep, size: int):
    """Apply the SAME geometry to the depth map as the RGB ingest (shortest
    -side resize + center crop) so pixel i,j stays paired; bilinear for the
    GT values (interpolating metric depth bicubically can overshoot)."""
    import numpy as np
    from PIL import Image

    from burn_depth_tpu.api.preprocess import round_half_away

    h, w = dep.shape
    if (h, w) == (size, size):
        return dep
    scale = size / max(min(h, w), 1)
    sw = max(round_half_away(w * scale), size)
    sh = max(round_half_away(h * scale), size)
    resized = np.asarray(Image.fromarray(dep).resize((sw, sh), Image.BILINEAR), np.float32)
    cy, cx = (sh - size) // 2, (sw - size) // 2
    return resized[cy : cy + size, cx : cx + size]


def _image_dir_batches(path: str, batch: int, size: int):
    """Paired ``*_rgb.png`` / ``*_depth.npy`` loader, cycled.

    RGB ingest rides the native threaded loader (``api/native.ImageLoader``,
    mode ``nchw``): decode workers + an ordered prefetch window ahead of the
    train step, with the SAME preprocessing the model sees at inference
    (shortest-side CatmullRom resize, center crop, ImageNet normalize) — a
    fine-tune fed [0,1] squash-resized images would train on a distribution
    the serving path never produces.
    """
    import glob
    import os

    import numpy as np

    from burn_depth_tpu.api.native import ImageLoader

    rgbs = sorted(glob.glob(os.path.join(path, "*_rgb.png")))
    if not rgbs:
        raise FileNotFoundError(f"no *_rgb.png files under {path}")
    pairs = []
    for r in rgbs:
        d = r.replace("_rgb.png", "_depth.npy")
        if os.path.exists(d):
            pairs.append((r, d))
    if not pairs:
        raise FileNotFoundError(f"no *_depth.npy pairs under {path}")

    loader = ImageLoader(
        [r for r, _ in pairs], size, mode="nchw", loop=True,
        threads=4, window=max(2 * batch, 4),
    )
    i = 0
    while True:
        imgs, deps = [], []
        for _ in range(batch):
            imgs.append(next(loader))
            dep = np.load(pairs[i % len(pairs)][1]).astype(np.float32)
            deps.append(_resize_and_crop_depth(dep, size))
            i += 1
        deps_np = np.stack(deps)
        yield {
            "image": np.stack(imgs),
            "depth": deps_np,
            "mask": (deps_np > 0).astype(np.float32),
        }


def _scene_dir_batches(
    path: str, scenes_per_batch: int, views: int, size: int,
    require_poses: bool = False,
):
    """Multi-view scene loader, cycled: ``scene_*/view_*_rgb.png`` +
    ``view_*_depth.npy`` (+ optional ``poses.json``) → flat batches in the
    ``[scenes·views, ...]`` layout the multi-view objective expects.

    ``poses.json`` uses the SAME schema ``cli/multiview.py`` writes
    (``{"raster": [r, r], "views": [{"extrinsics_w2c", "intrinsics_px"}]}``),
    so pose targets from SfM or from the model's own predictions round-trip.
    Intrinsics are rescaled from the recorded raster to the training raster;
    extrinsics are raster-independent.  Camera targets are emitted only when
    EVERY scene in the run carries poses (a mixed dataset would silently
    supervise half the batch with garbage).
    """
    import glob
    import json
    import os

    import numpy as np

    from burn_depth_tpu.api.native import ImageLoader

    scene_dirs = sorted(
        d for d in glob.glob(os.path.join(path, "*")) if os.path.isdir(d)
    )
    scenes = []
    for d in scene_dirs:
        rgbs = sorted(glob.glob(os.path.join(d, "*_rgb.png")))[:views]
        if len(rgbs) < views:
            continue
        deps = [r.replace("_rgb.png", "_depth.npy") for r in rgbs]
        if not all(os.path.exists(p) for p in deps):
            continue
        poses = None
        pj = os.path.join(d, "poses.json")
        if os.path.exists(pj):
            with open(pj) as f:
                meta = json.load(f)
            if len(meta["views"]) < views:
                raise ValueError(
                    f"{pj}: {len(meta['views'])} pose entries < {views} views"
                )
            # entries pair with the SORTED rgb list positionally; when the
            # schema records image names, mismatched ordering (e.g. view_10
            # sorting before view_2) must fail loudly, not silently
            # supervise the wrong images.
            for entry, rgb in zip(meta["views"][:views], rgbs):
                name = entry.get("image")
                if name is not None and name != os.path.basename(rgb):
                    raise ValueError(
                        f"{pj}: pose entry for {name!r} paired with "
                        f"{os.path.basename(rgb)!r} — order poses.json views "
                        "to match the sorted *_rgb.png names"
                    )
            k_scale = size / float(meta["raster"][0])
            ex, ks = [], []
            for v in meta["views"][:views]:
                ex.append(np.asarray(v["extrinsics_w2c"], np.float32))
                k = np.asarray(v["intrinsics_px"], np.float32).copy()
                k[:2] *= k_scale  # fx/fy/cx/cy follow the raster rescale
                ks.append(k)
            poses = (np.stack(ex), np.stack(ks))
        scenes.append((rgbs, deps, poses))
    if not scenes:
        raise FileNotFoundError(
            f"no scene dirs with {views}x (*_rgb.png + *_depth.npy) under {path}"
        )
    with_poses = all(s[2] is not None for s in scenes)
    if require_poses and not with_poses:
        missing = [
            os.path.basename(os.path.dirname(s[0][0])) for s in scenes if s[2] is None
        ]
        raise FileNotFoundError(
            f"pose supervision requested but scenes lack poses.json: {missing[:5]}"
        )

    flat_rgbs = [r for rgbs, _, _ in scenes for r in rgbs]
    loader = ImageLoader(
        flat_rgbs, size, mode="nchw", loop=True,
        threads=4, window=max(2 * scenes_per_batch * views, 4),
    )
    i = 0
    n = len(scenes)
    while True:
        imgs, deps, exs, ks = [], [], [], []
        for _ in range(scenes_per_batch):
            _, dep_paths, poses = scenes[i % n]
            for d in dep_paths:
                imgs.append(next(loader))
                dep = np.load(d).astype(np.float32)
                deps.append(_resize_and_crop_depth(dep, size))
            if with_poses:
                exs.append(poses[0])
                ks.append(poses[1])
            i += 1
        deps_np = np.stack(deps)
        batch = {
            "image": np.stack(imgs),
            "depth": deps_np,
            "mask": (deps_np > 0).astype(np.float32),
        }
        if with_poses:
            batch["extrinsics"] = np.concatenate(exs)  # [scenes·views, 3, 4]
            batch["intrinsics"] = np.concatenate(ks)
        yield batch


def _parse_data_spec(data):
    """``"kitti:ROOT"``/``"nyu:ROOT"`` -> ``(dataset, root)``; anything else
    is a plain paired-file directory -> ``("pairs", data)``.  Only the known
    dataset names are treated as prefixes, so paths containing ``:`` (or
    odd relative paths) pass through untouched."""
    for name in ("kitti", "nyu", "images"):
        if data.startswith(name + ":"):
            return name, data[len(name) + 1 :]
    return "pairs", data


def _image_only_batches(path: str, batch: int, size: int):
    """Unlabeled ingest for distillation: any directory of images, cycled
    through the native loader with the serving-geometry square crop.  The
    batches carry only ``image``; ``pseudo_label_batches`` fills the rest."""
    import numpy as np

    from burn_depth_tpu.api.native import ImageLoader, list_image_files

    files = list_image_files(path)
    if not files:
        raise FileNotFoundError(f"no image files under {path}")
    loader = ImageLoader(
        files, size, mode="nchw", loop=True, threads=4, window=max(2 * batch, 4)
    )
    while True:
        yield {"image": np.stack([next(loader) for _ in range(batch)])}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Fine-tune a depth model on TPU")
    parser.add_argument("--model", default="depth-pro", choices=["depth-pro", "depth-anything-3"])
    parser.add_argument("--preset", default="tiny", choices=["tiny", "full"])
    parser.add_argument(
        "--variant", default="auto", choices=["auto", "small", "metric-large"],
        help="DA3 config variant; auto = detect from the checkpoint "
        "(registry fallback-retry), small when training from scratch",
    )
    parser.add_argument("--checkpoint", default=None, help="initial weights (safetensors)")
    parser.add_argument(
        "--data", default=None,
        help="dir of *_rgb.png/*_depth.npy pairs, or 'kitti:ROOT'/'nyu:ROOT' "
        "to fine-tune directly on a benchmark-layout tree (image/+depth/ "
        "16-bit PNGs, published decode scale + validity caps — "
        "train/datasets.py); default synthetic",
    )
    parser.add_argument(
        "--depth-scale", type=float, default=None,
        help="with kitti:/nyu: data: override the dataset's PNG-to-meters divisor",
    )
    parser.add_argument(
        "--split", default=None,
        help="with kitti:/nyu: data: standard split file restricting the "
        "train set (BTS-style 'rgb_rel gt_rel' lines, or NYU splits.mat / "
        "index list for the .mat archive)",
    )
    parser.add_argument(
        "--eval-split", default=None,
        help="same, for --eval-data (e.g. the Eigen test list over the same "
        "KITTI root)",
    )
    parser.add_argument(
        "--gt-root", default=None,
        help="with --split/--eval-split: root the GT paths resolve against "
        "(default the data root)",
    )
    parser.add_argument(
        "--distill-from", default=None,
        help="teacher checkpoint for self-training on 'images:ROOT' data: the "
        "frozen teacher pseudo-labels each batch on the fly (train/distill.py)",
    )
    parser.add_argument(
        "--distill-model", default="depth-pro",
        choices=["depth-pro", "depth-anything-3"],
        help="teacher model family (may differ from the student --model)",
    )
    parser.add_argument(
        "--distill-preset", default="full", choices=["tiny", "full"],
        help="teacher preset (tiny = smoke/CI)",
    )
    parser.add_argument(
        "--distill-conf", type=float, default=0.0,
        help="mask pseudo-labels below this teacher confidence (DA3 dual-head "
        "teachers only; 0 = keep all finite positive depths)",
    )
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--weight-decay", type=float, default=0.05)
    parser.add_argument("--warmup", type=int, default=10)
    parser.add_argument("--accum", type=int, default=1, help="gradient accumulation microsteps")
    parser.add_argument("--remat", default="dots", choices=["none", "dots", "full"])
    parser.add_argument(
        "--tile-chunks", type=int, default=0, dest="tile_chunks",
        help="depth-pro: scan the 35-tile ViT pass in N rematerialized chunks "
        "(5 or 7; shrinks the backward HLO so the 1536² fine-tune compiles)",
    )
    parser.add_argument("--bf16", action="store_true", help="bf16 compute / f32 masters")
    parser.add_argument("--ema", type=float, default=None, help="EMA decay for an averaged param copy (e.g. 0.999)")
    parser.add_argument("--cosine", action="store_true", help="warmup-cosine decay over --steps")
    parser.add_argument("--model-parallel", type=int, default=1, help="TP size (mesh = data x model)")
    parser.add_argument(
        "--views", type=int, default=1,
        help="multi-view DA3 fine-tune: views per scene (batch = scenes x views, "
        "views of a scene contiguous); cross-view blocks run sequence-parallel "
        "over the data axis when the sharding allows",
    )
    parser.add_argument(
        "--pose-weight", type=float, default=0.0,
        help="with --views>1: weight of the camera-pose loss (needs extrinsics/intrinsics in the data)",
    )
    parser.add_argument("--out", default=None, help="save final params here")
    parser.add_argument("--state-out", default=None, help="save full train state here")
    parser.add_argument("--resume", default=None, help="resume from a saved train state")
    parser.add_argument(
        "--ckpt-dir", default=None,
        help="Orbax CheckpointManager directory: periodic async train-state "
        "saves with retention; auto-resumes from the latest step when present",
    )
    parser.add_argument("--ckpt-every", type=int, default=50, help="save cadence for --ckpt-dir (steps)")
    parser.add_argument("--ckpt-keep", type=int, default=3, help="retention for --ckpt-dir")
    parser.add_argument("--log-every", type=int, default=10)
    parser.add_argument(
        "--log-jsonl", default=None,
        help="append one JSON line per logged step ({step, loss, ..., "
        "img_per_s, wall_s}) and a final {event: 'eval', ...} record — the "
        "machine-readable training history (plots, regression tracking)",
    )
    parser.add_argument("--eval-batches", type=int, default=0, help="score N batches after training (held-out synthetic seed, or --eval-data)")
    parser.add_argument("--eval-data", default=None, help="held-out dir for --eval-batches (falls back to --data, labeled train-set)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--augment",
        action="store_true",
        help="host-side train augmentation: hflip + photometric jitter (train/augment.py)",
    )
    parser.add_argument(
        "--aug-depth-scale",
        type=float,
        default=0.0,
        help="with --augment: per-sample exp(U(-s,s)) depth scaling for scale-invariant objectives",
    )
    parser.add_argument(
        "--platform", default=None, choices=["cpu", "tpu"],
        help="pin the JAX platform (the TPU plugin ignores JAX_PLATFORMS; this pins via jax.config)",
    )
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from burn_depth_tpu.io.checkpoint import save_auto as save_checkpoint
    from burn_depth_tpu.train import (
        adamw,
        compile_train_step,
        prefetch_to_device,
        synthetic_depth_batches,
    )

    model, loss_fn, size = _build_model(args)

    mesh = None
    tp_rules = ()
    n_dev = len(jax.devices())
    use_mesh = False
    mesh_devices = jax.devices()
    if args.model_parallel > 1:
        # explicit TP request is always honored: if the batch does not divide
        # the data axis, fall back to a pure-TP mesh (data=1) rather than
        # silently running unsharded
        if n_dev % args.model_parallel:
            raise SystemExit(
                f"--model-parallel {args.model_parallel} does not divide {n_dev} devices"
            )
        data_par = n_dev // args.model_parallel
        if args.batch % max(data_par, 1):
            mesh_devices = jax.devices()[: args.model_parallel]
        use_mesh = True
    elif n_dev > 1 and args.batch % n_dev == 0:
        use_mesh = True  # DP over all devices
    if use_mesh:
        from burn_depth_tpu.parallel import make_mesh, vit_tp_rules

        mesh = make_mesh(mesh_devices, model=args.model_parallel)
        if args.model == "depth-pro":
            tp_rules = (
                vit_tp_rules("encoder/patch_encoder/")
                + vit_tp_rules("encoder/image_encoder/")
                + vit_tp_rules("fov/encoder/")
            )
        else:
            tp_rules = vit_tp_rules("backbone/pretrained/")

    if args.views > 1:
        # multi-view objective replaces the single-view one; built here
        # (not in _build_model) because the SP plan needs the mesh.
        if args.model != "depth-anything-3":
            raise SystemExit("--views>1 is a DA3 (cross-view attention) feature")
        if args.batch % args.views:
            raise SystemExit(f"--batch {args.batch} not divisible by --views {args.views}")
        if getattr(model.config.backbone_config(), "alt_block_start", None) is None:
            raise SystemExit(
                "--views>1 needs a DA3-small variant backbone (alternating cross-view blocks)"
            )
        if args.augment:
            raise SystemExit(
                "--augment with --views>1 is unsupported: geometric augmentation "
                "(hflip) would invalidate the cross-view/pose geometry"
            )
        from burn_depth_tpu.train import da3_multiview_objective

        sp_plan = None
        if mesh is not None and mesh.shape["data"] > 1:
            chunk = args.batch // mesh.shape["data"]
            if chunk and (chunk % args.views == 0 or args.views % chunk == 0):
                from burn_depth_tpu.parallel.sp import ViewSP

                sp_plan = ViewSP(mesh)
            else:
                print(
                    f"note: device view-chunk of {chunk} straddles {args.views}-view "
                    "scenes; cross-view blocks fall back to GSPMD",
                    flush=True,
                )
        loss_fn = da3_multiview_objective(
            model, views=args.views, pose_weight=args.pose_weight, sp=sp_plan
        )

    # the optax schedule counts GLOBAL steps (it resumes with opt_state), so
    # a resumed cosine run must span restored_step + args.steps — otherwise
    # the whole resumed run sits in the decayed-to-zero tail
    ckpt_mgr = None
    if args.ckpt_dir:
        from burn_depth_tpu.io.orbax_io import TrainCheckpointManager

        ckpt_mgr = TrainCheckpointManager(args.ckpt_dir, keep=args.ckpt_keep)

    resume_flat = None
    total_steps = args.steps if args.cosine else None
    if args.resume:
        from burn_depth_tpu.io.checkpoint import load_flat_auto

        resume_flat = load_flat_auto(args.resume)
    elif ckpt_mgr is not None and ckpt_mgr.latest_step() is not None:
        resume_flat = ckpt_mgr.restore_flat()
        print(
            f"auto-resuming from {args.ckpt_dir} step {ckpt_mgr.latest_step()}",
            flush=True,
        )
    if args.cosine and resume_flat is not None:
        total_steps = int(resume_flat["step"]) + args.steps

    step = compile_train_step(
        loss_fn,
        model.params,
        mesh,
        tp_rules=tp_rules,
        optimizer=adamw(
            args.lr,
            weight_decay=args.weight_decay,
            warmup_steps=args.warmup,
            total_steps=total_steps,
        ),
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        remat=args.remat,
        accum_steps=args.accum,
        ema_decay=args.ema,
    )
    if resume_flat is not None:
        from burn_depth_tpu.io.checkpoint import unflatten_into

        # tolerate toggling --ema across save/resume: seed a missing EMA from
        # the resumed params, drop a saved EMA when the flag is off
        has_ema = any(k.startswith("ema/") for k in resume_flat)
        if args.ema is not None and not has_ema:
            for k in [k for k in resume_flat if k.startswith("params/")]:
                resume_flat["ema/" + k[len("params/"):]] = resume_flat[k]
            print("seeded EMA from the resumed params", flush=True)
        elif args.ema is None and has_ema:
            resume_flat = {k: v for k, v in resume_flat.items() if not k.startswith("ema/")}
        step.state = unflatten_into(step.state, resume_flat)
        print(f"resumed at step {int(step.state['step'])}", flush=True)

    eff_batch = args.batch * args.accum
    if args.views > 1 and args.pose_weight > 0 and not args.data:
        raise SystemExit(
            "--pose-weight needs --data scene dirs with poses.json (synthetic "
            "batches carry no camera targets, so the pose loss would be a no-op)"
        )
    data_kind, data_root = _parse_data_spec(args.data) if args.data else (None, None)
    if data_kind in ("kitti", "nyu", "images") and args.views > 1:
        raise SystemExit(
            f"--views>1 needs scene dirs (cli/train schema); the {data_kind} "
            "layout is single-view"
        )
    if data_kind == "images" and not args.distill_from:
        # a random-init teacher is allowed (smoke/CI) but never silently
        print(
            "WARNING: images: data with no --distill-from — pseudo-labeling "
            "with a RANDOM-INIT teacher (smoke only)",
            file=sys.stderr,
        )
    if args.distill_from and data_kind != "images":
        raise SystemExit(
            "--distill-from needs --data images:ROOT (an unlabeled directory; "
            "labeled lanes already carry ground truth)"
        )
    if args.data and args.views > 1:
        gen = _scene_dir_batches(
            args.data, eff_batch // args.views, args.views, size,
            require_poses=args.pose_weight > 0,
        )
    elif data_kind in ("kitti", "nyu"):
        from burn_depth_tpu.train.datasets import benchmark_train_batches

        gen = benchmark_train_batches(
            data_root, size, dataset=data_kind, batch=eff_batch,
            depth_scale=args.depth_scale, seed=args.seed,
            split=args.split, gt_root=args.gt_root,
        )
    elif data_kind == "images":
        import types

        from burn_depth_tpu.train.distill import (
            build_teacher_predict,
            pseudo_label_batches,
        )

        teacher, _t_obj, _t_size = _build_model(types.SimpleNamespace(
            model=args.distill_model, preset=args.distill_preset,
            checkpoint=args.distill_from, seed=args.seed + 123, tile_chunks=0,
        ))
        gen = pseudo_label_batches(
            _image_only_batches(data_root, eff_batch, size),
            build_teacher_predict(teacher, args.distill_model),
            conf_threshold=args.distill_conf,
        )
    elif args.data:
        gen = _image_dir_batches(args.data, eff_batch, size)
    else:
        gen = synthetic_depth_batches(args.seed, eff_batch, size, steps=args.steps)
    if args.augment:
        from burn_depth_tpu.train.augment import augmented_batches

        gen = augmented_batches(
            gen,
            args.seed + 1,
            depth_scale=args.aug_depth_scale,
            # paired-file batches arrive ImageNet-normalized; synthetic ones
            # are raw [0,1] — the jitter must know which space it's in
            normalized=bool(args.data),
        )

    def shaped(b):
        if args.accum > 1:
            return {
                k: v.reshape(args.accum, args.batch, *v.shape[1:]) for k, v in b.items()
            }
        return b

    log_f = open(args.log_jsonl, "a") if args.log_jsonl else None

    def log_record(rec: dict) -> None:
        if log_f is not None:
            import json

            log_f.write(json.dumps(rec) + "\n")
            log_f.flush()  # survive a killed run — the history is the point

    t0 = time.time()
    done = 0
    for batch in prefetch_to_device(map(shaped, gen), step.input_sharding):
        metrics = step(batch)
        done += 1
        if ckpt_mgr is not None and (done % args.ckpt_every == 0 or done >= args.steps):
            # async: queues the save (one device->host copy) and keeps training
            ckpt_mgr.save(int(metrics["step"]), step.state)
        if done % args.log_every == 0 or done == 1 or done >= args.steps:
            jax.block_until_ready(metrics["loss"])
            rate = done * eff_batch / (time.time() - t0)
            parts = " ".join(
                f"{k}={float(v):.4f}" for k, v in metrics.items() if k != "step"
            )
            print(f"step {int(metrics['step'])}: {parts} ({rate:.2f} img/s)", flush=True)
            log_record(
                {"step": int(metrics["step"]), "img_per_s": round(rate, 3),
                 "wall_s": round(time.time() - t0, 3),
                 **{k: float(v) for k, v in metrics.items() if k != "step"}}
            )
        if done >= args.steps:
            break

    if ckpt_mgr is not None:
        ckpt_mgr.wait()  # drain the async save queue
        print(f"checkpoints under {args.ckpt_dir}: steps {ckpt_mgr.all_steps()}", flush=True)
        ckpt_mgr.close()
    if args.state_out:
        save_checkpoint(args.state_out, step.state)
        print(f"train state -> {args.state_out}", flush=True)
    if args.out:
        out_params = step.state.get("ema", step.state["params"])
        save_checkpoint(args.out, out_params)
        which = "ema params" if "ema" in step.state else "params"
        print(f"{which} -> {args.out}", flush=True)

    if args.eval_batches:
        from burn_depth_tpu.train import evaluate_model

        # score exactly what --out ships: the EMA copy when enabled
        trained = step.state.get("ema", step.state["params"])
        predict = build_predict_fn(model, args.model, views=args.views)
        eval_data = args.eval_data or args.data
        label = "eval"
        per_image = False
        if eval_data:
            eval_kind, eval_root = _parse_data_spec(eval_data)
            if eval_kind == "images":
                raise SystemExit(
                    "images: data is unlabeled — nothing to score against; give "
                    "--eval-data a labeled dir (pairs, kitti:, nyu:)"
                )
            if args.views > 1:
                # --views data is scene dirs, not flat pairs — score through
                # the same cross-view layout the run trained on
                eval_gen = _scene_dir_batches(
                    eval_data, args.batch // args.views, args.views, size
                )
            elif eval_kind in ("kitti", "nyu"):
                # published protocol: full-frame ingest, native-GT scoring,
                # per-image averaging (cli/evaluate's benchmark path)
                from burn_depth_tpu.train.datasets import benchmark_eval_batches

                eval_gen = benchmark_eval_batches(
                    eval_root, size, dataset=eval_kind, batch=args.batch,
                    ingest="aspect" if args.model == "depth-anything-3" else "squash",
                    patch=getattr(model, "patch_size", 14),
                    depth_scale=args.depth_scale,
                    split=args.eval_split, gt_root=args.gt_root,
                )
                per_image = True
            else:
                eval_gen = _image_dir_batches(eval_data, args.batch, size)
            if eval_data == args.data:
                label = "eval(train-set)"  # no held-out dir was given
        else:
            eval_gen = synthetic_depth_batches(
                args.seed + 1, args.batch, size, steps=args.eval_batches
            )
        scores = evaluate_model(
            lambda img: predict(trained, jnp.asarray(img)),
            eval_gen,
            align=(args.model != "depth-pro"),
            max_batches=args.eval_batches,
            per_image=per_image,
        )
        print(f"{label}: " + " ".join(f"{k}={v:.4f}" for k, v in sorted(scores.items())), flush=True)
        log_record({"event": "eval", "label": label,
                    **{k: float(v) for k, v in sorted(scores.items())}})
    if log_f is not None:
        log_f.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
