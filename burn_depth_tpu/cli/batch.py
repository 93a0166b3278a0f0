"""Offline bulk inference: a directory of images → depth maps, batched.

    python -m burn_depth_tpu.cli.batch photos/ --model depth-anything-3 \\
        --checkpoint da3.safetensors --batch 8 --out-dir depth/ --save-npy

The throughput shape of BASELINE config 4 as a CLI: the native threaded
loader (``api/native.ImageLoader``) decodes + preps an ordered window ahead,
frames pack into fixed ``--batch`` static-shape batches (last batch padded),
and the jitted step runs with persistent weights while the next batch's
decode and upload overlap (JAX async dispatch).  Outputs: normalized depth
PNGs (and raw f32 ``.npy`` with ``--save-npy``), named after the inputs.

With ``--dp N`` the batch dim shards over an N-device data-parallel ICI mesh
(BASELINE config 5 as a CLI; params resident, XLA SPMD collectives).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("images", help="directory of images (png/jpg/jpeg/ppm)")
    p.add_argument("--model", choices=["depth-pro", "depth-anything-3"], default="depth-anything-3")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--out-dir", default="depth_out")
    p.add_argument("--save-npy", action="store_true", help="also write raw f32 depth .npy")
    p.add_argument("--threads", type=int, default=4, help="native decode workers")
    p.add_argument(
        "--fast-jpeg", action="store_true",
        help="DCT-scaled JPEG decode for oversized inputs (draft-mode "
             "semantics; not bit-identical, ~4-16x fewer decoded pixels)",
    )
    p.add_argument(
        "--dp",
        type=int,
        default=1,
        help="shard each batch over this many devices on the ICI mesh "
        "(data parallel; --batch must be divisible)",
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from burn_depth_tpu.api import AnyDepthModel, DepthModelKind, load_model
    from burn_depth_tpu.api.native import ImageLoader
    from burn_depth_tpu.serve.realtime import _normalize_u8
    from burn_depth_tpu.serve.step import with_u8_ingest

    kind = DepthModelKind.from_str(args.model)
    if args.checkpoint:
        model = AnyDepthModel.load(kind, args.checkpoint)
    else:
        print("no --checkpoint: random-init weights (smoke mode)", file=sys.stderr)
        model = load_model(kind)

    inner = model.model
    kind_da3 = model.preferred_input_resolution() is not None
    size = model.preferred_input_resolution() or inner.config.img_size

    from burn_depth_tpu.api.native import list_image_files

    files = list_image_files(args.images)
    os.makedirs(args.out_dir, exist_ok=True)

    def forward(params, x):
        if kind_da3:
            head_out, camera_pred, _ = inner._forward_internal(params, x, None, None)
            depth = inner._finalize(head_out, camera_pred).depth
        else:
            depth = inner._infer_fn(params, x).depth
        u8 = jnp.stack([_normalize_u8(depth[i]) for i in range(depth.shape[0])])
        return depth, u8

    if args.dp > 1:
        # BASELINE config 5 as a CLI: params resident on a (dp, 1) mesh,
        # batch dim sharded over `data`, XLA SPMD lays collectives on ICI.
        devs = jax.devices()
        if len(devs) < args.dp:
            raise SystemExit(f"--dp {args.dp} > {len(devs)} available devices")
        if args.batch % args.dp:
            raise SystemExit(f"--batch {args.batch} not divisible by --dp {args.dp}")
        from burn_depth_tpu.parallel import make_mesh
        from burn_depth_tpu.serve.step import compile_serving_step

        mesh = make_mesh(devs[: args.dp])
        step = compile_serving_step(with_u8_ingest(forward), inner.params, mesh)
        run = step
    else:
        from burn_depth_tpu.core.knobs import kjit

        fn = kjit(with_u8_ingest(forward))
        run = lambda x: fn(inner.params, x)  # noqa: E731

    # DA3 prep = shortest-side + crop; Depth Pro = squash (full frame).
    loader = ImageLoader(
        files, size, mode="u8", threads=args.threads,
        window=max(2 * args.batch, 4), crop=kind_da3, fast_jpeg=args.fast_jpeg,
    )

    def save(idx: int, depth: np.ndarray, u8: np.ndarray) -> None:
        from PIL import Image

        stem = os.path.splitext(os.path.basename(files[idx]))[0]
        Image.fromarray(u8, mode="L").save(os.path.join(args.out_dir, f"{stem}_depth.png"))
        if args.save_npy:
            np.save(os.path.join(args.out_dir, f"{stem}_depth.npy"), depth)

    from burn_depth_tpu.serve.bulk import batched_depth_iter

    t0 = time.perf_counter()
    done = 0
    for idx, (depth_i, u8_i) in batched_depth_iter(run, loader, args.batch):
        save(idx, depth_i, u8_i)
        done += 1
    dt = time.perf_counter() - t0
    print(f"{done} images -> {args.out_dir} in {dt:.2f}s ({done / dt:.2f} img/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
