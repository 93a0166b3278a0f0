"""Export CLI: compile a model's serving path to a self-contained AOT
artifact (serialized StableHLO with the weights baked in — ``serve/export.py``).

    python -m burn_depth_tpu.cli.export --model depth-pro \\
        --checkpoint depth_pro.safetensors --out depth_pro.stablehlo

    # run an artifact on one image (no model code re-trace):
    python -m burn_depth_tpu.cli.export --run depth_pro.stablehlo \\
        --image photo.jpg --output depth.png

    # client-side/on-device artifact (LiteRT flatbuffer, runs without JAX):
    python -m burn_depth_tpu.cli.export --model depth-anything-3 --variant small \\
        --attn-impl jnp --format tflite --out da3_small.tflite

Two deployable-artifact counterparts of the reference's wasm Pages build
(``.github/workflows/deploy-pages.yml:40-60``): ``stablehlo`` is the
server/TPU AOT program; ``tflite`` is the CLIENT-side one — LiteRT runs the
flatbuffer on-device (XNNPACK/NNAPI/CoreML) and in the browser via its wasm
runtime, matching the reference's in-browser inference
(``crates/bevy_burn_depth/www/index.html:42-98``) without a server.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model", choices=["depth-pro", "depth-anything-3"], default="depth-pro")
    p.add_argument("--checkpoint", default=None, help="native safetensors or upstream .pt")
    p.add_argument("--variant", default="metric-large", help="DA3 config variant")
    p.add_argument("--out", default=None, help="artifact path to write")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--format", choices=["stablehlo", "tflite"], default="stablehlo",
                   help="stablehlo: jax.export AOT artifact (server/TPU); tflite: LiteRT "
                        "flatbuffer for client-side/on-device inference (use --attn-impl jnp)")
    p.add_argument("--input-size", type=int, default=None)
    p.add_argument("--platforms", default=None, help="comma list, e.g. tpu,cpu (portable artifacts need attn-impl jnp)")
    p.add_argument("--attn-impl", default=None, help="override config attn_impl (jnp for portable artifacts)")
    p.add_argument("--tiny", action="store_true", help="random tiny config (smoke/demo)")
    p.add_argument("--run", default=None, help="load this artifact and run --image instead of exporting")
    p.add_argument("--image", default=None)
    p.add_argument("--output", default="depth.png")
    args = p.parse_args(argv)

    if args.run:
        return _run(args)
    if not args.out:
        p.error("--out is required when exporting")

    import dataclasses

    import jax

    from burn_depth_tpu.serve.export import export_serving

    if args.model == "depth-pro":
        from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

        cfg = DepthProConfig.tiny_test() if args.tiny else DepthProConfig.dinov2_l16_384()
        if args.attn_impl:
            cfg = dataclasses.replace(cfg, attn_impl=args.attn_impl)
        model = (
            DepthPro.load_with_config(args.checkpoint, cfg)
            if args.checkpoint
            else DepthPro.init(jax.random.PRNGKey(0), cfg)
        )
    else:
        from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

        cfg = (
            DepthAnything3Config.small()
            if args.variant == "small"
            else DepthAnything3Config.metric_large()
        )
        if args.tiny:
            cfg = dataclasses.replace(cfg, image_size=112)
        if args.attn_impl:
            cfg = dataclasses.replace(cfg, attn_impl=args.attn_impl)
        model = (
            DepthAnything3.load(args.checkpoint, cfg)
            if args.checkpoint
            else DepthAnything3.init(jax.random.PRNGKey(0), cfg)
        )

    if args.format == "tflite":
        from burn_depth_tpu.serve.export import export_tflite

        n = export_tflite(model, args.out, batch=args.batch, input_size=args.input_size)
        print(f"wrote {args.out}: {n} bytes (LiteRT flatbuffer, weights baked in)")
        return 0
    platforms = args.platforms.split(",") if args.platforms else None
    n = export_serving(
        model, args.out, batch=args.batch, platforms=platforms, input_size=args.input_size
    )
    print(f"wrote {args.out}: {n} bytes, platforms={platforms or 'native'}")
    return 0


def _run(args) -> int:
    import numpy as np

    from burn_depth_tpu.serve.export import load_exported

    call = load_exported(args.run)
    b, _, h, w = call.in_avals[0].shape
    if args.image:
        from PIL import Image

        img = Image.open(args.image).convert("RGB").resize((w, h))
        x = np.asarray(img, np.float32).transpose(2, 0, 1)[None] / 255.0
        mean = np.array([0.485, 0.456, 0.406], np.float32).reshape(1, 3, 1, 1)
        std = np.array([0.229, 0.224, 0.225], np.float32).reshape(1, 3, 1, 1)
        x = (x - mean) / std
        x = np.broadcast_to(x, (b, 3, h, w))
    else:
        x = np.zeros((b, 3, h, w), np.float32)
    pred = call(x)
    depth = np.asarray(pred.depth[0])
    print(f"platforms={call.platforms} depth shape={depth.shape} "
          f"range=[{depth.min():.4g}, {depth.max():.4g}]")
    if args.image:
        from burn_depth_tpu.cli.infer import normalize_to_u8

        from PIL import Image

        Image.fromarray(normalize_to_u8(depth), "L").save(args.output)
        print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
