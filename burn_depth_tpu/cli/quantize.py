"""Quantize CLI: produce a pre-calibrated int8 serving checkpoint.

    python -m burn_depth_tpu.cli.quantize --model depth-pro \\
        --checkpoint depth_pro.safetensors --calib photo.jpg \\
        --out depth_pro_int8.safetensors

Runs ONE float forward over the calibration image (or zeros) to record
per-tensor activation maxima, quantizes every ViT-block linear to per-channel
int8 with static activation scales (``ops/quant.py``), and saves the
quantized tree in the native flattened-safetensors format (int8 leaves are
stored as-is).  Serving then loads it with ``DepthPro.load_quantized`` /
``DepthAnything3.load_quantized`` — no load-time calibration pass.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("checkpoint", help="float checkpoint (native safetensors or upstream)")
    p.add_argument("--model", choices=["depth-pro", "depth-anything-3"], default="depth-pro")
    p.add_argument("--variant", default="metric-large", help="DA3 config variant (metric-large | small)")
    p.add_argument("--out", "-o", required=True, help="int8 checkpoint path to write")
    p.add_argument("--calib", default=None, help="calibration image (default: zeros batch)")
    p.add_argument("--tiny", action="store_true", help="random tiny config (smoke/demo; ignores checkpoint)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from burn_depth_tpu.io.checkpoint import save_checkpoint

    if args.model == "depth-pro":
        from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

        if args.tiny:
            model = DepthPro.init(jax.random.PRNGKey(0), DepthProConfig.tiny_test())
        else:
            model = DepthPro.load(args.checkpoint)
        size = model.config.img_size
    else:
        from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

        if args.tiny:
            import dataclasses

            cfg = dataclasses.replace(
                DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp"
            )
            model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
        else:
            cfg = (
                DepthAnything3Config.small()
                if args.variant == "small"
                else DepthAnything3Config.metric_large()
            )
            model = DepthAnything3.load(args.checkpoint, cfg)
        size = model.config.image_size

    if args.calib:
        from PIL import Image

        from burn_depth_tpu.api.native import prepare_image_nchw

        rgb = np.asarray(Image.open(args.calib).convert("RGB"))
        x = jnp.asarray(prepare_image_nchw(rgb, size))[None]
    else:
        print("no --calib image: calibrating on a zeros batch", file=sys.stderr)
        x = jnp.zeros((1, 3, size, size), jnp.float32)

    quantized = model.quantize_vit(x)
    save_checkpoint(args.out, quantized.params)
    n_i8 = sum(
        1 for leaf in jax.tree.leaves(quantized.params) if str(leaf.dtype) == "int8"
    )
    print(f"wrote {args.out}: {n_i8} int8 linears, static activation scales")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
