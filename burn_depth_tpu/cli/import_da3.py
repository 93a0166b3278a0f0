"""DA3 checkpoint importer CLI (reference ``tool/import_da3.rs:17-38``)."""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Import ByteDance Depth Anything 3 checkpoint")
    parser.add_argument("checkpoint", help=".safetensors (or .pt) from DA3")
    parser.add_argument("--variant", default="metric-large", choices=["metric-large", "small"])
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("--storage-dtype", default="float16", choices=["float16", "bfloat16", "float32"])
    parser.add_argument("--dry-run", action="store_true")
    parser.add_argument(
        "--validate",
        metavar="GOLDEN",
        default=None,
        help="after import, replay this golden dump and gate on the parity thresholds",
    )
    parser.add_argument("--dump-template", action="store_true")
    args = parser.parse_args(argv)

    from burn_depth_tpu.io import import_da3, save_checkpoint
    from burn_depth_tpu.io.importers import export_template_keys

    if args.dump_template:
        import jax

        from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

        cfg = (
            DepthAnything3Config.small()
            if args.variant == "small"
            else DepthAnything3Config.metric_large()
        )
        template = DepthAnything3.init(jax.random.PRNGKey(0), cfg).params
        print("\n".join(export_template_keys(template)))
        return 0

    model, report = import_da3(args.checkpoint, variant=args.variant)
    print(report)
    if args.validate:
        from burn_depth_tpu.io.checkpoint import load_safetensors
        from burn_depth_tpu.verify import run_da3_parity

        parity = run_da3_parity(model, load_safetensors(args.validate))
        print(parity)
        if not parity.ok:
            return 1
    if not args.dry_run:
        out = args.output or f"da3_{args.variant.replace('-', '_')}.safetensors"
        storage = None if args.storage_dtype == "float32" else args.storage_dtype
        save_checkpoint(out, model.params, storage_dtype=storage)
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
