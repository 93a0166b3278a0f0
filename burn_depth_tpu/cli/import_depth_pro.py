"""Depth Pro checkpoint importer CLI (reference ``tool/import_depth_pro.rs``).

``depth_pro.pt`` (apple/ml-depth-pro) → native safetensors with f16 storage
(the reference saves NamedMpk with ``HalfPrecisionSettings``).
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Import apple/ml-depth-pro checkpoint")
    parser.add_argument("checkpoint", help=".pt or .safetensors from apple/ml-depth-pro")
    parser.add_argument("-o", "--output", default="depth_pro.safetensors")
    parser.add_argument("--storage-dtype", default="float16", choices=["float16", "bfloat16", "float32"])
    parser.add_argument("--dry-run", action="store_true", help="remap + validate, don't save")
    parser.add_argument(
        "--validate",
        metavar="GOLDEN",
        default=None,
        help="after import, replay this golden safetensors dump and gate on the "
        "parity thresholds (the reference's IMPORT_VALIDATE env mode)",
    )
    parser.add_argument("--dump-template", action="store_true", help="print expected param paths")
    args = parser.parse_args(argv)

    from burn_depth_tpu.io import import_depth_pro, save_checkpoint
    from burn_depth_tpu.io.importers import export_template_keys

    if args.dump_template:
        import jax

        from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

        template = DepthPro.init(jax.random.PRNGKey(0), DepthProConfig.dinov2_l16_384()).params
        print("\n".join(export_template_keys(template)))
        return 0

    model, report = import_depth_pro(args.checkpoint)
    print(report)
    if args.validate:
        from burn_depth_tpu.io.checkpoint import load_safetensors
        from burn_depth_tpu.verify import run_depth_pro_parity

        parity = run_depth_pro_parity(model, load_safetensors(args.validate))
        print(parity)
        if not parity.ok:
            return 1
    if not args.dry_run:
        storage = None if args.storage_dtype == "float32" else args.storage_dtype
        save_checkpoint(args.output, model.params, storage_dtype=storage)
        print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
