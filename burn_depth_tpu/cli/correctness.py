"""Parity-check CLI: replay a golden safetensors dump through the JAX model
and gate on the reference thresholds (role of ``example/correctness.rs`` /
``example/da3_small_correctness.rs`` — exit code gates CI usage)."""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="PyTorch-parity correctness gate")
    parser.add_argument("--model", required=True, choices=["depth-pro", "depth-anything-3"])
    parser.add_argument("--golden", required=True, help="safetensors dump from tools/correctness_*.py")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument(
        "--config",
        default=None,
        help="model config JSON (core.configio) for non-preset geometries, e.g. "
        "the sidecar written by tools/correctness_depth_pro.py --save-config",
    )
    parser.add_argument(
        "--rel-floor",
        type=float,
        default=None,
        help="relative-error denominator guard (default: the reference's 1e-6, "
        "correctness.rs:499-504).  Raise for random thin-model fixtures whose "
        "feature scale is O(0.1) — near-zero elements are cancellation noise; "
        "mean/max-abs gates keep full reference strictness either way",
    )
    args = parser.parse_args(argv)

    from burn_depth_tpu.api import AnyDepthModel, DepthModelKind
    from burn_depth_tpu.io.checkpoint import load_safetensors
    from burn_depth_tpu.verify import run_da3_parity, run_depth_pro_parity

    config = None
    if args.config is not None:
        from burn_depth_tpu.core.configio import load_config

        config = load_config(args.config)

    golden = load_safetensors(args.golden)
    model = AnyDepthModel.load(DepthModelKind.from_str(args.model), args.checkpoint, config=config)

    thresholds = {"rel_floor": args.rel_floor} if args.rel_floor is not None else None
    if args.model == "depth-pro":
        report = run_depth_pro_parity(model.model, golden, thresholds)
    else:
        report = run_da3_parity(model.model, golden, thresholds)

    print(report)
    return 0 if report.ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
