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
    args = parser.parse_args(argv)

    from burn_depth_tpu.api import AnyDepthModel, DepthModelKind
    from burn_depth_tpu.io.checkpoint import load_safetensors
    from burn_depth_tpu.verify import run_da3_parity, run_depth_pro_parity

    golden = load_safetensors(args.golden)
    model = AnyDepthModel.load(DepthModelKind.from_str(args.model), args.checkpoint)

    if args.model == "depth-pro":
        report = run_depth_pro_parity(model.model, golden)
    else:
        report = run_da3_parity(model.model, golden)

    print(report)
    return 0 if report.ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
