"""gRPC depth server CLI: `python -m burn_depth_tpu.cli.serve_grpc
--checkpoint da3.safetensors --port 50051`, then drive it with
``burn_depth_tpu.serve.grpc_client.DepthGrpcClient`` (or any gRPC client
generated from ``serve/proto/depth.proto``)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Serve depth inference over gRPC")
    parser.add_argument("--model", default="depth-anything-3", choices=["depth-pro", "depth-anything-3"])
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=50051)
    parser.add_argument(
        "--infer-batch-sizes", default="1,2,4",
        help="bucket sizes (static shapes XLA compiles; concurrent requests "
        "coalesce up to the largest)",
    )
    parser.add_argument(
        "--adaptive-batching", action="store_true",
        help="linger for stragglers only when the recent arrival rate can "
        "fill the bucket",
    )
    parser.add_argument(
        "--stream-window", type=int, default=8,
        help="max in-flight frames per InferStream connection",
    )
    parser.add_argument(
        "--warmup", action="store_true",
        help="pre-compile every Infer batch bucket before accepting traffic",
    )
    parser.add_argument(
        "--keep-aspect", action="store_true",
        help="DA3: aspect-preserving ingest (patch-multiple dims, no FOV-"
        "discarding crop); the batcher coalesces per shape lane",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="quantize the ViT linears to the int8 serving tier at startup "
        "(dynamic scales; for the static-calibrated tier pre-quantize the "
        "checkpoint with cli/quantize — AnyDepthModel.load auto-detects it)",
    )
    parser.add_argument(
        "--tier", default="default", choices=["default", "auto", "parity"],
        help="'auto': serve the fastest tier whose measured end-to-end depth "
        "drift passes the <1e-3 accuracy gate (benchmarks/tier_drift.json — "
        "the SAME gate bench.py and README's status table use; "
        "burn_depth_tpu/core/tiers.py); 'parity': force exact-erf, no int8; "
        "'default': explicit flags only",
    )
    args = parser.parse_args(argv)

    from burn_depth_tpu.api import AnyDepthModel, DepthModelKind, load_model
    from burn_depth_tpu.core.tiers import apply_tier_choice
    from burn_depth_tpu.serve.grpc_server import DepthGrpcServer

    kind = DepthModelKind.from_str(args.model)
    if args.checkpoint:
        model = AnyDepthModel.load(kind, args.checkpoint)
    else:
        print("no --checkpoint: random-init weights (smoke mode)", file=sys.stderr)
        model = load_model(kind)
    model = apply_tier_choice(model, args.tier,
                              log=lambda m: print(m, file=sys.stderr))
    if args.int8 and args.tier == "default":
        model = model.quantize_vit()
        print("int8 ViT serving tier (dynamic scales)", file=sys.stderr)
    elif args.int8:
        print("--int8 ignored: --tier governs quantization", file=sys.stderr)

    buckets = tuple(int(b) for b in args.infer_batch_sizes.split(","))
    server = DepthGrpcServer(
        model, host=args.host, port=args.port,
        batch_sizes=buckets, adaptive_batching=args.adaptive_batching,
        keep_aspect=args.keep_aspect,
        stream_window=args.stream_window,
    )
    if args.warmup:
        dt = server.infer_service.warmup()
        print(f"warmed {len(buckets)} infer buckets in {dt:.1f}s", file=sys.stderr)
    server.start()
    print(f"gRPC depth service on {args.host}:{server.port}", flush=True)
    try:
        server.wait()
    except KeyboardInterrupt:
        server.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
