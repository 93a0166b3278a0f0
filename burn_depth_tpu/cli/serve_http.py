"""HTTP streaming server CLI (web-demo counterpart of the reference's
wasm/GitHub-Pages deploy): `python -m burn_depth_tpu.cli.serve_http
--checkpoint da3.safetensors --port 8000` then open http://localhost:8000."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Serve live depth over HTTP (MJPEG)")
    parser.add_argument("--model", default="depth-anything-3", choices=["depth-pro", "depth-anything-3"])
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument(
        "--source",
        default="synthetic",
        help="'synthetic', 'browser' (getUserMedia page at /camera), "
        "'camera[:N]' (local webcam), or an image directory",
    )
    parser.add_argument("--size", type=int, default=640, help="synthetic frame width")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument(
        "--infer-batch-sizes", default="1,2,4",
        help="POST /infer bucket sizes (static shapes XLA compiles; "
        "concurrent requests coalesce up to the largest)",
    )
    parser.add_argument(
        "--adaptive-batching", action="store_true",
        help="linger for stragglers only when the recent arrival rate can "
        "fill the bucket (greedy under sparse traffic, coalescing under load)",
    )
    parser.add_argument(
        "--warmup", action="store_true",
        help="pre-compile every /infer batch bucket before accepting traffic "
        "(no client pays the first-request XLA compile)",
    )
    parser.add_argument(
        "--keep-aspect", action="store_true",
        help="DA3: aspect-preserving /infer ingest (patch-multiple dims, no "
        "FOV-discarding crop); the batcher coalesces per shape lane — each "
        "distinct aspect compiles its own bucket set",
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
    from burn_depth_tpu.serve.http import DepthHTTPServer
    from burn_depth_tpu.serve.realtime import ImageDirSource, SyntheticSource

    kind = DepthModelKind.from_str(args.model)
    if args.checkpoint:
        model = AnyDepthModel.load(kind, args.checkpoint)
    else:
        print("no --checkpoint: random-init weights (smoke mode)", file=sys.stderr)
        model = load_model(kind)
    from burn_depth_tpu.core.tiers import apply_tier_choice

    model = apply_tier_choice(model, args.tier,
                              log=lambda m: print(m, file=sys.stderr))
    if args.int8 and args.tier == "default":
        model = model.quantize_vit()
        print("int8 ViT serving tier (dynamic scales)", file=sys.stderr)
    elif args.int8:
        print("--int8 ignored: --tier governs quantization", file=sys.stderr)

    if args.source == "synthetic":
        source = SyntheticSource(args.size, args.size * 3 // 4, 1 << 30)
    elif args.source == "browser":
        from burn_depth_tpu.serve.http import BrowserSource

        source = BrowserSource()
    elif args.source.startswith("camera"):
        from burn_depth_tpu.serve.realtime import CameraSource

        dev = args.source.partition(":")[2]
        source = CameraSource(int(dev) if dev else 0)
    else:
        source = ImageDirSource(args.source)

    buckets = tuple(int(b) for b in args.infer_batch_sizes.split(","))
    server = DepthHTTPServer(model, source, host=args.host, port=args.port,
                             infer_batch_sizes=buckets,
                             adaptive_batching=args.adaptive_batching,
                             keep_aspect=args.keep_aspect)
    if args.warmup:
        dt = server.infer_service.warmup()
        print(f"warmed {len(buckets)} infer buckets in {dt:.1f}s", file=sys.stderr)
    extra = " (camera page: /camera)" if args.source == "browser" else ""
    print(f"serving on http://{args.host}:{server.port}{extra}", flush=True)
    server.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
