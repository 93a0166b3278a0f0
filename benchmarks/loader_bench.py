"""Native ImageLoader vs PIL-fallback ingest throughput.

The host ingest lane (decode → CatmullRom resize/crop → normalize) must keep
up with the chip (BASELINE config 4: batched streaming).  This measures
images/s for both lanes on synthetic JPEG/PNG corpora at the DA3 serving
resolution.  Run on an idle host — concurrent CPU work skews both sides.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_corpus(tmp, n, hw, fmt):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = f"{tmp}/img_{i:04d}.{fmt.lower()}"
        Image.fromarray(rng.integers(0, 256, (*hw, 3), dtype=np.uint8)).save(p, format=fmt)
        paths.append(p)
    return paths


def run(paths, target, mode, threads, force_fallback, fast_jpeg=False):
    from burn_depth_tpu.api import native

    if force_fallback:
        orig = native._load
        native._load = lambda: None
    try:
        with native.ImageLoader(paths, target, mode=mode, threads=threads, window=16,
                                fast_jpeg=fast_jpeg) as loader:
            t0 = time.perf_counter()
            n = sum(1 for _ in loader)
            dt = time.perf_counter() - t0
    finally:
        if force_fallback:
            native._load = orig
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--target", type=int, default=518)
    ap.add_argument("--mode", default="nchw", choices=["u8", "nchw"])
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args()

    from burn_depth_tpu.api import native

    print(f"native lib available: {native.available()}")
    with tempfile.TemporaryDirectory() as tmp:
        for fmt in ("JPEG", "PNG"):
            paths = make_corpus(tmp, args.n, tuple(args.hw), fmt)
            run(paths[:4], args.target, args.mode, args.threads, False)  # warmup
            nat = run(paths, args.target, args.mode, args.threads, False)
            fb = run(paths, args.target, args.mode, args.threads, True)
            print(
                f"{fmt:4s} {args.hw[0]}x{args.hw[1]} -> {args.target}² {args.mode}: "
                f"native {nat:7.1f} img/s | PIL fallback {fb:7.1f} img/s | {nat / fb:4.2f}x"
            )

        # >4K JPEG ingest: DCT-scaled decode (fast_jpeg) vs exact decode.
        hw4k = (2160, 3840)
        paths = make_corpus(tmp, max(args.n // 8, 4), hw4k, "JPEG")
        run(paths[:2], args.target, args.mode, args.threads, False)  # warmup
        exact = run(paths, args.target, args.mode, args.threads, False)
        fast = run(paths, args.target, args.mode, args.threads, False, fast_jpeg=True)
        print(
            f"JPEG {hw4k[0]}x{hw4k[1]} -> {args.target}² {args.mode}: "
            f"exact {exact:7.1f} img/s | fast_jpeg {fast:7.1f} img/s | {fast / exact:4.2f}x"
        )


if __name__ == "__main__":
    main()
