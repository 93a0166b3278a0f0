#!/usr/bin/env python
"""Bilinear-resize benchmark (reference ``bench/interpolate.rs:18-114``).

Same five shape cases; methods here are the two TPU-native implementations:
``matmul`` (resize as a pair of MXU matmuls, the default in-graph path) vs
``gather`` (jnp gather-based reference path).  The reference compared its
CPU-readback "Custom" loop against Burn's op — both of its methods are
device-hostile and have no TPU counterpart worth measuring.

Prints one JSON line per case (throughput = output elements/s, matching the
criterion ``Throughput::Elements`` convention).
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from burn_depth_tpu.ops.interpolate import resize_bilinear  # noqa: E402
from burn_depth_tpu.utils.profiling import Timer  # noqa: E402

CASES = [  # (src_h, src_w) -> (dst_h, dst_w), 3 channels (bench/interpolate.rs:32-113)
    ((360, 540), (1536, 1536)),
    ((1536, 1536), (768, 768)),
    ((1536, 1536), (384, 384)),
    ((768, 768), (384, 384)),
    ((1536, 1536), (360, 540)),
]


def main() -> int:
    timer = Timer(warmup=2, iters=20)
    for (sh, sw), (dh, dw) in CASES:
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, sh, sw), jnp.float32)
        fn = jax.jit(lambda x, s=(dh, dw): resize_bilinear(x, s, align_corners=False))
        r = timer.run(fn, x)
        elements = dh * dw * 3
        print(
            json.dumps(
                {
                    "metric": f"resize_{sh}x{sw}_to_{dh}x{dw}",
                    "value": round(elements / r["mean_s"] / 1e6, 2),
                    "unit": "Melem/s",
                    "mean_ms": round(r["mean_s"] * 1e3, 3),
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
