"""Depth-head variant probe: ms + XLA bytes per formulation.

The two-sided roofline (benchmarks/roofline.py, round 4) measured the
serving head at 15.75 ms moving 4.97 GB — 2.4x its ~2.1 GB analytic
minimum traffic and only 38% of the HBM roof, with a 6.06 ms
bandwidth-side floor.  This probe re-measures every head formulation the
repo carries WITH the bytes column, so the variant choice is made on
traffic, not just time:

* nchw       — serving default (`_depth_head_forward`, NCHW XLA convs)
* nhwc       — `to_nhwc_tail` layout (HWIO weights, NHWC convs)
* fused      — phase-packed head (`fuse_depth_head`: deconv folded into a
               grouped conv + depth-to-space)
* nhwc+wino  — NHWC with the Winograd kernel on conv0

Run: python benchmarks/head_probe.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import benchmarks._cache  # noqa: F401

import os

import jax
import jax.numpy as jnp

from benchmarks.roofline import component_row, log


def main() -> int:
    from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig
    from burn_depth_tpu.models.depth_pro.model import _depth_head_forward

    cfg = DepthProConfig.dinov2_l16_384()
    model = DepthPro.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    log(f"devices={jax.devices()}")

    # decoder output at 768², 256 ch — the head's real input
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 768, 768), jnp.bfloat16)

    head = model.params["head"]
    component_row("head_nchw", lambda p, v: _depth_head_forward(p, v), head, x)

    head_nhwc = model.to_nhwc_tail().params["head"]
    component_row("head_nhwc", lambda p, v: _depth_head_forward(p, v), head_nhwc, x)

    head_fused = model.fuse_tail(head=True, decoder=False).params["head"]
    component_row("head_fused", lambda p, v: _depth_head_forward(p, v), head_fused, x)

    os.environ["BDT_CONV3_WINO"] = "1"
    try:
        component_row(
            "head_nhwc_wino", lambda p, v: _depth_head_forward(p, v), head_nhwc, x
        )
    finally:
        os.environ.pop("BDT_CONV3_WINO", None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
