"""Two-sided (compute + HBM-bandwidth) roofline for Depth Pro serving.

Round-3's roofline (BENCH.md) was compute-only and floored the decoder /
depth-head rows at their own measured rate ("best class rate" = this very
implementation), so those rows showed zero headroom by construction, and
nothing classified the low-%-peak rows (head 20%, FOV 19%) as compute- vs
HBM-bound (VERDICT r3 weak #1 / next #2a).

This tool closes both gaps with XLA's OWN accounting: for every component
of the serving tier it compiles the jitted program and reads
``compiled.cost_analysis()`` — ``flops`` and ``bytes accessed`` as the
compiler counted them AFTER fusion/layout assignment — then times the same
program with the proven chain protocol (benchmarks/component_profile.py).

Per component it reports:

* achieved TFLOP/s vs the v5e bf16 peak (197 TF/s)
* achieved GB/s vs the v5e HBM peak (819 GB/s)
* ``bound`` = which roof the op is nearer (the binding resource)
* ``floor_ms`` = max(flops/peak_flops, bytes/peak_bw) — the two-sided
  speed-of-light for THIS program shape, independent of the current
  implementation's rate (fixes the self-referential floors)

Run (TPU):     python benchmarks/roofline.py
Merge record:  writes benchmarks/roofline.json (read by BENCH.md's table)

v5e peaks: 197 bf16-TFLOP/s, 819 GB/s HBM (public v5e datasheet numbers,
also used by round-3's table).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import benchmarks._cache  # noqa: F401  (persistent XLA compile cache)

# serving-tier env defaults (bench.py's selected tier: int8-static + tanh
# GELU + bf16 dequant epilogue); explicit env still overrides for A/Bs
os.environ.setdefault("BDT_GELU", "tanh")
os.environ.setdefault("BDT_INT8_EPILOGUE", "bf16")

import jax
import jax.numpy as jnp

PEAK_TFLOPS = 197e12  # bf16 MXU
PEAK_BW = 819e9  # HBM bytes/s
K = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def cost_of(jfn, *args) -> dict:
    """XLA's post-fusion accounting for the compiled executable."""
    try:
        compiled = jfn.lower(*args).compile()
        ca = compiled.cost_analysis()
        # jax returns either a dict or a one-element list of dicts by version
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {
            "flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0)),
        }
    except Exception as e:  # tunnel backends may not expose cost analysis
        log(f"cost_analysis unavailable ({type(e).__name__}: {e}) — timings only")
        return {"flops": 0.0, "bytes": 0.0}


def timeit(jfn, params, x) -> float:
    """K dependent calls, one device_get sync (the tunnel-sane protocol —
    see benchmarks/component_profile.py for why scan-of-K was abandoned).
    Round-5 fix (VERDICT r4 #3): the final sync fetches real output bytes —
    through the tunnel ``block_until_ready`` can return early (BENCH.md
    round 2), which is exactly how the r4 tail rows picked up their stale
    erf-leg readings."""

    def chain(k):
        xi = x
        out = None
        for _ in range(k):
            out = jfn(params, xi)
            leaf = jax.tree_util.tree_leaves(out)[0]
            xi = x + (leaf.ravel()[0] * 1e-12).astype(x.dtype)
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:8])

    chain(2)
    # min-of-windows: single-window readings through the tunnel carry 2-3x
    # stall inflation (a head program measured 15.75 vs 36.9 ms across two
    # runs; bench.py protocol note, BENCH.md round 2 variance section)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        chain(K)
        best = min(best, (time.perf_counter() - t0) / K * 1e3)
    return best


def component_row(label, fn, params, x) -> dict:
    jfn = jax.jit(fn)
    cost = cost_of(jfn, params, x)
    ms = timeit(jfn, params, x)
    tf_s = cost["flops"] / (ms * 1e-3) / 1e12
    gb_s = cost["bytes"] / (ms * 1e-3) / 1e9
    floor_compute_ms = cost["flops"] / PEAK_TFLOPS * 1e3
    floor_bw_ms = cost["bytes"] / PEAK_BW * 1e3
    row = {
        "component": label,
        "ms": round(ms, 2),
        "gflop": round(cost["flops"] / 1e9, 1),
        "gbytes": round(cost["bytes"] / 1e9, 3),
        "achieved_tflops": round(tf_s, 1),
        "achieved_gbs": round(gb_s, 1),
        "pct_compute_roof": round(100 * tf_s * 1e12 / PEAK_TFLOPS, 1),
        "pct_bw_roof": round(100 * gb_s * 1e9 / PEAK_BW, 1),
        "bound": "compute" if floor_compute_ms >= floor_bw_ms else "bandwidth",
        "floor_ms": round(max(floor_compute_ms, floor_bw_ms), 2),
    }
    log(
        f"{label:22s} {row['ms']:8.2f} ms  {row['gflop']:9.1f} GF  "
        f"{row['gbytes']:7.3f} GB  {row['achieved_tflops']:6.1f} TF/s "
        f"({row['pct_compute_roof']:4.1f}%)  {row['achieved_gbs']:6.1f} GB/s "
        f"({row['pct_bw_roof']:4.1f}%)  {row['bound']:9s} floor {row['floor_ms']:.2f} ms"
    )
    return row


def main() -> int:
    from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig
    from burn_depth_tpu.models.depth_pro import encoder as enc_mod
    from burn_depth_tpu.models.depth_pro.decoder import decoder_forward
    from burn_depth_tpu.models.depth_pro.fov import fov_forward
    from burn_depth_tpu.models.depth_pro.model import _depth_head_forward
    from burn_depth_tpu.vit.dinov2 import dinov2_forward

    int8_mode = os.environ.get("BENCH_INT8", "static")
    cfg = DepthProConfig.dinov2_l16_384()
    model = DepthPro.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if int8_mode != "0":
        calib = jax.random.normal(
            jax.random.PRNGKey(1), (1, 3, cfg.img_size, cfg.img_size), jnp.bfloat16
        )
        model = model.quantize_vit(
            calibration_input=calib if int8_mode == "static" else None
        )
    # serving tier default: decoder tail fused (BENCH_FUSE_TAIL=decoder)
    model = model.fuse_tail(head=False, decoder=True)
    params = model.params
    enc = params["encoder"]
    size = cfg.img_size
    log(f"devices={jax.devices()} int8={int8_mode} serving-tier roofline")

    rows = []
    x_full = jax.random.normal(jax.random.PRNGKey(2), (1, 3, size, size), jnp.bfloat16)
    rows.append(
        component_row("full_infer", lambda p, x: model._infer_fn(p, x).depth, params, x_full)
    )

    tiles = jax.random.normal(jax.random.PRNGKey(3), (35, 3, 384, 384), jnp.bfloat16)
    rows.append(
        component_row(
            "patch_vit_35x384",
            lambda p, t: dinov2_forward(
                p, t, cfg.patch_encoder, hook_ids=cfg.hook_ids, attn_impl=cfg.attn_impl
            ).x_norm_patchtokens,
            enc["patch_encoder"],
            tiles,
        )
    )

    feat_shapes = jax.eval_shape(
        lambda x: enc_mod.encoder_forward(enc, enc["patch_encoder"], enc["image_encoder"], x, cfg)[0],
        jax.ShapeDtypeStruct(x_full.shape, x_full.dtype),
    )
    feats = [
        jax.random.normal(jax.random.PRNGKey(10 + i), s.shape, s.dtype)
        for i, s in enumerate(feat_shapes)
    ]

    def dec_fn(bundle, f0):
        dp, rest = bundle
        return decoder_forward(dp, [f0, *rest])[0]

    rows.append(component_row("decoder", dec_fn, (params["decoder"], feats[1:]), feats[0]))

    dec_out_shape = jax.eval_shape(
        lambda f0: dec_fn((params["decoder"], feats[1:]), f0),
        jax.ShapeDtypeStruct(feats[0].shape, feats[0].dtype),
    )
    dh_in = jax.random.normal(jax.random.PRNGKey(20), dec_out_shape.shape, dec_out_shape.dtype)
    rows.append(
        component_row("depth_head", lambda p, x: _depth_head_forward(p, x), params["head"], dh_in)
    )

    def lowres_fn(x):
        fs, _ = enc_mod.encoder_forward(enc, enc["patch_encoder"], enc["image_encoder"], x, cfg)
        return decoder_forward(params["decoder"], fs)[1]

    lr_shape = jax.eval_shape(lowres_fn, jax.ShapeDtypeStruct(x_full.shape, x_full.dtype))
    lowres = jax.random.normal(jax.random.PRNGKey(21), lr_shape.shape, lr_shape.dtype)
    if "fov" in params:
        rows.append(
            component_row(
                "fov_head",
                lambda bundle, x: fov_forward(
                    bundle[0], bundle[0].get("encoder"), cfg.fov_encoder, x, bundle[1],
                    cfg.decoder_features, attn_impl=cfg.attn_impl,
                ),
                (params["fov"], lowres),
                x_full,
            )
        )

    img1 = jax.random.normal(jax.random.PRNGKey(22), (1, 3, 384, 384), jnp.bfloat16)
    rows.append(
        component_row(
            "image_vit_1x384",
            lambda p, t: dinov2_forward(p, t, cfg.image_encoder, attn_impl=cfg.attn_impl).x_norm_patchtokens,
            enc["image_encoder"],
            img1,
        )
    )

    record = {
        "peaks": {"tflops": PEAK_TFLOPS / 1e12, "gbs": PEAK_BW / 1e9},
        "int8": int8_mode,
        "backend": jax.default_backend(),
        "rows": rows,
    }
    out = Path(__file__).parent / "roofline.json"
    out.write_text(json.dumps(record, indent=1) + "\n")
    print(json.dumps(record, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
