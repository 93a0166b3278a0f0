"""Environment diagnostics: one command to answer "why doesn't it work here?".

    python -m burn_depth_tpu.cli.doctor            # full report (touches the device)
    python -m burn_depth_tpu.cli.doctor --no-device  # host-only checks

Reports package/jax versions, backend + devices (with graceful degrade when
the TPU is unreachable — the same UNAVAILABLE path bench.py handles), the
native host library (presence, ABI version, bit-exactness spot-check vs the
numpy oracle), compile-cache directories, and a tiny jit sanity run.
Exit code 0 = everything usable (CPU-only counts as usable: every feature
has a CPU/numpy fallback); 1 = a check found real breakage.
"""

from __future__ import annotations

import argparse
import os
import sys


def _line(status: str, name: str, detail: str = "") -> None:
    print(f"[{status:^4}] {name}" + (f": {detail}" if detail else ""), flush=True)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="burn_depth_tpu environment diagnostics")
    parser.add_argument("--no-device", action="store_true",
                        help="skip backend init / device checks (host-only report)")
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                        help="pin the JAX platform for the device checks")
    args = parser.parse_args(argv)

    failures = 0

    import burn_depth_tpu

    _line("ok", "burn_depth_tpu", burn_depth_tpu.__version__)

    import jax
    import jaxlib

    _line("ok", "jax / jaxlib", f"{jax.__version__} / {jaxlib.__version__}")

    # ---- native host library ------------------------------------------------
    import numpy as np

    from burn_depth_tpu.api import native

    if native.available():
        ver = native._load().bd_version()
        img = np.random.default_rng(0).integers(0, 256, (17, 23, 3), np.uint8)
        got = native.resize_bicubic_u8(img, 9, 11)
        from burn_depth_tpu.api.preprocess import resize_bicubic

        if np.array_equal(got, resize_bicubic(img, 9, 11)):
            _line("ok", "native host lib", f"ABI v{ver}, bit-exact vs numpy oracle")
        else:
            _line("FAIL", "native host lib", f"ABI v{ver} but resize DIVERGES from the numpy oracle")
            failures += 1
        if ver < 3:
            _line("warn", "native host lib",
                  "ABI < v3: fast_jpeg/exif_rotate inactive — rebuild with `make -C native`")
    else:
        _line("warn", "native host lib",
              "not built (PIL fallbacks active; `make -C native` for the fast ingest lane)")

    # ---- compile caches -------------------------------------------------------
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for label, d in [("bench compile cache", os.path.join(repo, ".jax_cache")),
                     ("test compile cache", os.path.join(repo, "tests", ".jax_test_cache"))]:
        if os.path.isdir(d) and os.listdir(d):
            _line("ok", label, f"{len(os.listdir(d))} entries")
        else:
            _line("info", label, "empty (first runs pay full compiles)")

    # ---- device / backend -----------------------------------------------------
    if args.no_device:
        _line("info", "device checks", "skipped (--no-device)")
        return 1 if failures else 0

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        backend = jax.default_backend()
        devices = jax.devices()
    except RuntimeError as e:
        _line("warn", "backend", f"unavailable ({str(e)[:120]}); retrying on CPU")
        jax.config.update("jax_platforms", "cpu")
        backend = jax.default_backend()
        devices = jax.devices()
    _line("ok", "backend", f"{backend}, {len(devices)} device(s): "
          + ", ".join(str(d) for d in devices[:4])
          + ("..." if len(devices) > 4 else ""))

    import time

    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jnp.ones((256, 256), jnp.bfloat16)
    out = jax.jit(lambda a: (a @ a).sum())(x)
    val = float(jax.device_get(out))
    dt = time.perf_counter() - t0
    if abs(val - 256.0**3) / 256.0**3 < 1e-2:
        _line("ok", "jit sanity", f"256² bf16 matmul correct in {dt:.2f}s (incl. compile)")
    else:
        _line("FAIL", "jit sanity", f"matmul returned {val}, expected {256.0 ** 3}")
        failures += 1

    if failures:
        _line("FAIL", "doctor", f"{failures} check(s) failed")
        return 1
    _line("ok", "doctor", "all checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
