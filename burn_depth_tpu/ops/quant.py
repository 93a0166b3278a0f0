"""Int8 weight + dynamic activation quantization for the ViT linears.

Serving-only fast path (``Policy.SERVING_INT8``): the v5e MXU runs int8 at 2x
the bf16 rate (394 TOPS vs 197 TFLOP/s), and the Depth Pro 35-tile ViT-L pass
is ~77% of end-to-end time at ~37% MFU (BENCH.md), so int8 matmuls are the
single biggest throughput lever.  Scheme:

* **weights**: per-output-channel symmetric int8, quantized once at load time
  (``quantize_linear_params``); scales kept f32.
* **activations**: per-token (per-row) symmetric int8, quantized dynamically
  in-graph — one VPU abs-max pass that XLA fuses into the preceding layernorm.
* **accumulation**: int32 on the MXU (``preferred_element_type``), dequantized
  as ``int32 * (x_scale x w_scale)`` in f32, bias added in f32.

This is an opt-in relaxed-parity tier; the PARITY/SERVING policies never touch
this path.  The reference has no quantization story (Burn f16 storage / f32
compute only) — this is a TPU-native addition, not a ported component.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax
import jax.numpy as jnp

# Active amax-capture sink for calibration (``capture_amax``).  Only ever set
# during an *eager* calibration forward, so the recorded maxima are concrete.
_CAPTURE: Optional[list] = None
_CAPTURE_METHOD: str = "absmax"
# Active sensitivity sink (``capture_quant_sensitivity``): per-qlinear
# relative int8 output error on the calibration input, in call order.
_SENS: Optional[list] = None


def _clip_value(x: jnp.ndarray, method: str) -> jnp.ndarray:
    """Per-tensor activation clip value for static int8 quantization.

    ``absmax`` — max|x| (the scheme's default; outlier-sensitive: one hot
    channel stretches the step size for every other channel).
    ``p999`` — approximate 99.9th percentile of |x| (2048-bin histogram);
    the top 0.1% of magnitudes saturate at ±127 instead of widening the
    grid — the standard outlier-robust calibration.
    ``mse`` — the clip minimizing the quantization MSE on the calibration
    tensor, searched over a 20-point log grid spanning [amax/316, amax]
    in-graph (log-spaced so a single 100x outlier cannot push every
    candidate past the useful range).
    Values beyond the clip are saturated by ``int8_linear``'s round+clip.
    """
    ax = jnp.abs(x).astype(jnp.float32)
    amax = jnp.maximum(jnp.max(ax), 1e-12)
    if method == "absmax":
        return amax
    if method == "p999":
        bins = 2048
        idx = jnp.clip((ax / amax * bins).astype(jnp.int32), 0, bins - 1)
        counts = jnp.zeros((bins,), jnp.float32).at[idx.ravel()].add(1.0)
        cum = jnp.cumsum(counts)
        k = jnp.argmax(cum >= 0.999 * ax.size)
        return amax * (k.astype(jnp.float32) + 1.0) / bins
    if method == "mse":
        cands = amax * 10.0 ** jnp.linspace(-2.5, 0.0, 20)

        def err(c):
            q = jnp.clip(jnp.round(ax / c * 127.0), 0, 127) * (c / 127.0)
            return jnp.sum((q - ax) ** 2)

        return cands[jnp.argmin(jax.vmap(err)(cands))]
    raise ValueError(f"unknown calibration method {method!r} (want absmax/p999/mse)")


@contextlib.contextmanager
def capture_amax(sink: list, method: str = "absmax"):
    """While active, every ``qlinear`` float call appends its input's clip
    value (a traced jnp scalar; ``method`` picks absmax / p999 / mse — see
    ``_clip_value``) to ``sink``.  The call order is deterministic, so the
    recorded scales can be replayed by ``quantize_vit_blocks`` in the same
    order.  Use via ``calibrate_amax``, which traces the forward ONCE under
    jit — an eager calibration forward costs minutes of op-by-op dispatch
    on a tunnel-attached TPU."""
    global _CAPTURE, _CAPTURE_METHOD
    if _CAPTURE is not None:
        raise RuntimeError("nested capture_amax")
    _CAPTURE = sink
    _CAPTURE_METHOD = method
    try:
        yield sink
    finally:
        _CAPTURE = None
        _CAPTURE_METHOD = "absmax"


def calibrate_amax(fn, *args, method: str = "absmax") -> list:
    """Run ``fn(*args)`` once under jit with clip-value capture; return the
    concrete per-qlinear-input clip values in call order."""

    def wrapper(*a):
        sink: list = []
        with capture_amax(sink, method):
            fn(*a)
        return sink

    vals = jax.jit(wrapper)(*args)
    return [float(v) for v in vals]


@contextlib.contextmanager
def capture_quant_sensitivity(sink: list):
    """While active, every ``qlinear`` float call simulates its own int8
    form (per-channel weights, dynamic per-token activations) and appends
    the relative output error ``‖y_int8 − y‖/‖y‖`` to ``sink`` — the
    per-layer error norm on the calibration input.  The forward itself
    stays float (each linear's error is measured in isolation, not
    compounded), so the scores rank WHERE int8 hurts most.  Use via
    ``calibrate_sensitivity``."""
    global _SENS
    if _SENS is not None:
        raise RuntimeError("nested capture_quant_sensitivity")
    _SENS = sink
    try:
        yield sink
    finally:
        _SENS = None


def calibrate_sensitivity(fn, *args) -> list:
    """One jitted forward of ``fn(*args)``; returns the per-qlinear relative
    int8 output-error norms in call order (the activation-aware sensitivity
    ranking input for mixed quantization)."""

    def wrapper(*a):
        sink: list = []
        with capture_quant_sensitivity(sink):
            fn(*a)
        return sink

    vals = jax.jit(wrapper)(*args)
    return [float(v) for v in vals]


def _sens_record(x: jnp.ndarray, p: dict) -> None:
    """Append this float linear's simulated-int8 relative output error."""
    from burn_depth_tpu.ops.linear import linear

    w = p["weight_hm"] if "weight_hm" in p else p["weight"]
    b = p.get("bias")
    y = linear(x.astype(jnp.float32), w.astype(jnp.float32),
               None if b is None else b.astype(jnp.float32))
    w_i8, w_scale = quantize_weight_per_channel(w)
    yq = int8_linear(x.astype(jnp.float32), w_i8, w_scale,
                     None if b is None else b.astype(jnp.float32), impl="xla")
    rel = jnp.linalg.norm((yq - y).ravel()) / (jnp.linalg.norm(y.ravel()) + 1e-12)
    _SENS.append(rel.astype(jnp.float32))


def weight_quant_error(p: dict) -> float:
    """Weight-only sensitivity proxy: relative Frobenius error of the
    per-channel int8 round-trip of this linear's weight.  No calibration
    data needed — the fallback ranking when no image is available."""
    w = p["weight_hm"] if "weight_hm" in p else p["weight"]
    w32 = jnp.asarray(w, jnp.float32)
    w_i8, scale = quantize_weight_per_channel(w32)
    deq = w_i8.astype(jnp.float32) * scale[None, :]  # [K, N]
    err = jnp.linalg.norm(deq - w32.T) / (jnp.linalg.norm(w32) + 1e-12)
    return float(err)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def quantize_weight_per_channel(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``[O, I]`` torch-layout float weight -> (int8 ``[I, O]``, f32 scale
    ``[O]``).  The transpose to ``[K, N]`` happens once here so the hot-path
    kernel consumes its natural matmul layout."""
    w32 = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w32), axis=1) / 127.0, 1e-12)
    w_i8 = jnp.clip(jnp.round(w32 / scale[:, None]), -127, 127).astype(jnp.int8)
    return w_i8.T, scale


def quantize_linear_params(p: dict, x_scale: Optional[float] = None) -> dict:
    """Convert a ``{"weight", "bias"}`` linear param dict to its int8 form
    ``{"weight_i8" [K, N], "scale" [N], "bias"}`` (bias kept in f32).

    A head-major qkv pack (``weight_hm``, ``parallel/tp_layout.py``) quantizes
    to ``weight_hm_i8`` — same math, permuted output rows — so the int8 tier
    composes with tensor parallelism (``vit_tp_rules_int8``).

    ``x_scale``: a calibrated per-tensor abs-max for this linear's input.
    When given, the activation quantization at run time becomes a pure
    elementwise multiply+round that XLA fuses into the producing op (no
    per-token reduction pass) — measured ~10% faster end-to-end than the
    dynamic-scale path at the ViT-L shapes.
    """
    head_major = "weight_hm" in p
    w_i8, scale = quantize_weight_per_channel(p["weight_hm"] if head_major else p["weight"])
    bias = p.get("bias")
    out = {
        ("weight_hm_i8" if head_major else "weight_i8"): w_i8,
        "scale": scale,
        "bias": None if bias is None else bias.astype(jnp.float32),
    }
    if x_scale is not None:
        out["x_scale"] = jnp.asarray(float(x_scale), jnp.float32)
    return out


def default_int8_impl() -> str:
    """Resolve the int8 matmul implementation.  Overridable via the
    ``BDT_INT8_IMPL`` env var: ``xla`` | ``pallas_stat`` | ``pallas_s8in``
    (the Pallas forms need a static calibrated ``x_scale``; dynamic-scale
    params always use XLA)."""
    import os

    return os.environ.get("BDT_INT8_IMPL", "xla")


def _pallas_int8_enabled() -> bool:
    """Measured on the v5e (benchmarks/int8_kernel_probe.py): the Pallas int8
    kernels run at 84/72 TFLOP/s vs bf16's 128 on the ViT-L block stack —
    Mosaic does not map ``s8 x s8 -> s32`` onto the native-rate int8 MXU path
    — and their 24-block chains take >20 min to compile.  The kernels are
    kept for probing (``BDT_ALLOW_PALLAS_INT8=1`` re-enables them in
    ``int8_linear``); production dispatch falls back to XLA."""
    import os

    return os.environ.get("BDT_ALLOW_PALLAS_INT8", "0") == "1"


def int8_linear(
    x: jnp.ndarray,
    weight_i8: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    x_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``x [..., K] @ w_i8 [K, N]`` with quantized activations.

    ``impl``:
    * ``"xla"`` — ``lax.dot_general`` on s8.  HLO audit: XLA materializes the
      s32 [M, N] accumulator (lowered as `convolution`), costing an HBM
      round-trip per linear (fc1: 330 MB/block).
    * ``"pallas_stat"`` / ``"pallas_s8in"`` — VMEM-resident-accumulator
      kernels (``ops/int8_matmul.py``); need a static ``x_scale``.  The
      ``s8in`` form quantizes in the producer chain (XLA fuses it into the
      preceding layernorm/GELU) and streams 1/2 the activation bytes.
    * ``"auto"`` — ``default_int8_impl()`` when statically calibrated,
      else XLA.

    For the dynamic path, the abs-max / scale math runs in the activation
    dtype (bf16 on the serving path), NOT f32: the f32 upcast doubles the HBM
    traffic of the quantization pass (fc1 99.6 -> 164 TFLOP/s-equivalent by
    switching to bf16 math; BENCH.md round 2).
    """
    if impl == "auto":
        impl = default_int8_impl() if x_scale is not None else "xla"
    if impl in ("pallas_stat", "pallas_s8in") and not _pallas_int8_enabled():
        impl = "xla"
    if impl in ("pallas_stat", "pallas_s8in") and x_scale is not None:
        from burn_depth_tpu.ops.int8_matmul import int8_matmul_s8in, int8_matmul_static

        scale_vec = (x_scale / 127.0) * w_scale
        if impl == "pallas_stat":
            return int8_matmul_static(x, weight_i8, scale_vec, bias, x_scale).astype(x.dtype)
        inv = (127.0 / x_scale).astype(x.dtype)
        x_i8 = jnp.clip(jnp.round((x * inv).astype(jnp.float32)), -127, 127).astype(jnp.int8)
        return int8_matmul_s8in(x_i8, weight_i8, scale_vec, bias, out_dtype=x.dtype)
    if impl == "pallas":
        # same probe-only gate as the static kernels: this dynamic-scale
        # Pallas form is slower than XLA on the current Mosaic and must not
        # be reachable from a stray BDT_INT8_IMPL=pallas in production
        if not _pallas_int8_enabled():
            impl = "xla"
        else:
            from burn_depth_tpu.ops.int8_matmul import _default_interpret, int8_matmul

            return int8_matmul(x, weight_i8, w_scale, bias, interpret=_default_interpret())
    if impl != "xla":
        raise ValueError(f"unknown int8_linear impl `{impl}`")

    if x_scale is not None:
        # static (calibrated) per-tensor scale: the quant is elementwise and
        # fuses into the producer; clipping handles post-calibration outliers.
        inv = (127.0 / x_scale).astype(x.dtype)
        x_i8 = jnp.clip(jnp.round((x * inv).astype(jnp.float32)), -127, 127).astype(jnp.int8)
        import os

        epi = os.environ.get("BDT_INT8_EPILOGUE", "f32")
        if epi == "pref":
            # s8 x s8 dot emitted with a bf16 result type: the [M, N]
            # accumulator XLA materializes in HBM (int8_hlo_audit: 330 MB of
            # s32 per fc1) shrinks to half the bytes and the convert fusion
            # disappears.  Epilogue matches the bf16 form otherwise.
            acc = jax.lax.dot_general(
                x_i8, weight_i8,
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
            scale_vec = ((x_scale / 127.0) * w_scale).astype(jnp.bfloat16)
            out = acc * scale_vec
            if bias is not None:
                out = out + bias.astype(jnp.bfloat16)
            return out.astype(x.dtype)
        if epi == "bf16":
            # v3 of int8_epilogue_probe: folded bf16 scale-vector dequant —
            # 145 vs 112 TFLOP/s-equivalent on the 24-block linear chain.
            # bf16 dequant rounds the epilogue (~0.4%); serving-tier-only.
            acc = jax.lax.dot_general(
                x_i8, weight_i8,
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            scale_vec = ((x_scale / 127.0) * w_scale).astype(jnp.bfloat16)
            out = acc.astype(jnp.bfloat16) * scale_vec
            if bias is not None:
                out = out + bias.astype(jnp.bfloat16)
            return out.astype(x.dtype)
        dq = x_scale / 127.0
    else:
        amax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), jnp.asarray(1e-6, x.dtype))
        inv = jnp.asarray(127.0, x.dtype) / amax
        x_i8 = jnp.clip(jnp.round((x * inv).astype(jnp.float32)), -127, 127).astype(jnp.int8)
        dq = amax.astype(jnp.float32) / 127.0
    acc = jax.lax.dot_general(
        x_i8,
        weight_i8,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * dq * w_scale
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def qlinear(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Dispatch on param-dict form: int8 (``weight_i8``/``weight_hm_i8``) or
    float (``weight``/``weight_hm``)."""
    if "weight_i8" in p:
        return int8_linear(x, p["weight_i8"], p["scale"], p.get("bias"), x_scale=p.get("x_scale"))
    if "weight_hm_i8" in p:
        return int8_linear(
            x, p["weight_hm_i8"], p["scale"], p.get("bias"), x_scale=p.get("x_scale")
        )
    if "weight_hm" in p:
        # head-major TP layout (parallel/tp_layout.py) — same math, permuted
        # rows.  Calibration capture applies here too: head-major trees
        # quantize to weight_hm_i8 (+ x_scale), so skipping the amax append
        # would make quantize_vit(calibration_input) on a to_head_major model
        # run out of scales (StopIteration).
        if _CAPTURE is not None:
            _CAPTURE.append(_clip_value(x, _CAPTURE_METHOD))
        if _SENS is not None:
            _sens_record(x, p)
        from burn_depth_tpu.ops.linear import linear

        return linear(x, p["weight_hm"], p.get("bias"))
    if _CAPTURE is not None:
        _CAPTURE.append(_clip_value(x, _CAPTURE_METHOD))
    if _SENS is not None:
        _sens_record(x, p)
    from burn_depth_tpu.ops.linear import linear

    return linear(x, p["weight"], p.get("bias"))


def qlinear_stacked(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Weight-stacked linear for the dual-encoder pass
    (``vit/dinov2.py::dinov2_forward_stacked``): ``x [S, B, T, K]`` with a
    leading model axis, weights stacked the same way.

    Float form: ``weight [S, O, K]``; int8 form: ``weight_i8 [S, K, N]`` with
    ``scale [S, N]`` (+ optional ``x_scale [S]``).  The batched ``dot_general``
    contracts per-S exactly like the unstacked path, so numerics match the
    two separate passes bit-for-bit.
    """
    if "weight_i8" in p:
        w, w_scale = p["weight_i8"], p["scale"]
        x_scale = p.get("x_scale")
        if x_scale is not None:
            inv = (127.0 / x_scale).astype(x.dtype)[:, None, None, None]
            x_i8 = jnp.clip(jnp.round((x * inv).astype(jnp.float32)), -127, 127).astype(jnp.int8)
            dq = (x_scale / 127.0)[:, None, None, None]
        else:
            amax = jnp.maximum(
                jnp.max(jnp.abs(x), axis=-1, keepdims=True), jnp.asarray(1e-6, x.dtype)
            )
            inv = jnp.asarray(127.0, x.dtype) / amax
            x_i8 = jnp.clip(jnp.round((x * inv).astype(jnp.float32)), -127, 127).astype(jnp.int8)
            dq = amax.astype(jnp.float32) / 127.0
        acc = jax.lax.dot_general(
            x_i8, w, dimension_numbers=(((3,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # [S, B, T, N]
        out = acc.astype(jnp.float32) * dq * w_scale[:, None, None, :]
        if p.get("bias") is not None:
            out = out + p["bias"][:, None, None, :]
        return out.astype(x.dtype)
    w = p["weight"].astype(x.dtype)  # [S, O, K]
    out = jnp.einsum("sbtk,sok->sbto", x, w)
    if p.get("bias") is not None:
        out = out + p["bias"][:, None, None, :].astype(out.dtype)
    return out


# The four hot linears of a DINOv2 block, in qlinear CALL order.  Linear
# index i within an encoder = block*4 + HOT_LINEARS.index(name); the same
# order keys calibration scales, sensitivity scores, and exclusion sets.
HOT_LINEARS = ("qkv", "proj", "fc1", "fc2")


def weight_sensitivity_blocks(vit_params: dict) -> list:
    """Per-linear ``weight_quant_error`` for every hot linear of a DINOv2
    block stack, in call order (len = 4 · depth)."""
    out = []
    for bp in vit_params["blocks"]:
        for name in HOT_LINEARS:
            p = bp["attn"][name] if name in ("qkv", "proj") else bp["mlp"][name]
            out.append(weight_quant_error(p))
    return out


def quantize_vit_blocks(
    vit_params: dict,
    scales: Optional[Iterator[float]] = None,
    exclude: frozenset = frozenset(),
) -> dict:
    """Quantize the four hot linears (qkv/proj/fc1/fc2) of every transformer
    block in a DINOv2 param tree; everything else (patch embed, norms,
    layerscales, tokens) is left untouched.

    ``scales``: iterator of calibrated input clip values in qlinear CALL
    order (qkv, proj, fc1, fc2 per block), as recorded by ``capture_amax``
    during a calibration forward.  None -> dynamic per-token scales.

    ``exclude``: linear indices (call order, ``block*4 + HOT_LINEARS``
    position) to LEAVE FLOAT — the mixed-quantization escape hatch for
    int8-sensitive layers (``DepthPro.quantize_vit(exclude_k=...)``).
    Excluded linears still consume their calibration scale so the iterator
    stays aligned with the float forward that recorded it.
    """
    idx = 0

    def q(p):
        nonlocal idx
        scale = None if scales is None else next(scales)
        skip = idx in exclude
        idx += 1
        return dict(p) if skip else quantize_linear_params(p, x_scale=scale)

    out = dict(vit_params)
    blocks = []
    for bp in vit_params["blocks"]:
        nb = dict(bp)
        attn = dict(bp["attn"])
        attn["qkv"] = q(attn["qkv"])
        attn["proj"] = q(attn["proj"])
        nb["attn"] = attn
        mlp = dict(bp["mlp"])
        mlp["fc1"] = q(mlp["fc1"])
        mlp["fc2"] = q(mlp["fc2"])
        nb["mlp"] = mlp
        blocks.append(nb)
    out["blocks"] = blocks
    return out
