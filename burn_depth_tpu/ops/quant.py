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


@contextlib.contextmanager
def capture_amax(sink: list):
    """While active, every ``qlinear`` float call appends ``max|x|`` of its
    input to ``sink``.  Run the model EAGERLY (un-jitted) under this context;
    the call order is deterministic, so the recorded scales can be replayed
    by ``quantize_vit_blocks`` in the same order."""
    global _CAPTURE
    if _CAPTURE is not None:
        raise RuntimeError("nested capture_amax")
    _CAPTURE = sink
    try:
        yield sink
    finally:
        _CAPTURE = None


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

    ``x_scale``: a calibrated per-tensor abs-max for this linear's input.
    When given, the activation quantization at run time becomes a pure
    elementwise multiply+round that XLA fuses into the producing op (no
    per-token reduction pass) — measured ~10% faster end-to-end than the
    dynamic-scale path at the ViT-L shapes.
    """
    w_i8, scale = quantize_weight_per_channel(p["weight"])
    bias = p.get("bias")
    out = {
        "weight_i8": w_i8,
        "scale": scale,
        "bias": None if bias is None else bias.astype(jnp.float32),
    }
    if x_scale is not None:
        out["x_scale"] = jnp.asarray(float(x_scale), jnp.float32)
    return out


def int8_linear(
    x: jnp.ndarray,
    weight_i8: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    x_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``x [..., K] @ w_i8 [K, N]`` with dynamically-quantized activations.

    The abs-max / scale math runs in the activation dtype (bf16 on the
    serving path), NOT f32: the f32 upcast doubles the HBM traffic of the
    quantization pass and was measured to erase most of the int8 MXU win
    (fc1 99.6 -> 164 TFLOP/s-equivalent by switching to bf16 math; BENCH.md
    round 2).  The int32->f32 dequant is exact either way.

    ``impl``: ``"auto"``/``"xla"`` (XLA dot; its int8 path reaches
    180-200 TOPS at the MLP shapes), ``"pallas"`` (experimental
    weight-resident kernel — measured SLOWER, kept for reference).
    """
    if impl in ("auto", "xla"):
        pass
    elif impl == "pallas":
        from burn_depth_tpu.ops.int8_matmul import int8_matmul

        return int8_matmul(x, weight_i8, w_scale, bias)
    else:
        raise ValueError(f"unknown int8_linear impl `{impl}`")

    if x_scale is not None:
        # static (calibrated) per-tensor scale: the quant is elementwise and
        # fuses into the producer; clipping handles post-calibration outliers.
        inv = (127.0 / x_scale).astype(x.dtype)
        x_i8 = jnp.clip(jnp.round((x * inv).astype(jnp.float32)), -127, 127).astype(jnp.int8)
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
    """Dispatch on param-dict form: int8 (``weight_i8``) or float (``weight``)."""
    if "weight_i8" in p:
        return int8_linear(x, p["weight_i8"], p["scale"], p.get("bias"), x_scale=p.get("x_scale"))
    if _CAPTURE is not None:
        _CAPTURE.append(float(jnp.max(jnp.abs(x))))
    from burn_depth_tpu.ops.linear import linear

    return linear(x, p["weight"], p.get("bias"))


def quantize_vit_blocks(vit_params: dict, scales: Optional[Iterator[float]] = None) -> dict:
    """Quantize the four hot linears (qkv/proj/fc1/fc2) of every transformer
    block in a DINOv2 param tree; everything else (patch embed, norms,
    layerscales, tokens) is left untouched.

    ``scales``: iterator of calibrated input abs-maxima in qlinear CALL order
    (qkv, proj, fc1, fc2 per block), as recorded by ``capture_amax`` during an
    eager forward.  None -> dynamic per-token scales.
    """

    def q(p):
        return quantize_linear_params(p, x_scale=None if scales is None else next(scales))

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
