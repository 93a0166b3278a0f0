"""Depth Pro top-level model (reference ``src/model/depth_pro/mod.rs``).

The full ``infer`` — input resize, 3-scale encoder with the batched 35-tile
ViT pass, decoder, depth head, FOV head, focal math, output resize — is one
pure function that jit-compiles to a single XLA program with zero host
round-trips (the reference crosses device↔host on every custom resize,
SURVEY.md §3.1).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from burn_depth_tpu.models.depth_pro import encoder as enc_mod
from burn_depth_tpu.models.depth_pro.decoder import decoder_forward, init_decoder
from burn_depth_tpu.models.depth_pro.fov import fov_forward, init_fov
from burn_depth_tpu.ops.activations import relu
from burn_depth_tpu.ops.conv import conv2d, conv_transpose2d
from burn_depth_tpu.ops.interpolate import resize_bilinear
from burn_depth_tpu.vit.dinov2 import DinoViTConfig, init_dinov2


def _l16_vit(img_size: int) -> DinoViTConfig:
    """The ``dinov2l16_384`` preset family (``vit.rs:20-43``): ViT-L/16 with
    quiet-softmax and register tokens disabled (``vit.rs:60-63``)."""
    return DinoViTConfig.vitl(img_size, 16)


@dataclasses.dataclass(frozen=True)
class DepthProConfig:
    """Reference ``DepthProConfig`` (``mod.rs:35-66``) with the ViT presets
    inlined as configs instead of preset strings."""

    patch_encoder: DinoViTConfig = dataclasses.field(default_factory=lambda: _l16_vit(384))
    image_encoder: DinoViTConfig = dataclasses.field(default_factory=lambda: _l16_vit(384))
    fov_encoder: Optional[DinoViTConfig] = dataclasses.field(default_factory=lambda: _l16_vit(384))
    decoder_features: int = 256
    encoder_feature_dims: tuple[int, int, int, int] = (256, 512, 1024, 1024)
    hook_ids: tuple[int, int] = (5, 11)
    use_fov_head: bool = True
    attn_impl: str = "auto"
    # Training knob: run the 35-tile patch-ViT pass as a rematerialized
    # ``lax.scan`` over this many tile chunks (must divide the tile count;
    # 5 or 7 for the flagship).  0 = one batched pass (serving default).
    # Shrinks the backward HLO ~chunk-fold so the 1536² fine-tune compiles.
    tile_chunks: int = 0

    @property
    def img_size(self) -> int:
        """Full working resolution = 4x the patch window (``encoder.rs:140``)."""
        return self.patch_encoder.img_size * 4

    @staticmethod
    def dinov2_l16_384() -> "DepthProConfig":
        return DepthProConfig()

    @staticmethod
    def dinov2_l16_128() -> "DepthProConfig":
        """The reference's reduced test preset (512² working res, ``vit.rs:33-40``)."""
        return DepthProConfig(
            patch_encoder=_l16_vit(128), image_encoder=_l16_vit(128), fov_encoder=_l16_vit(128)
        )

    @staticmethod
    def tiny_test(depth: int = 2, embed_dim: int = 64, heads: int = 2) -> "DepthProConfig":
        """A miniature config for fast CPU tests (not a reference preset).

        Keeps the reference test-preset geometry — patch 16, window 128, grid 8
        (``DINOV2_L16_128``, ``vit.rs:33-40``) — because the split/merge seam
        ladder and the 1/16 feature-to-image ratio only line up for that shape;
        just the transformer itself is shrunk.
        """
        vit = DinoViTConfig(
            img_size=128, patch_size=16, embed_dim=embed_dim, depth=depth, num_heads=heads
        )
        return DepthProConfig(
            patch_encoder=vit,
            image_encoder=vit,
            fov_encoder=vit,
            decoder_features=16,
            encoder_feature_dims=(16, 24, 32, 32),
            hook_ids=(0, 1),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DepthProInference:
    """Reference ``DepthProInference`` (``mod.rs:128-133``).  Registered as a
    pytree so it can be a jit output."""

    depth: jnp.ndarray  # [B, H, W] metric depth
    focallength_px: jnp.ndarray  # [B]
    fovx_deg: jnp.ndarray  # [B]
    fovy_rad: jnp.ndarray  # [B]


def fovy_from_fovx_rad(fovx_rad: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """``fovy = 2·atan((H/W)·tan(fovx/2))`` — exact.  The reference's Rajan
    polynomial (``mod.rs:370-414``) existed only because Burn lacked atan;
    exact atan is strictly closer to the PyTorch golden values."""
    return 2.0 * jnp.arctan((h / w) * jnp.tan(fovx_rad * 0.5))


def _init_depth_head(rng: jax.Array, dim_decoder: int, dtype=jnp.float32) -> dict:
    """``DepthHead::new`` (``mod.rs:76-103``); ``conv_out`` bias is zero-init
    like the reference (``mod.rs:92-95``)."""
    from burn_depth_tpu.models.da3.dpt import _conv_init, _convT_init

    k = jax.random.split(rng, 4)
    head = {
        "conv0": _conv_init(k[0], dim_decoder // 2, dim_decoder, 3, 3, dtype=dtype),
        "deconv": _convT_init(k[1], dim_decoder // 2, dim_decoder // 2, 2, 2, dtype=dtype),
        "conv1": _conv_init(k[2], 32, dim_decoder // 2, 3, 3, dtype=dtype),
        "conv_out": _conv_init(k[3], 1, 32, 1, 1, dtype=dtype),
    }
    head["conv_out"]["bias"] = jnp.zeros_like(head["conv_out"]["bias"])
    return head


def head_to_nhwc(p: dict) -> dict:
    """Serving-layout transform for the depth head (see ``decoder_to_nhwc``)."""
    from burn_depth_tpu.ops.conv import conv_weight_to_hwio, convt_weight_to_hwio

    out = {
        name: {"weight_hwio": conv_weight_to_hwio(p[name]["weight"]), "bias": p[name]["bias"]}
        for name in ("conv0", "conv1", "conv_out")
    }
    out["deconv"] = {"weight_hwio": convt_weight_to_hwio(p["deconv"]["weight"]), "bias": p["deconv"]["bias"]}
    return out


def fuse_depth_head(p: dict) -> dict:
    """Exact algebraic fusion of the head's ``deconv(2x2,s2) -> conv1(3x3)``
    pair (serving transform).

    The reference head (``mod.rs:105-112``) has NO nonlinearity between the
    deconv and conv1, so the pair is one linear map.  Each output phase
    ``(di,dj)`` of the stride-2 upsample reads a 2x2 window of the deconv's
    input, so the composite is a single 3x3 conv at the LOW resolution
    producing ``4·32`` phase-packed channels — full 128-lane MXU tiles at
    768² instead of a 32-channel conv at 1536² (measured 54 TFLOP/s, the
    model's worst MXU shape) plus a zero-inserting deconv lowering.

    The deconv bias flows through conv1's taps; with zero padding its
    contribution is constant in the interior and loses exactly the taps that
    fall outside the map at the 1-pixel border.  Row/col validity separate,
    so the correction is 4 edge vectors + 4 corner add-backs
    (inclusion–exclusion), applied to the phase-packed map before relu.

    ``conv_out`` (1x1, 32->1, per phase) commutes with the final
    depth-to-space and becomes a 4-group pointwise conv — the relayout then
    moves 1 channel at 768²x4 instead of 32 at 1536².
    """
    f32 = jnp.float32
    w1 = p["conv1"]["weight"].astype(f32)  # [M=32, C, 3, 3]
    b1 = p["conv1"]["bias"].astype(f32)  # [M]
    wd = p["deconv"]["weight"].astype(f32)  # [C, C, 2, 2] (torch convT [I,O,kh,kw])
    bd = p["deconv"]["bias"].astype(f32)  # [C]
    m_ch, c_in = w1.shape[0], w1.shape[1]
    dtype = p["conv1"]["weight"].dtype

    # (conv1 tap a, deconv phase dr, composite tap u) for output phase d:
    # out row 2i+d reads z rows 2i+d+a-1 = 2·(i+u-1) + dr.
    def taps(d):
        return [(0, 1, 0), (1, 0, 1), (2, 1, 1)] if d == 0 else [(0, 0, 1), (1, 1, 1), (2, 0, 2)]

    k = jnp.zeros((2, 2, m_ch, c_in, 3, 3), f32)
    for di in (0, 1):
        for a, dr, u in taps(di):
            for dj in (0, 1):
                for bta, dc, v in taps(dj):
                    contrib = jnp.einsum("mo,co->mc", w1[:, :, a, bta], wd[:, :, dr, dc])
                    k = k.at[di, dj, :, :, u, v].add(contrib)
    k = k.reshape(4 * m_ch, c_in, 3, 3)  # out-channel order (di, dj, m)

    # deconv-bias-through-conv1 table S[a, b, m] and its edge/corner sums
    s = jnp.einsum("moab,o->abm", w1, bd)  # [3, 3, M]
    total = s.sum(axis=(0, 1))  # [M] — all 9 taps (interior)
    zeros = jnp.zeros_like(total)

    def phases(vecs):  # [4, M] -> [4M] in (di, dj, m) order
        return jnp.concatenate(vecs)

    r0, r2 = s[0].sum(0), s[2].sum(0)
    c0, c2 = s[:, 0].sum(0), s[:, 2].sum(0)
    fused = {
        "weight": k.astype(dtype),
        "bias": jnp.tile(total + b1, 4).astype(dtype),
        # edge corrections: the dropped-tap sums, per phase (di, dj)
        "row0": phases([-r0, -r0, zeros, zeros]).astype(dtype),  # di=0 at i=0
        "rowl": phases([zeros, zeros, -r2, -r2]).astype(dtype),  # di=1 at i=H-1
        "col0": phases([-c0, zeros, -c0, zeros]).astype(dtype),  # dj=0 at j=0
        "coll": phases([zeros, -c2, zeros, -c2]).astype(dtype),  # dj=1 at j=W-1
        # corner add-backs (row & col drops overlap)
        "c00": phases([s[0, 0], zeros, zeros, zeros]).astype(dtype),
        "c0l": phases([zeros, s[0, 2], zeros, zeros]).astype(dtype),
        "cl0": phases([zeros, zeros, s[2, 0], zeros]).astype(dtype),
        "cll": phases([zeros, zeros, zeros, s[2, 2]]).astype(dtype),
    }
    wout = p["conv_out"]["weight"].astype(f32)  # [1, M, 1, 1]
    bout = p["conv_out"]["bias"].astype(f32)  # [1]
    out_grouped = {
        "weight": jnp.tile(wout, (4, 1, 1, 1)).astype(dtype),  # [4, M, 1, 1], groups=4
        "bias": jnp.tile(bout, 4).astype(dtype),
    }
    return {"conv0": dict(p["conv0"]), "fused": fused, "out_grouped": out_grouped}


def _depth_head_forward_fused(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Fused-head forward (see ``fuse_depth_head``); NCHW in/out."""
    f = p["fused"]
    x = conv2d(x, p["conv0"]["weight"], p["conv0"]["bias"], padding=1)
    y = conv2d(x, f["weight"], f["bias"], padding=1)  # [B, 4M, H, W]
    y = y.at[:, :, 0, :].add(f["row0"][None, :, None])
    y = y.at[:, :, -1, :].add(f["rowl"][None, :, None])
    y = y.at[:, :, :, 0].add(f["col0"][None, :, None])
    y = y.at[:, :, :, -1].add(f["coll"][None, :, None])
    y = y.at[:, :, 0, 0].add(f["c00"][None, :])
    y = y.at[:, :, 0, -1].add(f["c0l"][None, :])
    y = y.at[:, :, -1, 0].add(f["cl0"][None, :])
    y = y.at[:, :, -1, -1].add(f["cll"][None, :])
    y = relu(y)
    y = conv2d(y, p["out_grouped"]["weight"], p["out_grouped"]["bias"], groups=4)  # [B, 4, H, W]
    y = relu(y)
    b, _, h, w = y.shape
    # depth-to-space: channel (di, dj) -> pixel (2i+di, 2j+dj)
    y = y.reshape(b, 2, 2, h, w).transpose(0, 3, 1, 4, 2).reshape(b, 1, 2 * h, 2 * w)
    return y


def _depth_head_forward(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """``DepthHead::forward`` (``mod.rs:105-112``)."""
    if "fused" in p:
        return _depth_head_forward_fused(p, x)
    if "weight_hwio" in p["conv0"]:
        from burn_depth_tpu.models.depth_pro.decoder import (
            _pallas_conv3_mode,
            _wino_conv3,
            _wino_ok,
        )
        from burn_depth_tpu.ops.conv import conv2d_nhwc, conv_transpose2d_nhwc

        mode = _pallas_conv3_mode()
        x = jnp.transpose(x, (0, 2, 3, 1))
        if _wino_conv3() and _wino_ok(x):
            # Winograd for conv0 (256->128 @768² — the model's worst conv
            # under XLA, 34 TFLOP/s); conv1 @1536² O=32 stays XLA (2·O=64
            # lanes would underfill the 128-lane VPU/MXU tiles).
            from burn_depth_tpu.ops.winograd3x3_pallas import conv3x3_wino_pallas

            from burn_depth_tpu.models.depth_pro.decoder import _wino_kwargs

            x = conv3x3_wino_pallas(x, p["conv0"]["weight_hwio"], p["conv0"]["bias"],
                                    **_wino_kwargs())
            x = conv_transpose2d_nhwc(x, p["deconv"]["weight_hwio"], p["deconv"]["bias"], stride=2)
            x = relu(conv2d_nhwc(x, p["conv1"]["weight_hwio"], p["conv1"]["bias"], padding=1))
        elif mode == "head0":
            # Pallas only for conv0 (the isolated 29% win); conv1 @1536² O=32
            # stays XLA (32/128 lanes is pathological for the kernel).
            from burn_depth_tpu.ops.conv3x3_pallas import conv3x3_nhwc_pallas

            x = conv3x3_nhwc_pallas(x, p["conv0"]["weight_hwio"], p["conv0"]["bias"])
            x = conv_transpose2d_nhwc(x, p["deconv"]["weight_hwio"], p["deconv"]["bias"], stride=2)
            x = relu(conv2d_nhwc(x, p["conv1"]["weight_hwio"], p["conv1"]["bias"], padding=1))
        elif mode == "1":
            from burn_depth_tpu.ops.conv3x3_pallas import conv3x3_nhwc_pallas

            x = conv3x3_nhwc_pallas(x, p["conv0"]["weight_hwio"], p["conv0"]["bias"])
            x = conv_transpose2d_nhwc(x, p["deconv"]["weight_hwio"], p["deconv"]["bias"], stride=2)
            x = conv3x3_nhwc_pallas(x, p["conv1"]["weight_hwio"], p["conv1"]["bias"], relu_out=True)
        else:
            x = conv2d_nhwc(x, p["conv0"]["weight_hwio"], p["conv0"]["bias"], padding=1)
            x = conv_transpose2d_nhwc(x, p["deconv"]["weight_hwio"], p["deconv"]["bias"], stride=2)
            x = relu(conv2d_nhwc(x, p["conv1"]["weight_hwio"], p["conv1"]["bias"], padding=1))
        x = conv2d_nhwc(x, p["conv_out"]["weight_hwio"], p["conv_out"]["bias"])
        return jnp.transpose(relu(x), (0, 3, 1, 2))
    x = conv2d(x, p["conv0"]["weight"], p["conv0"]["bias"], padding=1)
    x = conv_transpose2d(x, p["deconv"]["weight"], p["deconv"]["bias"], stride=2)
    x = conv2d(x, p["conv1"]["weight"], p["conv1"]["bias"], padding=1)
    x = relu(x)
    x = conv2d(x, p["conv_out"]["weight"], p["conv_out"]["bias"])
    return relu(x)


class DepthPro:
    """Holds ``(config, params)``; all compute is pure functions underneath."""

    def __init__(self, config: DepthProConfig, params: dict):
        self.config = config
        self.params = params

    @staticmethod
    def init(rng: jax.Array, config: DepthProConfig, dtype=jnp.float32) -> "DepthPro":
        k = jax.random.split(rng, 6)
        decoder_dims = [config.decoder_features, *config.encoder_feature_dims]
        params = {
            "encoder": {
                "patch_encoder": init_dinov2(k[0], config.patch_encoder, dtype),
                "image_encoder": init_dinov2(k[1], config.image_encoder, dtype),
                **enc_mod.init_encoder(k[2], config, dtype),
            },
            "decoder": init_decoder(k[3], decoder_dims, config.decoder_features, dtype),
            "head": _init_depth_head(k[4], config.decoder_features, dtype),
        }
        if config.use_fov_head:
            fov = {"encoder": None}
            fov_dim = None
            if config.fov_encoder is not None:
                fov["encoder"] = init_dinov2(jax.random.split(k[5])[0], config.fov_encoder, dtype)
                fov_dim = config.fov_encoder.embed_dim
            fov.update(init_fov(jax.random.split(k[5])[1], config.decoder_features, fov_dim, dtype))
            params["fov"] = fov
        return DepthPro(config, params)

    @staticmethod
    def load(checkpoint: str) -> "DepthPro":
        """Load from a checkpoint with the default flagship config
        (reference ``DepthPro::load``, ``mod.rs:190-208``)."""
        return DepthPro.load_with_config(checkpoint, DepthProConfig.dinov2_l16_384())

    @staticmethod
    def load_quantized(checkpoint: str, config: Optional["DepthProConfig"] = None,
                       dtype=jnp.bfloat16) -> "DepthPro":
        """Load a pre-calibrated int8 serving checkpoint — a tree produced by
        ``quantize_vit(calibration_input)`` and saved with
        ``io.checkpoint.save_checkpoint`` (or ``cli.quantize``).  Skips the
        load-time calibration forward entirely: the int8 weights, per-channel
        scales, and static activation scales come from the file."""
        from burn_depth_tpu.io.checkpoint import load_checkpoint

        config = config or DepthProConfig.dinov2_l16_384()
        template = DepthPro.init(jax.random.PRNGKey(0), config, dtype=dtype).quantize_vit(
            unit_scales=True
        )
        return DepthPro(config, load_checkpoint(checkpoint, template.params))

    @staticmethod
    def load_with_config(checkpoint: str, config: "DepthProConfig") -> "DepthPro":
        """Reference ``DepthPro::load_with_config``: native flattened
        safetensors or an upstream PyTorch ``.pt`` both work (the importer's
        regex remaps run only for the latter)."""
        from burn_depth_tpu.api.registry import _is_native_checkpoint
        from burn_depth_tpu.io.checkpoint import load_checkpoint
        from burn_depth_tpu.io.importers import import_depth_pro

        if _is_native_checkpoint(checkpoint):
            template = DepthPro.init(jax.random.PRNGKey(0), config).params
            return DepthPro(config, load_checkpoint(checkpoint, template))
        model, _ = import_depth_pro(checkpoint, config=config)
        return model

    @property
    def img_size(self) -> int:
        return self.config.img_size

    def to_nhwc_tail(self, head: bool = True, decoder: bool = True) -> "DepthPro":
        """Serving-layout transform: run the decoder and/or depth head in
        NHWC (the TPU's native feature-minor conv layout).  Checkpoint-facing
        params keep torch NCHW; compose with ``quantize_vit`` freely.
        Selective application lets the serving config pick per-component
        (the head-probe bytes data shows layout cost differs by stage)."""
        from burn_depth_tpu.models.depth_pro.decoder import decoder_to_nhwc

        params = dict(self.params)
        if decoder:
            params["decoder"] = decoder_to_nhwc(params["decoder"])
        if head:
            params["head"] = head_to_nhwc(params["head"])
        return DepthPro(self.config, params)

    def fuse_tail(self, head: bool = True, decoder: bool = True) -> "DepthPro":
        """Serving transform: algebraically fuse the head's deconv→conv1 pair
        into one phase-packed 3x3 conv (``fuse_depth_head``) and fold each
        decoder fusion block's 1x1 ``out_conv`` into its preceding deconv
        weights (``fold_decoder_outconv``).  Numerics-preserving up to one
        f32 weight-product rounding; NCHW params (apply before
        ``to_nhwc_tail``-style layout changes, which it does not compose
        with)."""
        from burn_depth_tpu.models.depth_pro.decoder import fold_decoder_outconv

        params = dict(self.params)
        if decoder:
            params["decoder"] = fold_decoder_outconv(params["decoder"])
        if head:
            params["head"] = fuse_depth_head(params["head"])
        return DepthPro(self.config, params)

    def _vit_linear_names(self) -> list:
        """Global qlinear call-order names — ``{encoder}.{block}.{linear}``
        over patch → image → fov encoders.  Index into this list = the
        global linear index used by sensitivity rankings and ``exclude``."""
        from burn_depth_tpu.ops.quant import HOT_LINEARS

        names = []
        for enc_name, tree in self._vit_encoder_trees():
            for b in range(len(tree["blocks"])):
                names.extend(f"{enc_name}.{b}.{lin}" for lin in HOT_LINEARS)
        return names

    def _vit_encoder_trees(self) -> list:
        out = [
            ("patch_encoder", self.params["encoder"]["patch_encoder"]),
            ("image_encoder", self.params["encoder"]["image_encoder"]),
        ]
        if "fov" in self.params and self.params["fov"].get("encoder") is not None:
            out.append(("fov", self.params["fov"]["encoder"]))
        return out

    def rank_vit_sensitivity(
        self, calibration_input: Optional[jnp.ndarray] = None
    ) -> list:
        """Per-linear int8 sensitivity ranking, most-sensitive first:
        ``[(global_index, name, score), ...]``.

        With ``calibration_input``: activation-aware — one jitted float
        forward measuring each linear's simulated-int8 relative output
        error on that input (``ops/quant.py::calibrate_sensitivity``).
        Without: the weight-only quant-error proxy (no data needed).  Feeds
        ``quantize_vit(exclude_k=...)`` — the mixed tier that drops the k
        worst linears back to float when full int8 breaks the accuracy
        gate (graceful degradation instead of the binary BENCH_INT8=0)."""
        from burn_depth_tpu.ops.quant import (
            calibrate_sensitivity,
            weight_sensitivity_blocks,
        )

        if calibration_input is not None:
            scores = calibrate_sensitivity(
                lambda p, x: self._infer_fn(p, x).depth, self.params, calibration_input
            )
        else:
            scores = []
            for _name, tree in self._vit_encoder_trees():
                scores.extend(weight_sensitivity_blocks(tree))
        names = self._vit_linear_names()
        assert len(scores) == len(names), (len(scores), len(names))
        ranked = sorted(zip(range(len(names)), names, scores), key=lambda t: -t[2])
        return ranked

    def quantize_vit(
        self,
        calibration_input: Optional[jnp.ndarray] = None,
        *,
        unit_scales: bool = False,
        exclude_k: int = 0,
        exclude: Optional[set] = None,
        exclude_patch_fc2: int = 0,
        calib_method: str = "absmax",
    ) -> "DepthPro":
        """Opt-in int8 serving tier (``Policy.SERVING_INT8``): per-channel
        int8 weights + quantized activations on every ViT-block linear in all
        three encoders (patch/image/fov).  Convs, norms and the decoder/head
        stay in the float policy.  See ``ops/quant.py``.

        ``calibration_input``: optional ``[B, 3, S, S]`` batch.  When given,
        one jitted float forward records per-tensor activation clip values
        and the quantizers use static scales (the quant fuses into the
        producing op — faster than the default dynamic per-token scales).

        ``calib_method``: static-scale calibration: ``absmax`` (default) /
        ``p999`` (99.9th-percentile clip) / ``mse`` (MSE-optimal clip) —
        the outlier-robust alternatives (``ops/quant.py::_clip_value``).

        ``exclude_k`` / ``exclude``: mixed quantization — leave the k most
        int8-sensitive linears (per ``rank_vit_sensitivity``; activation-
        aware when calibrating, weight-only otherwise) or an explicit set of
        global linear indices in float.  The measured frontier sits between
        full int8 and the all-float tanh tier (BENCH.md round 5).

        ``exclude_patch_fc2``: keep the fc2 of that many EVENLY-SPACED
        patch-encoder blocks in float.  This is a measured SPEED
        optimization, not an accuracy knob: on the v5e, breaking the
        24-identical-block periodicity of the int8 patch-ViT at ~4 points
        lets XLA schedule the whole program ~9% faster (168 → ~153 ms
        end-to-end at 1536²; BENCH.md round 5 — reproduced across
        processes and block choices, non-monotone in the count: 2 → 160 ms,
        4 → 153 ms, 8 → 166 ms, all 24 → 178 ms).  Since it strictly
        REMOVES quantization, its drift is bounded by full int8's.
        Composes with ``exclude``/``exclude_k`` (union of exclusions).

        ``unit_scales``: build the static-scale STRUCTURE with placeholder
        1.0 activation scales and no calibration forward — the load template
        for pre-calibrated int8 checkpoints (``load_quantized``)."""
        import itertools

        from burn_depth_tpu.ops.quant import calibrate_amax, quantize_vit_blocks

        if exclude is None:
            exclude = set()
            if exclude_k > 0:
                ranked = self.rank_vit_sensitivity(calibration_input)
                exclude = {idx for idx, _n, _s in ranked[:exclude_k]}
        else:
            exclude = set(exclude)
        if exclude_patch_fc2 > 0:
            from burn_depth_tpu.ops.quant import HOT_LINEARS

            d = len(self.params["encoder"]["patch_encoder"]["blocks"])
            k = min(exclude_patch_fc2, d)
            blocks = {min(d - 1, round((i + 0.5) * d / k)) for i in range(k)}
            fc2_pos = HOT_LINEARS.index("fc2")
            exclude |= {4 * b + fc2_pos for b in blocks}  # patch encoder = offset 0

        scales = None
        if unit_scales:
            scales = itertools.repeat(1.0)
        elif calibration_input is not None:
            scales = iter(
                calibrate_amax(
                    lambda p, x: self._infer_fn(p, x).depth,
                    self.params,
                    calibration_input,
                    method=calib_method,
                )
            )

        params = dict(self.params)
        enc = dict(params["encoder"])
        # quantization order must match the forward's qlinear CALL order:
        # patch encoder blocks, then image encoder, then fov encoder.
        # Exclusion indices are global over that order; re-base per encoder.
        sizes = [4 * len(tree["blocks"]) for _n, tree in self._vit_encoder_trees()]
        offs = [sum(sizes[:i]) for i in range(len(sizes))]

        def local_excl(i):
            lo, hi = offs[i], offs[i] + sizes[i]
            return frozenset(g - lo for g in exclude if lo <= g < hi)

        enc["patch_encoder"] = quantize_vit_blocks(enc["patch_encoder"], scales, local_excl(0))
        enc["image_encoder"] = quantize_vit_blocks(enc["image_encoder"], scales, local_excl(1))
        params["encoder"] = enc
        if "fov" in params and params["fov"].get("encoder") is not None:
            fov = dict(params["fov"])
            fov["encoder"] = quantize_vit_blocks(fov["encoder"], scales, local_excl(2))
            params["fov"] = fov
        return DepthPro(self.config, params)

    def stack_dual_encoders(self) -> "DepthPro":
        """Serving transform: run the global image encoder and the FOV
        encoder — two B=1 ViT-L passes over the SAME 384² pyramid level
        (``encoder.rs:409-415``, ``fov.rs:189-227``) — as ONE weight-stacked
        pass (``vit/dinov2.py::dinov2_forward_stacked``).  B=1 ViT passes are
        ~2.6x less efficient per sample than batched ones (BENCH.md);
        numerics are unchanged.  Composes after ``quantize_vit`` (the stacked
        tree may be int8)."""
        from burn_depth_tpu.vit.dinov2 import stack_vit_params

        if "fov" not in self.params or self.params["fov"].get("encoder") is None:
            raise ValueError("stack_dual_encoders needs the FOV encoder variant")
        if self.config.image_encoder != self.config.fov_encoder:
            raise ValueError("image/fov encoder configs differ — cannot stack")
        params = dict(self.params)
        enc = dict(params["encoder"])
        fov = dict(params["fov"])
        enc["image_fov_stacked"] = stack_vit_params([enc.pop("image_encoder"), fov.pop("encoder")])
        fov["encoder"] = None
        params["encoder"] = enc
        params["fov"] = fov
        return DepthPro(self.config, params)

    # ---- forward ---------------------------------------------------------
    def _forward_internal(self, params: dict, x: jnp.ndarray, debug: bool = False):
        """``forward_internal`` (``mod.rs:210-252``)."""
        cfg = self.config
        enc = params["encoder"]
        fov_tokens = None
        if "image_fov_stacked" in enc:
            features, enc_dbg, fov_tokens = enc_mod.encoder_forward(
                enc, enc["patch_encoder"], None, x, cfg, debug=debug,
                stacked_image_fov=enc["image_fov_stacked"],
            )
        else:
            features, enc_dbg = enc_mod.encoder_forward(
                enc, enc["patch_encoder"], enc["image_encoder"], x, cfg, debug=debug
            )
        feats, lowres, fusion_outputs = decoder_forward(params["decoder"], features)
        canonical = _depth_head_forward(params["head"], feats)

        fov_deg = None
        if "fov" in params:
            fov_deg = fov_forward(
                params["fov"],
                params["fov"].get("encoder"),
                cfg.fov_encoder,
                x,
                lowres,
                cfg.decoder_features,
                attn_impl=cfg.attn_impl,
                precomputed_tokens=fov_tokens,
            )
        if debug:
            return canonical, feats, lowres, fusion_outputs, fov_deg, enc_dbg
        return canonical, feats, lowres, fusion_outputs, fov_deg

    def forward(self, x: jnp.ndarray):
        """``(canonical_inverse_depth [B,1,S,S], fovx_deg [B] | None)``."""
        canonical, _, _, _, fov = self._forward_internal(self.params, x)
        return canonical, fov

    def _debug_encoder_params(self) -> dict:
        enc = self.params["encoder"]
        if "image_fov_stacked" in enc:
            raise ValueError(
                "encoder debug entry points need the unstacked model — call "
                "them before stack_dual_encoders() (the stacked tree has no "
                "standalone image_encoder)"
            )
        return enc

    def encoder_features(self, x: jnp.ndarray):
        cfg = self.config
        enc = self._debug_encoder_params()
        features, _ = enc_mod.encoder_forward(enc, enc["patch_encoder"], enc["image_encoder"], x, cfg)
        return features

    def encoder_forward_debug(self, x: jnp.ndarray):
        cfg = self.config
        enc = self._debug_encoder_params()
        return enc_mod.encoder_forward(enc, enc["patch_encoder"], enc["image_encoder"], x, cfg, debug=True)

    def decoder_from_features(self, features):
        return decoder_forward(self.params["decoder"], features)

    def forward_with_decoder(self, x: jnp.ndarray):
        """Reference ``forward_with_decoder`` (``mod.rs:282-310``):
        ``(canonical_inverse_depth, decoder_features, lowres_features,
        per-level fusion outputs, fovx_deg)``."""
        return self._forward_internal(self.params, x)

    def infer(self, x: jnp.ndarray) -> DepthProInference:
        """``DepthPro::infer`` (``mod.rs:312-364``): resize → forward → focal
        ``0.5·W/tan(0.5·fovx)`` → inverse-depth scale → resize back →
        ``clamp(1e-4, 1e4).recip()``."""
        return self._infer_fn(self.params, x)

    def _infer_fn(self, params: dict, x: jnp.ndarray) -> DepthProInference:
        batch, _, height, width = x.shape
        size = self.img_size
        resize_needed = height != size or width != size
        if resize_needed:
            x = resize_bilinear(x, (size, size), align_corners=False)

        canonical, fov_deg = (lambda c, _f1, _f2, _f3, f: (c, f))(*self._forward_internal(params, x))
        if fov_deg is None:
            raise ValueError("FOV head required for focal length (use_fov_head=False)")

        fovx_rad = fov_deg * (jnp.pi / 180.0)
        focal_px = (width * 0.5) / jnp.tan(fovx_rad * 0.5)  # [B]
        inverse_depth = canonical * (width / focal_px)[:, None, None, None]
        if resize_needed:
            inverse_depth = resize_bilinear(inverse_depth, (height, width), align_corners=False)
        depth = 1.0 / jnp.clip(inverse_depth, 1e-4, 1e4)

        return DepthProInference(
            depth=depth[:, 0],
            focallength_px=focal_px,
            fovx_deg=fov_deg,
            fovy_rad=fovy_from_fovx_rad(fovx_rad, height, width),
        )

    def jit_infer(self):
        """Jitted ``image -> DepthProInference`` closure over the params."""
        from burn_depth_tpu.core.knobs import kjit

        fn = kjit(lambda params, x: self._infer_fn(params, x))
        return partial(fn, self.params)
