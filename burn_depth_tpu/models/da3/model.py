"""Depth Anything 3 top-level model (reference ``src/model/depth_anything3/mod.rs``).

TPU-native design notes:

* The whole ``infer`` path — backbone + hooks + DPT head (+ camera decode) —
  is a single pure function of ``(params, image)`` and jit-compiles to one XLA
  program.  The reference's ``CachedDepthAnything3`` / ``PosEmbedCache``
  machinery is unnecessary: positional embeddings are trace-time constants
  (see ``posembed.py``), so cached-vs-uncached equality holds by construction.
* ``infer_from_tokens`` (head-only replay, the reference's parity-bisection
  entry ``mod.rs:389-469``) is kept for the verification harness.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from burn_depth_tpu.models.da3.camera import (
    CameraDecoderConfig,
    CameraEncoderConfig,
    CameraPrediction,
    camera_decoder_forward,
    camera_encoder_forward,
    init_camera_decoder,
    init_camera_encoder,
)
from burn_depth_tpu.models.da3.dpt import (
    DepthAnything3HeadConfig,
    DualHeadOutput,
    dual_head_forward,
    init_head,
    mono_head_forward_raw,
    select_depth_channel,
)
from burn_depth_tpu.vit.dinov2 import DinoViTConfig, dinov2_forward, init_dinov2


@dataclasses.dataclass(frozen=True)
class DepthAnything3Config:
    """Reference ``DepthAnything3Config`` (``mod.rs:124-172``)."""

    image_size: int = 518
    patch_size: int = 14
    hook_block_ids: tuple[int, ...] = (4, 11, 17, 23)
    head: DepthAnything3HeadConfig = dataclasses.field(
        default_factory=DepthAnything3HeadConfig.metric_large
    )
    camera_encoder: Optional[CameraEncoderConfig] = None
    camera_decoder: Optional[CameraDecoderConfig] = None
    attn_impl: str = "auto"
    # DA3-small reconstruction-sweep knobs, passed through to the backbone
    # (``DinoViTConfig.rope_coords`` / ``.cat_order`` — PARITY.md sweep).
    rope_coords: str = "index"
    cat_order: str = "prev_first"

    @staticmethod
    def metric_large() -> "DepthAnything3Config":
        return DepthAnything3Config()

    @staticmethod
    def small() -> "DepthAnything3Config":
        return DepthAnything3Config(
            hook_block_ids=(5, 7, 9, 11),
            head=DepthAnything3HeadConfig.small(),
            camera_encoder=CameraEncoderConfig(dim_out=384, num_heads=6),
            camera_decoder=CameraDecoderConfig(dim_in=768),
        )

    def backbone_config(self) -> DinoViTConfig:
        """ViT-L if ``head.dim_in >= 1024`` else ViT-S, plus dual-head knobs
        (``Backbone::new``, ``mod.rs:180-200``)."""
        if self.head.dim_in >= 1024:
            cfg = DinoViTConfig.vitl(self.image_size, self.patch_size)
        else:
            cfg = DinoViTConfig.vits(self.image_size, self.patch_size)
        if self.head.dual_head:
            cfg = cfg.da3_small_variant()
        return dataclasses.replace(cfg, rope_coords=self.rope_coords, cat_order=self.cat_order)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DepthAnything3Inference:
    """Reference ``DepthAnything3Inference`` (``mod.rs:231-239``).

    Registered as a pytree so it can flow through jit boundaries."""

    depth: jnp.ndarray  # [B, H, W]
    depth_confidence: Optional[jnp.ndarray] = None
    aux: Optional[jnp.ndarray] = None  # [B, 6, H, W] ray directions etc.
    aux_confidence: Optional[jnp.ndarray] = None
    pose_encoding: Optional[jnp.ndarray] = None
    extrinsics: Optional[jnp.ndarray] = None
    intrinsics: Optional[jnp.ndarray] = None


@dataclasses.dataclass
class DepthTrace:
    """Reference ``DepthTrace`` debug taps (``mod.rs:241-246``)."""

    backbone_tokens: list
    aux_stage_necks: Optional[list] = None
    aux_logits: Optional[jnp.ndarray] = None
    aux_head_input: Optional[jnp.ndarray] = None


class DepthAnything3:
    """Thin object wrapper: holds ``(config, params)`` and jit caches.

    All compute methods are pure functions under the hood; the class only
    provides the reference-shaped API (``infer``, ``infer_with_camera``,
    ``infer_with_trace``, ``infer_raw``, ``infer_from_tokens``).
    """

    def __init__(self, config: DepthAnything3Config, params: dict):
        self.config = config
        self.params = params

    # ---- construction ----------------------------------------------------
    @staticmethod
    def init(rng: jax.Array, config: DepthAnything3Config, dtype=jnp.float32) -> "DepthAnything3":
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        params = {
            "backbone": {"pretrained": init_dinov2(k1, config.backbone_config(), dtype)},
        }
        if config.head.dual_head:
            params["head_dual"] = init_head(k2, config.head, dtype)
        else:
            params["head_mono"] = init_head(k2, config.head, dtype)
        if config.camera_encoder is not None:
            params["camera_encoder"] = init_camera_encoder(k3, config.camera_encoder, dtype)
        if config.camera_decoder is not None:
            params["camera_decoder"] = init_camera_decoder(k4, config.camera_decoder, dtype)
        return DepthAnything3(config, params)

    @staticmethod
    def load(checkpoint: str, config: Optional[DepthAnything3Config] = None) -> "DepthAnything3":
        """Load from a native or upstream checkpoint.  With no config, the
        registry's fallback-retry order applies (``model/mod.rs:60-101``)."""
        if config is None:
            from burn_depth_tpu.api.registry import AnyDepthModel, DepthModelKind

            return AnyDepthModel.load(DepthModelKind.DEPTH_ANYTHING3, checkpoint).model
        from burn_depth_tpu.api.registry import _is_native_checkpoint
        from burn_depth_tpu.io.checkpoint import load_checkpoint
        from burn_depth_tpu.io.importers import import_da3

        if _is_native_checkpoint(checkpoint):
            template = DepthAnything3.init(jax.random.PRNGKey(0), config).params
            return DepthAnything3(config, load_checkpoint(checkpoint, template))
        variant = "small" if config.head.dual_head else "metric-large"
        model, _ = import_da3(checkpoint, variant=variant, config=config)
        return model

    @staticmethod
    def load_quantized(checkpoint: str, config: Optional[DepthAnything3Config] = None,
                       dtype=jnp.bfloat16) -> "DepthAnything3":
        """Load a pre-calibrated int8 serving checkpoint (a
        ``quantize_vit(calibration_input)`` tree saved with
        ``io.checkpoint.save_checkpoint`` / ``cli.quantize``) — no load-time
        calibration forward; scales come from the file."""
        from burn_depth_tpu.io.checkpoint import load_checkpoint

        config = config or DepthAnything3Config.metric_large()
        template = DepthAnything3.init(jax.random.PRNGKey(0), config, dtype=dtype).quantize_vit(
            unit_scales=True
        )
        return DepthAnything3(config, load_checkpoint(checkpoint, template.params))

    @property
    def img_size(self) -> int:
        return self.config.image_size

    @property
    def patch_size(self) -> int:
        return self.config.patch_size

    # ---- forward ---------------------------------------------------------
    def _forward_internal(
        self,
        params: dict,
        x: jnp.ndarray,
        extrinsics: Optional[jnp.ndarray],
        intrinsics: Optional[jnp.ndarray],
        views: int = 1,
        sp=None,
    ):
        """``forward_with_camera_internal`` (``mod.rs:495-564``).

        ``views`` S > 1 (multi-view extension, beyond the reference's S=1
        surface): ``x`` is ``[B0·S, 3, H, W]``; the backbone's alternating
        blocks attend cross-view, the head and camera decode stay per-view.
        ``sp`` (``parallel.sp.ViewSP``): run the cross-view blocks
        sequence-parallel over the mesh (views sharded, K/V gathered).
        """
        cfg = self.config
        _, _, height, width = x.shape
        if height % cfg.patch_size or width % cfg.patch_size:
            raise ValueError(
                f"input {height}x{width} must be divisible by patch size {cfg.patch_size}"
            )

        camera_token = None
        if params.get("camera_encoder") is not None and extrinsics is not None and intrinsics is not None:
            camera_token = camera_encoder_forward(
                params["camera_encoder"], cfg.camera_encoder, extrinsics, intrinsics, height, width
            )

        vit_cfg = cfg.backbone_config()
        out = dinov2_forward(
            params["backbone"]["pretrained"],
            x,
            vit_cfg,
            hook_ids=cfg.hook_block_ids,
            camera_token=camera_token,
            attn_impl=cfg.attn_impl,
            views=views,
            sp=sp,
        )
        hooks = out.hooks

        patch_start = 0  # hooks carry patch tokens only (mod.rs:538)
        if cfg.head.dual_head:
            head_out = dual_head_forward(
                params["head_dual"],
                [h.patches for h in hooks],
                cfg.head,
                height,
                width,
                patch_start,
                cfg.patch_size,
            )
        else:
            head_out = mono_head_forward_raw(
                params["head_mono"],
                [h.patches for h in hooks],
                cfg.head,
                height,
                width,
                patch_start,
                cfg.patch_size,
            )

        camera_pred = None
        if params.get("camera_decoder") is not None and hooks and hooks[-1].camera is not None:
            feats = hooks[-1].camera[:, None, :]  # [B, 1, dim]
            camera_pred = camera_decoder_forward(params["camera_decoder"], feats, height, width)
        return head_out, camera_pred, hooks

    def _finalize(self, head_out, camera_pred: Optional[CameraPrediction]) -> DepthAnything3Inference:
        """``finalize_inference`` (``mod.rs:587-624``)."""
        pose = extr = intr = None
        if camera_pred is not None:
            pose, extr, intr = camera_pred.pose_encoding, camera_pred.extrinsics, camera_pred.intrinsics
        if isinstance(head_out, DualHeadOutput):
            return DepthAnything3Inference(
                depth=head_out.depth,
                depth_confidence=head_out.depth_confidence,
                aux=head_out.aux,
                aux_confidence=head_out.aux_confidence,
                pose_encoding=pose,
                extrinsics=extr,
                intrinsics=intr,
            )
        return DepthAnything3Inference(
            depth=select_depth_channel(head_out),
            pose_encoding=pose,
            extrinsics=extr,
            intrinsics=intr,
        )

    # ---- public API (reference mod.rs:288-469) ---------------------------
    def infer(self, x: jnp.ndarray) -> DepthAnything3Inference:
        head_out, camera_pred, _ = self._forward_internal(self.params, x, None, None)
        return self._finalize(head_out, camera_pred)

    def infer_with_cache(self, x: jnp.ndarray, _cache=None) -> DepthAnything3Inference:
        """API-parity shim for reference ``infer_with_cache`` (``mod.rs:300``).

        The reference threads a host-built ``PosEmbedCache`` through the head
        to avoid re-building sin-cos embeds per call; here those embeds are
        trace-time constants baked into the compiled program, so cached and
        uncached calls are the same program — equality holds by construction
        (the property the reference asserts in ``mod.rs:652-668``)."""
        return self.infer(x)

    def infer_multiview(self, x: jnp.ndarray) -> DepthAnything3Inference:
        """Multi-view inference (extension beyond the reference; upstream DA3
        supports S>1 with within-view/cross-view alternating attention —
        SURVEY §2 #10 notes the reference only exercises S=1).

        ``x: [B, S, 3, H, W]`` -> outputs with leading ``[B, S]``: depth /
        confidence ``[B, S, H, W]``, per-view pose/extrinsics/intrinsics.
        Requires a backbone variant with ``alt_block_start`` set (DA3-small);
        for S=1 this is exactly ``infer``."""
        b, s_views = x.shape[0], x.shape[1]
        flat = x.reshape(b * s_views, *x.shape[2:])
        head_out, camera_pred, _ = self._forward_internal(
            self.params, flat, None, None, views=s_views
        )
        inf = self._finalize(head_out, camera_pred)

        def unflatten(a):
            return None if a is None else a.reshape(b, s_views, *a.shape[1:])

        return DepthAnything3Inference(
            depth=unflatten(inf.depth),
            depth_confidence=unflatten(inf.depth_confidence),
            aux=unflatten(inf.aux),
            aux_confidence=unflatten(inf.aux_confidence),
            pose_encoding=unflatten(inf.pose_encoding),
            extrinsics=unflatten(inf.extrinsics),
            intrinsics=unflatten(inf.intrinsics),
        )

    def infer_with_camera(
        self, x: jnp.ndarray, extrinsics: jnp.ndarray, intrinsics: jnp.ndarray
    ) -> DepthAnything3Inference:
        head_out, camera_pred, _ = self._forward_internal(self.params, x, extrinsics, intrinsics)
        return self._finalize(head_out, camera_pred)

    def infer_with_trace(self, x: jnp.ndarray) -> tuple[DepthAnything3Inference, DepthTrace]:
        head_out, camera_pred, hooks = self._forward_internal(self.params, x, None, None)
        trace = DepthTrace(backbone_tokens=[h.patches for h in hooks])
        if isinstance(head_out, DualHeadOutput):
            trace.aux_stage_necks = head_out.aux_stage_necks
            trace.aux_logits = head_out.aux_logits
            trace.aux_head_input = head_out.aux_head_input
        return self._finalize(head_out, camera_pred), trace

    def infer_raw(self, x: jnp.ndarray) -> jnp.ndarray:
        head_out, _, _ = self._forward_internal(self.params, x, None, None)
        if isinstance(head_out, DualHeadOutput):
            return head_out.depth_logits
        return head_out

    def infer_from_tokens(
        self, patches: Sequence[jnp.ndarray], height: int, width: int
    ) -> DepthAnything3Inference:
        """Head-only replay from externally-supplied backbone tokens
        (``mod.rs:389-469``): tokens with an extra leading token use
        ``patch_start=1``."""
        cfg = self.config
        expected = max(height // cfg.patch_size, 1) * max(width // cfg.patch_size, 1)
        patch_start = 0 if patches[0].shape[1] == expected else 1
        if cfg.head.dual_head:
            head_out = dual_head_forward(
                self.params["head_dual"], list(patches), cfg.head, height, width, patch_start, cfg.patch_size
            )
        else:
            head_out = mono_head_forward_raw(
                self.params["head_mono"], list(patches), cfg.head, height, width, patch_start, cfg.patch_size
            )
        return self._finalize(head_out, None)

    def quantize_vit(
        self,
        calibration_input: Optional[jnp.ndarray] = None,
        *,
        unit_scales: bool = False,
        exclude_k: int = 0,
        exclude: Optional[set] = None,
        exclude_patch_fc2: int = 0,
        calib_method: str = "absmax",
    ) -> "DepthAnything3":
        """Opt-in int8 serving tier (``Policy.SERVING_INT8``), same scheme as
        ``DepthPro.quantize_vit``: per-channel int8 weights + quantized
        activations on every backbone-block linear; the DPT head(s), camera
        modules and norms stay in the float policy (``ops/quant.py``).

        ``calibration_input``: optional ``[B, 3, S, S]`` batch — one jitted
        forward records per-tensor clip values for static scales
        (``calib_method``: absmax / p999 / mse).  ``exclude_k`` / ``exclude``:
        mixed quantization — the k most int8-sensitive backbone linears
        (activation-aware with calibration data, weight-only proxy without)
        or an explicit index set stay float.  ``unit_scales`` builds the
        static-scale structure with placeholder 1.0 scales (the
        ``load_quantized`` template)."""
        import itertools

        from burn_depth_tpu.ops.quant import (
            calibrate_amax,
            calibrate_sensitivity,
            quantize_vit_blocks,
            weight_sensitivity_blocks,
        )

        if exclude_patch_fc2:
            # the pfc scheduling rung is a Depth Pro 35-tile-ViT measurement;
            # DA3's single-pass backbone showed int8 speed-NEUTRAL outright
            raise ValueError("exclude_patch_fc2 is a DepthPro serving knob")
        if exclude is None:
            exclude = set()
            if exclude_k > 0:
                if calibration_input is not None:
                    scores = calibrate_sensitivity(
                        lambda p, x: self._finalize(
                            *self._forward_internal(p, x, None, None)[:2]
                        ).depth,
                        self.params,
                        calibration_input,
                    )
                else:
                    scores = weight_sensitivity_blocks(self.params["backbone"]["pretrained"])
                order = sorted(range(len(scores)), key=lambda i: -scores[i])
                exclude = set(order[:exclude_k])

        scales = None
        if unit_scales:
            scales = itertools.repeat(1.0)
        elif calibration_input is not None:
            scales = iter(
                calibrate_amax(
                    lambda p, x: self._finalize(*self._forward_internal(p, x, None, None)[:2]).depth,
                    self.params,
                    calibration_input,
                    method=calib_method,
                )
            )
        params = dict(self.params)
        backbone = dict(params["backbone"])
        backbone["pretrained"] = quantize_vit_blocks(
            backbone["pretrained"], scales, frozenset(exclude)
        )
        params["backbone"] = backbone
        return DepthAnything3(self.config, params)

    # ---- jit-compiled entry ---------------------------------------------
    def jit_infer(self):
        """A jitted ``image -> depth [B,H,W]`` closure over the params."""

        from burn_depth_tpu.core.knobs import kjit

        @kjit
        def fn(params, x):
            head_out, camera_pred, _ = self._forward_internal(params, x, None, None)
            return self._finalize(head_out, camera_pred).depth

        return lambda x: fn(self.params, x)


class CachedDepthAnything3:
    """API-parity wrapper for the reference's ``CachedDepthAnything3``
    (``mod.rs:41-120``) — a RefCell pos-embed cache around the model.

    In this framework the jit compilation cache plays that role: the first
    call per input shape compiles (embeds become constants), subsequent calls
    reuse the executable.  The wrapper simply memoizes jitted closures per
    shape so the reference's usage pattern (share one cached model across a
    realtime loop) maps one-to-one.
    """

    def __init__(self, model: DepthAnything3):
        self.model = model
        self._jits: dict = {}

    @property
    def config(self) -> DepthAnything3Config:
        return self.model.config

    @property
    def img_size(self) -> int:
        return self.model.img_size

    def infer(self, x: jnp.ndarray) -> DepthAnything3Inference:
        key = (tuple(x.shape), str(x.dtype))
        if key not in self._jits:
            m = self.model

            def f(params, xin):
                head_out, camera_pred, _ = m._forward_internal(params, xin, None, None)
                inf = m._finalize(head_out, camera_pred)
                return inf

            from burn_depth_tpu.core.knobs import kjit

            self._jits[key] = kjit(f)
        return self._jits[key](self.model.params, x)

    def cache_len(self) -> int:
        """Number of compiled shape entries (the reference's cache-entry-count
        reuse assertion, ``mod.rs:670-686``)."""
        return len(self._jits)
