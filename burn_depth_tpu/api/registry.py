"""Model registry: kind enum, unified wrapper, checkpoint autoload with
config fallback-retry (reference ``src/model/mod.rs:17-160``).

Checkpoint dispatch accepts both formats:

* **native** — our flattened-safetensors checkpoints (keys contain ``/``),
  loaded structurally via ``io.checkpoint``;
* **upstream PyTorch** — apple/ml-depth-pro ``.pt`` or ByteDance DA3
  ``.safetensors`` (dotted keys), routed through ``io.importers``.

DA3 retains the reference's fallback-retry: try metric-large then small
(order swapped when the filename hints "small"), accepting the first config
whose parameter structure matches (``AnyDepthModel::load_depth_anything3``,
``model/mod.rs:60-101``).  The reference's 32 MB ``stacker`` guard for load
recursion has no counterpart — pytree loading is not recursive over modules.
"""

from __future__ import annotations

import enum
import os
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from burn_depth_tpu.api.predict import DepthPrediction
from burn_depth_tpu.api.preprocess import PreparedModelImage, prepare_depth_anything3_image


class DepthModelKind(enum.Enum):
    DEPTH_PRO = "depth-pro"
    DEPTH_ANYTHING3 = "depth-anything-3"

    @property
    def as_str(self) -> str:
        return self.value

    @staticmethod
    def from_str(s: str) -> "DepthModelKind":
        for k in DepthModelKind:
            if k.value == s:
                return k
        raise ValueError(f"unknown model kind {s!r}; expected one of "
                         f"{[k.value for k in DepthModelKind]}")

    def default_checkpoint(self) -> str:
        return {
            DepthModelKind.DEPTH_PRO: "assets/model/depth_pro.safetensors",
            DepthModelKind.DEPTH_ANYTHING3: "assets/model/da3_metric_large.safetensors",
        }[self]


def _is_native_checkpoint(path: str) -> bool:
    """Native checkpoints use '/'-joined pytree paths; upstream PyTorch files
    use dotted keys.  Peek at the safetensors header (cheap).  An Orbax
    directory is always a native checkpoint (upstream ships files)."""
    from burn_depth_tpu.io.orbax_io import is_orbax_path

    if is_orbax_path(path):
        return True
    if not path.endswith(".safetensors"):
        return False  # .pt is always an upstream import
    from safetensors import safe_open

    with safe_open(path, framework="numpy") as f:
        for k in f.keys():
            return "/" in k
    return False


def _is_quantized_checkpoint(path: str) -> bool:
    """Detect a pre-calibrated int8 serving tree (``cli.quantize`` output):
    its flat keys carry the qlinear markers (``weight_i8`` / ``weight_hm_i8``).
    Header-only read for safetensors files."""
    from burn_depth_tpu.io.checkpoint import checkpoint_keys

    return any(k.endswith(("weight_i8", "weight_hm_i8")) for k in checkpoint_keys(path))


def _tree_has_key(tree, key: str) -> bool:
    """True if any nested dict in a param pytree carries ``key`` (e.g.
    ``weight_i8`` marks an int8-quantized tree)."""
    if isinstance(tree, dict):
        return any(k == key or _tree_has_key(v, key) for k, v in tree.items())
    if isinstance(tree, (list, tuple)):
        return any(_tree_has_key(v, key) for v in tree)
    return False


class AnyDepthModel:
    """Reference ``AnyDepthModel`` enum (``model/mod.rs:40-142``) as a wrapper
    that also owns the jitted infer closure."""

    def __init__(self, kind: DepthModelKind, model):
        self._kind = kind
        self.model = model
        self._jit = None

    # ---- loading -----------------------------------------------------------
    @staticmethod
    def load(kind: DepthModelKind, checkpoint: str, config=None) -> "AnyDepthModel":
        """``config``: optional config-dataclass override (e.g. from
        ``core.configio``) for non-preset geometries; None = preset defaults
        with the reference's DA3 fallback-retry."""
        if kind == DepthModelKind.DEPTH_PRO:
            return AnyDepthModel(kind, _load_depth_pro(checkpoint, config))
        return AnyDepthModel(kind, _load_depth_anything3(checkpoint, config))

    # ---- reference accessors ------------------------------------------------
    @property
    def kind(self) -> DepthModelKind:
        return self._kind

    def as_depth_pro(self):
        return self.model if self._kind == DepthModelKind.DEPTH_PRO else None

    def as_depth_anything3(self):
        return self.model if self._kind == DepthModelKind.DEPTH_ANYTHING3 else None

    def preferred_input_resolution(self) -> Optional[int]:
        """DA3 wants its square training resolution; Depth Pro resizes itself
        (``model/mod.rs:128-134``)."""
        if self._kind == DepthModelKind.DEPTH_ANYTHING3:
            return self.model.img_size
        return None

    def quantize_vit(self, calibration_input=None, **kwargs) -> "AnyDepthModel":
        """int8 ViT serving tier (BENCH.md round 2: +8% with static
        calibration on Depth Pro; the default `POST /infer` bench tier on
        DA3).  Returns a NEW wrapper; without ``calibration_input`` the
        dynamic-scale variant is used.  ``kwargs`` pass through to the
        model's ``quantize_vit`` (``exclude_k`` mixed quantization,
        ``calib_method`` outlier-robust calibration).  Pre-calibrated int8
        checkpoints (``cli/quantize``) load straight through
        ``AnyDepthModel.load`` and don't need this — calling it on one is a
        no-op (idempotent), so ``--int8`` composes safely with a quantized
        checkpoint."""
        if _tree_has_key(self.model.params, "weight_i8"):
            return self  # already int8 (pre-calibrated checkpoint)
        return AnyDepthModel(
            self._kind,
            self.model.quantize_vit(calibration_input=calibration_input, **kwargs),
        )

    def prepare_input_image(self, image: np.ndarray, keep_aspect: bool = False) -> PreparedModelImage:
        """``[H,W,3] u8`` → model-ready image (``model/mod.rs:136-142``).

        ``keep_aspect`` (DA3 only, beyond-parity): aspect-preserving prep —
        shortest side to the model resolution, both dims rounded to patch
        multiples, NO center crop (no FOV discarded).  The long side is
        capped at 4x the model resolution (panoramas are scaled down
        uniformly — unbounded width grows attention quadratically).  Each
        distinct shape is one extra XLA compile (jit's shape key)."""
        if self._kind == DepthModelKind.DEPTH_PRO:
            if keep_aspect:
                raise ValueError(
                    "keep_aspect applies to depth-anything-3 only: Depth Pro "
                    "already ingests the full frame (its network squash-resizes "
                    "internally and never crops FOV)"
                )
            return PreparedModelImage(width=image.shape[1], height=image.shape[0], rgb=image)
        if keep_aspect:
            from burn_depth_tpu.api.preprocess import prepare_depth_anything3_image_aspect

            return prepare_depth_anything3_image_aspect(
                image, self.model.img_size, patch=self.model.patch_size,
                max_dim=4 * self.model.img_size,
            )
        return prepare_depth_anything3_image(image, self.model.img_size)

    # ---- unified inference (the DepthModel trait, inference.rs:22-71) -------
    def infer_depth(self, x: jnp.ndarray) -> DepthPrediction:
        if self._jit is None:
            self._jit = self._build_jit()
        return self._jit(x)

    def _build_jit(self):
        if self._kind == DepthModelKind.DEPTH_PRO:
            m = self.model

            def dp_fn(params, x):
                out = m._infer_fn(params, x)
                return out.depth, out.focallength_px, out.fovy_rad

            from burn_depth_tpu.core.knobs import kjit

            fn = kjit(dp_fn)

            def run(x):
                depth, focal, fovy = fn(m.params, x)
                return DepthPrediction(depth=depth, focallength_px=focal, fovy_rad=fovy)

            return run

        m = self.model

        def da3_fn(params, x):
            head_out, camera_pred, _ = m._forward_internal(params, x, None, None)
            inf = m._finalize(head_out, camera_pred)
            return inf.depth, inf.intrinsics, inf.depth_confidence

        from burn_depth_tpu.core.knobs import kjit

        fn = kjit(da3_fn)

        def run(x):
            depth, intr, conf = fn(m.params, x)
            focal = fovy = None
            if intr is not None:
                # Beyond-parity: the reference leaves DA3's DepthPrediction
                # intrinsics empty (inference.rs:43-55); DA3-small's camera
                # decoder predicts K in pixels of the model raster
                # (camera.rs:281-356), so surface fx + the fy-derived vertical
                # FOV — this makes downstream unprojection work checkpoint-free.
                k = intr.reshape(-1, 3, 3)
                focal = k[:, 0, 0]
                # input height, not the config's square size: keep_aspect
                # serves non-square rasters and fy is in raster pixels
                fovy = 2.0 * jnp.arctan((x.shape[-2] / 2.0) / k[:, 1, 1])
            return DepthPrediction(
                depth=depth, focallength_px=focal, fovy_rad=fovy, confidence=conf
            )

        return run


def load_model(kind: Union[DepthModelKind, str], checkpoint: Optional[str] = None) -> AnyDepthModel:
    """High-level entry: kind (+ optional checkpoint path) → ready model.
    With no checkpoint, random-init weights (shape-correct; for smoke/bench)."""
    kind = DepthModelKind.from_str(kind) if isinstance(kind, str) else kind
    if checkpoint is None:
        if kind == DepthModelKind.DEPTH_PRO:
            from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

            return AnyDepthModel(kind, DepthPro.init(jax.random.PRNGKey(0), DepthProConfig.dinov2_l16_384()))
        from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

        return AnyDepthModel(kind, DepthAnything3.init(jax.random.PRNGKey(0), DepthAnything3Config.metric_large()))
    return AnyDepthModel.load(kind, checkpoint)


def _load_depth_pro(checkpoint: str, config=None):
    from burn_depth_tpu.io.checkpoint import load_checkpoint
    from burn_depth_tpu.io.importers import import_depth_pro
    from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

    if _is_native_checkpoint(checkpoint):
        config = config or DepthProConfig.dinov2_l16_384()
        if _is_quantized_checkpoint(checkpoint):
            return DepthPro.load_quantized(checkpoint, config)
        template = DepthPro.init(jax.random.PRNGKey(0), config).params
        return DepthPro(config, load_checkpoint(checkpoint, template))
    model, _ = import_depth_pro(checkpoint, config=config)
    return model


def _load_depth_anything3(checkpoint: str, config=None):
    from burn_depth_tpu.io.checkpoint import load_checkpoint
    from burn_depth_tpu.io.importers import import_da3
    from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

    hint = os.path.basename(checkpoint).lower()
    if config is not None:
        variant = "small" if config.head.dual_head else "metric-large"
        configs = [(variant, config)]
    else:
        configs = [
            ("metric-large", DepthAnything3Config.metric_large()),
            ("small", DepthAnything3Config.small()),
        ]
        if "small" in hint:
            configs.reverse()

    native = _is_native_checkpoint(checkpoint)
    quantized = native and _is_quantized_checkpoint(checkpoint)
    last_err: Optional[Exception] = None
    for variant, config in configs:
        try:
            if quantized:
                return DepthAnything3.load_quantized(checkpoint, config)
            if native:
                template = DepthAnything3.init(jax.random.PRNGKey(0), config).params
                return DepthAnything3(config, load_checkpoint(checkpoint, template))
            model, _ = import_da3(checkpoint, variant=variant, config=config)
            return model
        except (KeyError, ValueError) as err:  # structure mismatch → try next config
            last_err = err
    raise ValueError(
        f"Failed to load Depth Anything 3 checkpoint `{checkpoint}`: {last_err}"
    ) from last_err
