"""PyTorch checkpoint importers (reference ``tool/import_depth_pro.rs``,
``tool/import_da3.rs``).

Flow (mirrors the reference's, ``import_depth_pro.rs:24-64``):
template tree from ``Model.init`` → read ``.pt``/``.safetensors`` state dict
→ regex remap → structural apply with a strict report (missing keys must be
allowlisted, unexpected keys must be declared ignorable) → optionally save a
native checkpoint with f16/bf16 storage.

No tensor layout fixes are needed: the param tree stores PyTorch layouts
(Linear ``[out,in]``, ConvTranspose2d ``[in,out,kh,kw]``), so the reference's
``maybe_fix_conv_transpose2d`` dim swap (``depth_pro/mod.rs:416-431``) and
``PyTorchToBurnAdapter`` transposes have no counterpart here.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any

import jax
import numpy as np

from burn_depth_tpu.io.checkpoint import _path_str, load_safetensors, unflatten_into
from burn_depth_tpu.io.remap import (
    KeyRemapper,
    da3_remap_rules,
    depth_pro_remap_rules,
    hf_depth_pro_remap_rules,
    merge_packed_qkv,
)

# Keys the upstream checkpoints carry that this framework has no parameter
# for.  mask_token: reference allowlists the same three (import_depth_pro.rs:439-445);
# DINOv2 mask tokens are a pretraining artifact unused at inference.
IGNORABLE_PATTERNS = (
    r"(^|\.|/)mask_token$",
    r"(^|\.|/)register_tokens$",  # only if the config disables registers
)


@dataclasses.dataclass
class ImportReport:
    """The reference's ``report_apply_result`` (``import_depth_pro.rs:447-518``)."""

    applied: int
    ignored: list[str]
    remap_table: dict[str, str]  # original → remapped (for --dump-template style debugging)

    def __str__(self) -> str:
        return f"applied {self.applied} tensors, ignored {len(self.ignored)}: {self.ignored[:8]}"


def load_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a PyTorch ``.pt``/``.pth`` (pickle) or ``.safetensors`` file into
    ``{key: np.ndarray}``."""
    if path.endswith(".safetensors"):
        return load_safetensors(path)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            t = v.detach()
            # numpy has no bf16: go through f32 (exact upcast)
            if t.dtype == torch.bfloat16:
                t = t.float()
            out[k] = t.numpy()
    return out


def _apply(
    template: Any, state: dict[str, np.ndarray], rules, fixup=None
) -> tuple[Any, ImportReport]:
    remapper = KeyRemapper(rules)
    remap_table = remapper.remap_all(state.keys())
    template_paths = {
        _path_str(p) for p, _ in jax.tree_util.tree_flatten_with_path(template)[0]
    }

    dotted = {new: state[orig] for orig, new in remap_table.items()}
    if fixup is not None:
        # structural transform regex renames can't express (e.g. HF's
        # separate q/k/v → apple's packed qkv concat)
        dotted = fixup(dotted)

    flat: dict[str, np.ndarray] = {}
    ignored: list[str] = []
    for new, tensor in dotted.items():
        slash = new.replace(".", "/")
        # A key is droppable only when it is BOTH declared ignorable AND the
        # template has no such parameter.  If the template does have it (e.g.
        # a config with register tokens enabled), the tensor must apply —
        # silently ignoring it would mask a config mismatch.
        if slash not in template_paths and any(re.search(p, slash) for p in IGNORABLE_PATTERNS):
            ignored.append(new)
            continue
        flat[slash] = tensor

    params = unflatten_into(template, flat)
    return params, ImportReport(applied=len(flat), ignored=ignored, remap_table=remap_table)


def is_hf_depth_pro_state(state: dict) -> bool:
    """``transformers`` DepthPro layout (``apple/DepthPro-hf``): the towers
    live under a ``depth_pro.`` root; apple's own checkpoint has none."""
    return any(k.startswith("depth_pro.") for k in state)


def import_depth_pro(path: str, config=None) -> tuple[Any, ImportReport]:
    """Depth Pro checkpoint → ``DepthPro``.  Accepts both upstream layouts:
    apple/ml-depth-pro ``depth_pro.pt`` and the HuggingFace port's state dict
    (``apple/DepthPro-hf`` safetensors), auto-detected by key root."""
    state = load_state_dict(path)
    if is_hf_depth_pro_state(state):
        return import_depth_pro_hf_state(state, config)
    from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

    config = config or DepthProConfig.dinov2_l16_384()
    template = DepthPro.init(jax.random.PRNGKey(0), config).params
    params, report = _apply(template, state, depth_pro_remap_rules())
    return DepthPro(config, params), report


def import_depth_pro_hf_state(state: dict[str, np.ndarray], config=None) -> tuple[Any, ImportReport]:
    """``transformers.DepthProForDepthEstimation`` state dict → ``DepthPro``
    through the same strict remap/apply machinery as the apple importer
    (rules: ``io/remap.py hf_depth_pro_remap_rules``; q/k/v are re-packed)."""
    from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

    config = config or DepthProConfig.dinov2_l16_384()
    template = DepthPro.init(jax.random.PRNGKey(0), config).params
    params, report = _apply(template, state, hf_depth_pro_remap_rules(), fixup=merge_packed_qkv)
    return DepthPro(config, params), report


def import_da3(path: str, variant: str = "metric-large", config=None) -> tuple[Any, ImportReport]:
    """DA3 ``.safetensors`` → ``DepthAnything3``.  ``variant``:
    ``metric-large`` | ``small`` (reference ``import_da3.rs:17-38`` clap)."""
    from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

    if config is None:
        config = (
            DepthAnything3Config.small() if variant == "small" else DepthAnything3Config.metric_large()
        )
    head_prefix = "head_dual" if config.head.dual_head else "head_mono"
    template = DepthAnything3.init(jax.random.PRNGKey(0), config).params
    state = load_state_dict(path)
    params, report = _apply(template, state, da3_remap_rules(head_prefix))
    return DepthAnything3(config, params), report


# --------------------------------------------------------------------------
# template export (reference EXPORT_TEMPLATE / --dump-template modes)
# --------------------------------------------------------------------------


def export_template_keys(params: Any) -> list[str]:
    """All flattened param paths with shapes — the ``--dump-template`` debug
    mode (``import_da3.rs:60-66``)."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    return [f"{_path_str(p)} {tuple(np.shape(v))}" for p, v in leaves]


def export_pytorch_style_state(params: Any, inverse_rules) -> dict[str, np.ndarray]:
    """Flatten a param tree back to PyTorch-style dotted keys via an inverse
    remap — used by the round-trip tests to synthesize upstream-shaped
    checkpoints without the real (multi-GB) weights."""
    remapper = KeyRemapper(inverse_rules)
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    return {remapper.remap(_path_str(p).replace("/", ".")): np.asarray(v) for p, v in leaves}
