"""DA3 DPT heads: mono (metric-large) and dual (small: depth+conf+ray+pose).

Reference: ``src/model/depth_anything3/dpt.rs`` (1308 LoC).  Structure:

* 4 per-stage 1x1 projections ``dim_in → out_channels[i]``
* resize layers ``[convT 4x4 s4, convT 2x2 s2, identity, conv 3x3 s2]``
* ``Scratch``: 4 RN convs → 4 refinenet fusion blocks (top-down, bilinear
  ``align_corners=True`` upsampling) → ``output_conv1`` → final upsample →
  ``output_conv2`` stack
* dual head adds: learned LayerNorm on tokens, 4 aux refinenets, per-level
  ``AuxPreHead`` conv stacks and ``AuxOutputHead`` (3x3 → LayerNorm2d → relu
  → 1x1), with the positional embedding added **twice** to the aux head input
  (faithful to ``dpt.rs:428-435``).

All resizes in this file use ``align_corners=True`` — the reference routes
them through Burn's ``Interpolate2d`` Linear op whose semantics the reference
itself proves equal to align_corners=True (``interpolate.rs:193-219``),
matching upstream DPT's ``F.interpolate(..., align_corners=True)``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from burn_depth_tpu.ops.activations import head_activation, relu
from burn_depth_tpu.ops.conv import conv2d, conv_transpose2d
from burn_depth_tpu.ops.interpolate import resize_bilinear
from burn_depth_tpu.ops.norm import layer_norm, layer_norm_2d, token_norm
from burn_depth_tpu.models.da3.posembed import add_pos_embed


@dataclasses.dataclass(frozen=True)
class DepthAnything3HeadConfig:
    """Reference ``DepthAnything3HeadConfig`` (``dpt.rs:15-80``)."""

    dim_in: int
    features: int
    out_channels: tuple[int, int, int, int]
    output_dim: int
    activation: str
    conf_activation: str = "exp_p1"
    down_ratio: int = 1
    pos_embed: bool = True
    dual_head: bool = False
    aux_levels: int = 4
    aux_out1_conv_num: int = 5
    aux_output_dim: int = 7
    aux_use_layer_norm: bool = True
    aux_layer_norm_stages: Optional[tuple[int, ...]] = None

    @staticmethod
    def metric_large() -> "DepthAnything3HeadConfig":
        return DepthAnything3HeadConfig(
            dim_in=1024,
            features=256,
            out_channels=(256, 512, 1024, 1024),
            output_dim=1,
            activation="exp",
            conf_activation="exp",
        )

    @staticmethod
    def small() -> "DepthAnything3HeadConfig":
        return DepthAnything3HeadConfig(
            dim_in=768,
            features=64,
            out_channels=(48, 96, 192, 384),
            output_dim=2,
            activation="exp",
            conf_activation="exp_p1",
            dual_head=True,
            aux_layer_norm_stages=(0,),
        )

    def layer_norm_flags(self) -> list[bool]:
        """``build_layer_norm_flags`` (``dpt.rs:82-95``)."""
        flags = [self.aux_use_layer_norm] * self.aux_levels
        if self.aux_layer_norm_stages:
            flags = [False] * self.aux_levels
            for idx in self.aux_layer_norm_stages:
                if idx < self.aux_levels:
                    flags[idx] = True
        return flags


@dataclasses.dataclass
class DualHeadOutput:
    """Reference ``DualHeadOutput`` (``dpt.rs:142-151``)."""

    depth_logits: jnp.ndarray
    depth: jnp.ndarray
    depth_confidence: jnp.ndarray
    aux_logits: jnp.ndarray
    aux: jnp.ndarray
    aux_confidence: jnp.ndarray
    aux_stage_necks: list
    aux_head_input: jnp.ndarray


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------


def _conv_init(key, out_c, in_c, kh, kw, bias=True, dtype=jnp.float32):
    fan_in = in_c * kh * kw
    bound = (1.0 / fan_in) ** 0.5
    k1, k2 = jax.random.split(key)
    p = {"weight": (jax.random.uniform(k1, (out_c, in_c, kh, kw), minval=-bound, maxval=bound)).astype(dtype)}
    if bias:
        p["bias"] = (jax.random.uniform(k2, (out_c,), minval=-bound, maxval=bound)).astype(dtype)
    return p


def _convT_init(key, in_c, out_c, kh, kw, bias=True, dtype=jnp.float32):
    fan_in = in_c * kh * kw
    bound = (1.0 / fan_in) ** 0.5
    k1, k2 = jax.random.split(key)
    p = {"weight": (jax.random.uniform(k1, (in_c, out_c, kh, kw), minval=-bound, maxval=bound)).astype(dtype)}
    if bias:
        p["bias"] = (jax.random.uniform(k2, (out_c,), minval=-bound, maxval=bound)).astype(dtype)
    return p


def _rcu_init(key, c, dtype):
    k1, k2 = jax.random.split(key)
    return {"conv1": _conv_init(k1, c, c, 3, 3, dtype=dtype), "conv2": _conv_init(k2, c, c, 3, 3, dtype=dtype)}


def _fusion_init(key, c, has_residual, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "residual1": _rcu_init(k1, c, dtype) if has_residual else None,
        "residual2": _rcu_init(k2, c, dtype),
        "out_conv": _conv_init(k3, c, c, 1, 1, dtype=dtype),
    }


def init_head(rng: jax.Array, cfg: DepthAnything3HeadConfig, dtype=jnp.float32) -> dict:
    """Init mono or dual head params (shapes per ``dpt.rs:153-225,515-571``)."""
    keys = iter(jax.random.split(rng, 64))
    oc = cfg.out_channels
    f = cfg.features
    params: dict = {
        "projects": [_conv_init(next(keys), c, cfg.dim_in, 1, 1, dtype=dtype) for c in oc],
        "resize_layers": [
            _convT_init(next(keys), oc[0], oc[0], 4, 4, dtype=dtype),
            _convT_init(next(keys), oc[1], oc[1], 2, 2, dtype=dtype),
            None,
            _conv_init(next(keys), oc[3], oc[3], 3, 3, dtype=dtype),
        ],
    }
    scratch: dict = {
        "layer1_rn": _conv_init(next(keys), f, oc[0], 3, 3, bias=False, dtype=dtype),
        "layer2_rn": _conv_init(next(keys), f, oc[1], 3, 3, bias=False, dtype=dtype),
        "layer3_rn": _conv_init(next(keys), f, oc[2], 3, 3, bias=False, dtype=dtype),
        "layer4_rn": _conv_init(next(keys), f, oc[3], 3, 3, bias=False, dtype=dtype),
        "refinenet1": _fusion_init(next(keys), f, True, dtype),
        "refinenet2": _fusion_init(next(keys), f, True, dtype),
        "refinenet3": _fusion_init(next(keys), f, True, dtype),
        "refinenet4": _fusion_init(next(keys), f, False, dtype),
        "output_conv1": _conv_init(next(keys), f // 2, f, 3, 3, dtype=dtype),
        "output_conv2": {
            "conv1": _conv_init(next(keys), 32, f // 2, 3, 3, dtype=dtype),
            "conv2": _conv_init(next(keys), cfg.output_dim, 32, 1, 1, dtype=dtype),
        },
    }
    if cfg.dual_head:
        params["norm"] = {"weight": jnp.ones((cfg.dim_in,), dtype), "bias": jnp.zeros((cfg.dim_in,), dtype)}
        scratch["refinenet1_aux"] = _fusion_init(next(keys), f, True, dtype)
        scratch["refinenet2_aux"] = _fusion_init(next(keys), f, True, dtype)
        scratch["refinenet3_aux"] = _fusion_init(next(keys), f, True, dtype)
        scratch["refinenet4_aux"] = _fusion_init(next(keys), f, False, dtype)
        pre_heads = []
        for _ in range(cfg.aux_levels):
            layers = []
            in_ch = f
            for idx in range(cfg.aux_out1_conv_num):
                out_ch = f // 2 if idx % 2 == 0 else f
                layers.append(_conv_init(next(keys), out_ch, in_ch, 3, 3, dtype=dtype))
                in_ch = out_ch
            pre_heads.append({"layers": layers})
        scratch["output_conv1_aux"] = pre_heads
        out_heads = []
        for use_ln in cfg.layer_norm_flags():
            head = {
                "reduce": _conv_init(next(keys), 32, f // 2, 3, 3, dtype=dtype),
                "project": _conv_init(next(keys), max(cfg.aux_output_dim, 2), 32, 1, 1, dtype=dtype),
            }
            if use_ln:
                head["norm"] = {"weight": jnp.ones((32,), dtype), "bias": jnp.zeros((32,), dtype)}
            out_heads.append(head)
        scratch["output_conv2_aux"] = out_heads
    params["scratch"] = scratch
    return params


# --------------------------------------------------------------------------
# forward pieces
# --------------------------------------------------------------------------


def _rcu(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """ResidualConvUnit (``dpt.rs:1251-1255``): conv(relu) ·2 + skip."""
    y = conv2d(relu(x), p["conv1"]["weight"], p["conv1"]["bias"], padding=1)
    y = conv2d(relu(y), p["conv2"]["weight"], p["conv2"]["bias"], padding=1)
    return y + x


def _fusion(p: dict, top: jnp.ndarray, lateral: Optional[jnp.ndarray], size: Optional[tuple]) -> jnp.ndarray:
    """FeatureFusionBlock (``dpt.rs:1211-1227``)."""
    y = top
    if p["residual1"] is not None and lateral is not None:
        y = y + _rcu(p["residual1"], lateral)
    y = _rcu(p["residual2"], y)
    target = size if size is not None else (y.shape[-2] * 2, y.shape[-1] * 2)
    y = resize_bilinear(y, target, align_corners=True)
    return conv2d(y, p["out_conv"]["weight"], p["out_conv"]["bias"])


def _resize_layer(p: Optional[dict], stage: int, x: jnp.ndarray) -> jnp.ndarray:
    if stage == 0:
        return conv_transpose2d(x, p["weight"], p["bias"], stride=4)
    if stage == 1:
        return conv_transpose2d(x, p["weight"], p["bias"], stride=2)
    if stage == 2:
        return x
    return conv2d(x, p["weight"], p["bias"], stride=2, padding=1)


def _ensure_channels(x: jnp.ndarray, desired: int) -> jnp.ndarray:
    """Pad/trim the channel dim (``ensure_channels``, ``dpt.rs:738-762``)."""
    c = x.shape[1]
    if c == desired:
        return x
    if c > desired:
        return x[:, :desired]
    pad = desired - c
    return jnp.concatenate([x, jnp.zeros((x.shape[0], pad, *x.shape[2:]), x.dtype)], axis=1)


def _tokens_to_map(tokens: jnp.ndarray, ph: int, pw: int, patch_start: int) -> jnp.ndarray:
    """Slice patch tokens and reshape ``[B,N,C] → [B,C,ph,pw]``."""
    sel = tokens[:, patch_start : patch_start + ph * pw]
    b, _, c = sel.shape
    return sel.transpose(0, 2, 1).reshape(b, c, ph, pw)


def _fuse(scratch: dict, feats: Sequence[jnp.ndarray], aux: bool = False) -> tuple:
    """RN convs + top-down refinenet chain (``dpt.rs:692-717`` mono,
    ``dpt.rs:356-441`` aux).  Returns the fused map (and per-level aux taps)."""
    suffix = "_aux" if aux else ""
    rn = []
    for i, f in enumerate(feats):
        p = scratch[f"layer{i + 1}_rn"]
        rn.append(conv2d(f, p["weight"], None, padding=1))
    l1, l2, l3, l4 = rn
    levels = []
    out = _fusion(scratch["refinenet4" + suffix], l4, None, (l3.shape[-2], l3.shape[-1]))
    levels.append(out)
    out = _fusion(scratch["refinenet3" + suffix], out, l3, (l2.shape[-2], l2.shape[-1]))
    levels.append(out)
    out = _fusion(scratch["refinenet2" + suffix], out, l2, (l1.shape[-2], l1.shape[-1]))
    levels.append(out)
    out = _fusion(scratch["refinenet1" + suffix], out, l1, None)
    levels.append(out)
    return out, levels


# --------------------------------------------------------------------------
# mono head
# --------------------------------------------------------------------------


def mono_head_forward_raw(
    params: dict,
    hooks: Sequence[jnp.ndarray],
    cfg: DepthAnything3HeadConfig,
    height: int,
    width: int,
    patch_start: int,
    patch_size: int,
) -> jnp.ndarray:
    """``DepthAnything3Head::forward_raw`` (``dpt.rs:587-631``): activated
    ``[B, output_dim, H, W]`` logits."""
    ph, pw = height // patch_size, width // patch_size
    feats = []
    for stage in range(4):
        x = _tokens_to_map(token_norm(hooks[stage]), ph, pw, patch_start)
        x = _ensure_channels(x, cfg.dim_in)
        proj = params["projects"][stage]
        x = conv2d(x, proj["weight"], proj["bias"])
        if cfg.pos_embed:
            x = add_pos_embed(x, width, height)
        feats.append(_resize_layer(params["resize_layers"][stage], stage, x))

    fused, _ = _fuse(params["scratch"], feats)
    oc1 = params["scratch"]["output_conv1"]
    fused = conv2d(fused, oc1["weight"], oc1["bias"], padding=1)
    target = ((ph * patch_size) // cfg.down_ratio, (pw * patch_size) // cfg.down_ratio)
    fused = resize_bilinear(fused, target, align_corners=True)
    if cfg.pos_embed:
        fused = add_pos_embed(fused, width, height)
    oc2 = params["scratch"]["output_conv2"]
    logits = conv2d(fused, oc2["conv1"]["weight"], oc2["conv1"]["bias"], padding=1)
    logits = conv2d(relu(logits), oc2["conv2"]["weight"], oc2["conv2"]["bias"])
    return head_activation(logits, cfg.activation)


def select_depth_channel(logits: jnp.ndarray) -> jnp.ndarray:
    """Channel 0 as ``[B, H, W]`` (``dpt.rs:633-647``)."""
    return logits[:, 0]


# --------------------------------------------------------------------------
# dual head
# --------------------------------------------------------------------------


def dual_head_forward(
    params: dict,
    hooks: Sequence[jnp.ndarray],
    cfg: DepthAnything3HeadConfig,
    height: int,
    width: int,
    patch_start: int,
    patch_size: int,
) -> DualHeadOutput:
    """``DualDepthAnything3Head::forward_dual`` (``dpt.rs:227-280``)."""
    ph, pw = height // patch_size, width // patch_size
    feats = []
    for stage in range(4):
        tokens = hooks[stage]
        if patch_start > 0:
            tokens = tokens[:, patch_start:]
        tokens = layer_norm(tokens, params["norm"]["weight"], params["norm"]["bias"])
        x = _tokens_to_map(tokens, ph, pw, 0)
        proj = params["projects"][stage]
        x = conv2d(x, proj["weight"], proj["bias"])
        if cfg.pos_embed:
            x = add_pos_embed(x, width, height)
        feats.append(_resize_layer(params["resize_layers"][stage], stage, x))

    scratch = params["scratch"]

    # main branch
    fused_main, _ = _fuse(scratch, feats)
    oc1 = scratch["output_conv1"]
    fused = conv2d(fused_main, oc1["weight"], oc1["bias"], padding=1)
    target = (max(height // cfg.down_ratio, 1), max(width // cfg.down_ratio, 1))
    fused = resize_bilinear(fused, target, align_corners=True)
    if cfg.pos_embed:
        fused = add_pos_embed(fused, width, height)
    oc2 = scratch["output_conv2"]
    main_logits = conv2d(fused, oc2["conv1"]["weight"], oc2["conv1"]["bias"], padding=1)
    main_logits = conv2d(relu(main_logits), oc2["conv2"]["weight"], oc2["conv2"]["bias"])

    # aux branch (dpt.rs:356-441)
    _, aux_levels = _fuse(scratch, feats, aux=True)
    necks = []
    for idx, level in enumerate(aux_levels[: cfg.aux_levels]):
        neck = level
        for layer in scratch["output_conv1_aux"][idx]["layers"]:
            neck = conv2d(neck, layer["weight"], layer["bias"], padding=1)
        necks.append(neck)
    last = necks[-1]
    if cfg.pos_embed:
        # Faithful quirk: the reference adds the pos embed twice here
        # (dpt.rs:428-435) — once to `last`, once more for the head input.
        last = add_pos_embed(last, width, height)
        head_input = add_pos_embed(last, width, height)
    else:
        head_input = last
    out_head = scratch["output_conv2_aux"][-1]
    a = conv2d(head_input, out_head["reduce"]["weight"], out_head["reduce"]["bias"], padding=1)
    if "norm" in out_head:
        a = layer_norm_2d(a, out_head["norm"]["weight"], out_head["norm"]["bias"])
    aux_logits = conv2d(relu(a), out_head["project"]["weight"], out_head["project"]["bias"])

    # channel selects (dpt.rs:443-493)
    depth = head_activation(main_logits[:, 0], cfg.activation)
    depth_conf = head_activation(main_logits[:, -1], cfg.conf_activation)
    aux = aux_logits[:, : cfg.aux_output_dim - 1]
    aux_conf = head_activation(aux_logits[:, cfg.aux_output_dim - 1], cfg.conf_activation)

    return DualHeadOutput(
        depth_logits=main_logits,
        depth=depth,
        depth_confidence=depth_conf,
        aux_logits=aux_logits,
        aux=aux,
        aux_confidence=aux_conf,
        aux_stage_necks=necks,
        aux_head_input=head_input,
    )
