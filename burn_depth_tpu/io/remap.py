"""Ordered regex key-remapping from PyTorch state-dict keys to pytree paths.

The rule tables are ported from the reference importers — the ground truth
for the upstream checkpoint layouts (``tool/import_depth_pro.rs:344-437`` for
apple/ml-depth-pro, ``tool/import_da3.rs:67-195`` for ByteDance DA3).  Rules
that existed only to bridge Burn conventions (LayerNorm weight→gamma/beta,
ConvTranspose2d (out,in) dim swap, ``resize_layers.N → .conv_t``) are dropped:
this param tree keeps PyTorch field names and tensor layouts, so most keys map
structurally and only the genuinely-renamed module paths need rules.
"""

from __future__ import annotations

import re
from typing import Iterable, Sequence


class KeyRemapper:
    """Apply an ordered list of ``(pattern, replacement)`` regex rules.

    Like the reference's ``KeyRemapper`` (burn-store), every rule is applied
    in sequence to the running key (not first-match-wins), so later rules see
    earlier rewrites.  Replacements use Python backrefs (``\\1``).
    """

    def __init__(self, rules: Sequence[tuple[str, str]] = ()):
        self._rules = [(re.compile(p), r) for p, r in rules]

    def add(self, pattern: str, replacement: str) -> "KeyRemapper":
        self._rules.append((re.compile(pattern), replacement))
        return self

    def remap(self, key: str) -> str:
        for pat, rep in self._rules:
            key = pat.sub(rep, key)
        return key

    def remap_all(self, keys: Iterable[str]) -> dict[str, str]:
        """original key → remapped key."""
        return {k: self.remap(k) for k in keys}


def depth_pro_remap_rules() -> list[tuple[str, str]]:
    """apple/ml-depth-pro ``depth_pro.pt`` keys → our Depth Pro tree.

    Upstream modules that are ``nn.Sequential`` get named fields here
    (reference ``import_depth_pro.rs:362-436``); ViT blocks, decoder lateral
    convs, fusion deconv/out_conv pass through structurally.
    """
    return [
        # encoder ProjectUpsampleBlocks: Sequential(0=1x1 proj, 1..=convT chain)
        (r"^(encoder\.upsample[0-2])\.0\.", r"\1.projection."),
        (r"^(encoder\.upsample[0-2])\.1\.", r"\1.upsample.0."),
        (r"^(encoder\.upsample_latent[0-1])\.0\.", r"\1.projection."),
        (r"^(encoder\.upsample_latent[0-1])\.1\.", r"\1.upsample.0."),
        (r"^(encoder\.upsample_latent[0-1])\.2\.", r"\1.upsample.1."),
        (r"^(encoder\.upsample_latent[0-1])\.3\.", r"\1.upsample.2."),
        # fov tower: encoder = Sequential(ViT, Linear); downsample/head Sequentials
        (r"^fov\.encoder\.1\.", r"fov.encoder_proj."),
        (r"^fov\.encoder\.0\.", r"fov.encoder."),
        (r"^fov\.downsample\.(\d+)\.", r"fov.downsample_blocks.\1."),
        (r"^fov\.head\.0\.", r"fov.head_blocks.0."),
        (r"^fov\.head\.2\.", r"fov.head_blocks.1."),
        (r"^fov\.head\.4\.", r"fov.head_blocks.2."),
        # depth head: Sequential(conv, convT, conv, relu, conv)
        (r"^head\.0\.", r"head.conv0."),
        (r"^head\.1\.", r"head.deconv."),
        (r"^head\.2\.", r"head.conv1."),
        (r"^head\.4\.", r"head.conv_out."),
        # decoder fusion ResidualBlocks: residual = Sequential(relu, conv, relu, conv)
        (r"^(decoder\.fusions\.\d+\.resnet[12])\.residual\.1\.", r"\1.conv1."),
        (r"^(decoder\.fusions\.\d+\.resnet[12])\.residual\.3\.", r"\1.conv2."),
    ]


def hf_depth_pro_remap_rules() -> list[tuple[str, str]]:
    """``transformers`` DepthPro (``apple/DepthPro-hf``) state-dict keys → our
    Depth Pro tree.

    HF reorganized apple's modules (encoder upsamples + decoder projections
    live in ``neck``, fusions in ``fusion_stage``) and stores q/k/v separately;
    the weight-level correspondence is documented in
    ``tests/hf_depth_pro_oracle.py`` and pinned by the full-model oracle tests
    (``tests/test_oracle_depth_pro.py``).  Separate q/k/v land on ``#q/#k/#v``
    marker keys that ``merge_packed_qkv`` concatenates into our packed
    ``attn.qkv`` (apple's layout).  Index reversals: HF feature order is
    low-res-first, apple's (ours) high-res-first.
    """
    return [
        # --- ViT submodule roots (three towers) --------------------------
        (r"^depth_pro\.encoder\.patch_encoder\.model\.", "encoder.patch_encoder."),
        (r"^depth_pro\.encoder\.image_encoder\.model\.", "encoder.image_encoder."),
        (r"^fov_model\.fov_encoder\.model\.", "fov.encoder."),
        # --- ViT internals (shared by all towers) ------------------------
        (r"\.embeddings\.cls_token$", ".cls_token"),
        (r"\.embeddings\.mask_token$", ".mask_token"),  # → IGNORABLE
        (r"\.embeddings\.position_embeddings$", ".pos_embed"),
        (r"\.embeddings\.patch_embeddings\.projection\.", ".patch_embed.proj."),
        (r"\.layernorm\.", ".norm."),
        (r"\.encoder\.layer\.(\d+)\.", r".blocks.\1."),
        (r"\.attention\.attention\.query\.(weight|bias)$", r".attn.qkv.\1#q"),
        (r"\.attention\.attention\.key\.(weight|bias)$", r".attn.qkv.\1#k"),
        (r"\.attention\.attention\.value\.(weight|bias)$", r".attn.qkv.\1#v"),
        (r"\.attention\.output\.dense\.", ".attn.proj."),
        (r"\.layer_scale1\.lambda1$", ".ls1.gamma"),
        (r"\.layer_scale2\.lambda1$", ".ls2.gamma"),
        # --- neck → encoder upsample stacks -------------------------------
        (r"^depth_pro\.neck\.feature_upsample\.image_block\.layers\.0\.", "encoder.upsample_lowres."),
        (r"^depth_pro\.neck\.fuse_image_with_low_res\.", "encoder.fuse_lowres."),
        # scaled_images.{0,1,2} follow ratios [0.25, 0.5, 1]; apple's
        # upsample{0,1,2} follow [1, 0.5, 0.25]
        (r"^depth_pro\.neck\.feature_upsample\.scaled_images\.0\.", "encoder.upsample2."),
        (r"^depth_pro\.neck\.feature_upsample\.scaled_images\.1\.", "encoder.upsample1."),
        (r"^depth_pro\.neck\.feature_upsample\.scaled_images\.2\.", "encoder.upsample0."),
        # intermediate.{0,1} follow hook ids [11, 5]; apple's latent{0,1}
        # follow [5, 11]
        (r"^depth_pro\.neck\.feature_upsample\.intermediate\.0\.", "encoder.upsample_latent1."),
        (r"^depth_pro\.neck\.feature_upsample\.intermediate\.1\.", "encoder.upsample_latent0."),
        (r"^(encoder\.upsample(?:[0-2]|_latent[01]))\.layers\.0\.", r"\1.projection."),
        (r"^(encoder\.upsample(?:[0-2]|_latent[01]))\.layers\.1\.", r"\1.upsample.0."),
        (r"^(encoder\.upsample_latent[01])\.layers\.2\.", r"\1.upsample.1."),
        (r"^(encoder\.upsample_latent[01])\.layers\.3\.", r"\1.upsample.2."),
        # --- neck projections → decoder lateral convs (reversed; HF
        # projections.4 is Identity ≙ our convs.0 = None) -------------------
        (r"^depth_pro\.neck\.feature_projection\.projections\.0\.", "decoder.convs.4."),
        (r"^depth_pro\.neck\.feature_projection\.projections\.1\.", "decoder.convs.3."),
        (r"^depth_pro\.neck\.feature_projection\.projections\.2\.", "decoder.convs.2."),
        (r"^depth_pro\.neck\.feature_projection\.projections\.3\.", "decoder.convs.1."),
        # --- fusion stage → decoder fusions (reversed; final ≙ fusions.0) --
        (r"^fusion_stage\.final\.", "decoder.fusions.0."),
        (r"^fusion_stage\.intermediate\.0\.", "decoder.fusions.4."),
        (r"^fusion_stage\.intermediate\.1\.", "decoder.fusions.3."),
        (r"^fusion_stage\.intermediate\.2\.", "decoder.fusions.2."),
        (r"^fusion_stage\.intermediate\.3\.", "decoder.fusions.1."),
        (r"^(decoder\.fusions\.\d+)\.residual_layer1\.convolution1\.", r"\1.resnet1.conv1."),
        (r"^(decoder\.fusions\.\d+)\.residual_layer1\.convolution2\.", r"\1.resnet1.conv2."),
        (r"^(decoder\.fusions\.\d+)\.residual_layer2\.convolution1\.", r"\1.resnet2.conv1."),
        (r"^(decoder\.fusions\.\d+)\.residual_layer2\.convolution2\.", r"\1.resnet2.conv2."),
        (r"^(decoder\.fusions\.\d+)\.projection\.", r"\1.out_conv."),
        # --- depth head ----------------------------------------------------
        (r"^head\.layers\.0\.", "head.conv0."),
        (r"^head\.layers\.1\.", "head.deconv."),
        (r"^head\.layers\.2\.", "head.conv1."),
        (r"^head\.layers\.4\.", "head.conv_out."),
        # --- fov tower -------------------------------------------------------
        (r"^fov_model\.conv\.", "fov.downsample_blocks.0."),
        (r"^fov_model\.fov_encoder\.neck\.", "fov.encoder_proj."),
        (r"^fov_model\.head\.layers\.0\.", "fov.head_blocks.0."),
        (r"^fov_model\.head\.layers\.2\.", "fov.head_blocks.1."),
        (r"^fov_model\.head\.layers\.4\.", "fov.head_blocks.2."),
    ]


def merge_packed_qkv(flat: dict) -> dict:
    """Concatenate ``#q/#k/#v`` marker keys (separate HF q/k/v projections)
    into the packed ``attn.qkv`` layout along the output dim — the inverse of
    HF's split of apple's packed qkv.  Non-marker keys pass through."""
    import numpy as np

    out: dict = {}
    groups: dict[str, dict] = {}
    for k, v in flat.items():
        if "#" in k:
            base, part = k.rsplit("#", 1)
            groups.setdefault(base, {})[part] = v
        else:
            out[k] = v
    for base, parts in groups.items():
        missing = {"q", "k", "v"} - parts.keys()
        if missing:
            raise KeyError(f"{base}: incomplete qkv triplet, missing {sorted(missing)}")
        out[base] = np.concatenate([parts["q"], parts["k"], parts["v"]], axis=0)
    return out


def da3_remap_rules(head_prefix: str) -> list[tuple[str, str]]:
    """ByteDance DA3 ``.safetensors`` keys → our DA3 tree.

    ``head_prefix``: ``head_mono`` (metric-large) or ``head_dual`` (small).
    Ported from ``import_da3.rs:67-195``; backbone and camera-encoder keys map
    structurally after the prefix renames.
    """
    hp = re.escape(head_prefix)
    return [
        (r"^model\.", ""),
        (r"^head\.", head_prefix + "."),
        # camera decoder: backbone MLP = Sequential(0=fc, 1=relu, 2=fc); fov head Sequential(0=fc, 1=sigmoid)
        (r"^cam_dec\.backbone\.0\.", "camera_decoder.backbone_1."),
        (r"^cam_dec\.backbone\.2\.", "camera_decoder.backbone_2."),
        (r"^cam_dec\.fc_fov\.0\.", "camera_decoder.fc_fov."),
        (r"^cam_dec\.", "camera_decoder."),
        (r"^cam_enc\.", "camera_encoder."),
        # DPT scratch renames
        (rf"^({hp}\.scratch\.refinenet\d+(?:_aux)?)\.resConfUnit1\.", r"\1.residual1."),
        (rf"^({hp}\.scratch\.refinenet\d+(?:_aux)?)\.resConfUnit2\.", r"\1.residual2."),
        (rf"^({hp}\.scratch\.output_conv2)\.0\.", r"\1.conv1."),
        (rf"^({hp}\.scratch\.output_conv2)\.2\.", r"\1.conv2."),
        # aux pre-heads: Sequential of convs (relu interleaved holds no params)
        (rf"^({hp}\.scratch\.output_conv1_aux\.\d+)\.(\d+)\.", r"\1.layers.\2."),
        # aux output heads: Sequential(0=conv, 2=LN, 5=1x1 conv)
        (rf"^({hp}\.scratch\.output_conv2_aux\.\d+)\.0\.", r"\1.reduce."),
        (rf"^({hp}\.scratch\.output_conv2_aux\.\d+)\.2\.", r"\1.norm."),
        (rf"^({hp}\.scratch\.output_conv2_aux\.\d+)\.5\.", r"\1.project."),
    ]
