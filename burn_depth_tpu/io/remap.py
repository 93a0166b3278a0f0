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
