"""Cross-implementation oracle: HuggingFace ``DepthProForDepthEstimation``.

``transformers.models.depth_pro`` is an independent, validated port of
apple/ml-depth-pro (the model the reference replays its golden dumps against,
``/root/reference/tool/correctness_depth_pro.py``).  Since neither the apple
repo nor its checkpoint exists in this environment, HF is the strongest
available numerical oracle: same architecture, same geometry (35-tile split,
seam-trim merge with pads 3/6 at grid 24, DPT fusion, FOV head ending in a
6x6 valid conv), independently implemented and verified against apple's
outputs.

This module maps an HF state dict onto our param tree.  Container names
differ (HF reorganized apple's modules into neck/fusion_stage); the weight-
level correspondence used here:

==============================================  =============================
HF module                                       ours (apple layout)
==============================================  =============================
depth_pro.encoder.patch_encoder.model           encoder.patch_encoder (ViT)
depth_pro.encoder.image_encoder.model           encoder.image_encoder (ViT)
neck.feature_upsample.image_block.layers.0      encoder.upsample_lowres
neck.fuse_image_with_low_res                    encoder.fuse_lowres
neck.feature_upsample.scaled_images.{0,1,2}     encoder.upsample{2,1,0}
neck.feature_upsample.intermediate.0 (hook 11)  encoder.upsample_latent1
neck.feature_upsample.intermediate.1 (hook 5)   encoder.upsample_latent0
neck.feature_projection.projections.{0..4}      decoder.convs (reversed)
fusion_stage.intermediate.{0..3} + final        decoder.fusions (reversed)
head.layers.{0,1,2,4}                           head.{conv0,deconv,conv1,conv_out}
fov_model.conv                                  fov.downsample_blocks.0
fov_model.fov_encoder.model                     fov.encoder (ViT)
fov_model.fov_encoder.neck                      fov.encoder_proj
fov_model.head.layers.{0,2,4}                   fov.head_blocks.{0,1,2}
==============================================  =============================

HF feature order is low-res-first; ours (apple's) is high-res-first — hence
the reversals.  HF separates q/k/v; ours packs them as apple does.
"""

from __future__ import annotations

import numpy as np


def _j(t):
    import jax.numpy as jnp

    return jnp.asarray(t.detach().cpu().numpy())


def _conv(sd, key, bias=True):
    p = {"weight": _j(sd[f"{key}.weight"])}
    p["bias"] = _j(sd[f"{key}.bias"]) if bias else None
    return p


def _vit_from_hf(sd, prefix: str, depth: int) -> dict:
    import jax.numpy as jnp

    p = {
        "cls_token": _j(sd[f"{prefix}.embeddings.cls_token"]),
        "pos_embed": _j(sd[f"{prefix}.embeddings.position_embeddings"]),
        "patch_embed": {"proj": _conv(sd, f"{prefix}.embeddings.patch_embeddings.projection")},
        "norm": {
            "weight": _j(sd[f"{prefix}.layernorm.weight"]),
            "bias": _j(sd[f"{prefix}.layernorm.bias"]),
        },
        "blocks": [],
    }
    for i in range(depth):
        b = f"{prefix}.encoder.layer.{i}"
        qkv_w = jnp.concatenate(
            [
                _j(sd[f"{b}.attention.attention.{name}.weight"])
                for name in ("query", "key", "value")
            ],
            axis=0,
        )
        qkv_b = jnp.concatenate(
            [_j(sd[f"{b}.attention.attention.{name}.bias"]) for name in ("query", "key", "value")],
            axis=0,
        )
        p["blocks"].append(
            {
                "norm1": {"weight": _j(sd[f"{b}.norm1.weight"]), "bias": _j(sd[f"{b}.norm1.bias"])},
                "attn": {
                    "qkv": {"weight": qkv_w, "bias": qkv_b},
                    "proj": _conv(sd, f"{b}.attention.output.dense"),
                },
                "ls1": {"gamma": _j(sd[f"{b}.layer_scale1.lambda1"])},
                "norm2": {"weight": _j(sd[f"{b}.norm2.weight"]), "bias": _j(sd[f"{b}.norm2.bias"])},
                "mlp": {
                    "fc1": _conv(sd, f"{b}.mlp.fc1"),
                    "fc2": _conv(sd, f"{b}.mlp.fc2"),
                },
                "ls2": {"gamma": _j(sd[f"{b}.layer_scale2.lambda1"])},
            }
        )
    return p


def _project_upsample_from_hf(sd, key: str, n_upsample: int) -> dict:
    return {
        "projection": _conv(sd, f"{key}.layers.0", bias=False),
        "upsample": [_conv(sd, f"{key}.layers.{1 + i}", bias=False) for i in range(n_upsample)],
    }


def _fusion_from_hf(sd, key: str, has_deconv: bool) -> dict:
    return {
        "resnet1": {
            "conv1": _conv(sd, f"{key}.residual_layer1.convolution1"),
            "conv2": _conv(sd, f"{key}.residual_layer1.convolution2"),
        },
        "resnet2": {
            "conv1": _conv(sd, f"{key}.residual_layer2.convolution1"),
            "conv2": _conv(sd, f"{key}.residual_layer2.convolution2"),
        },
        "deconv": _conv(sd, f"{key}.deconv", bias=False) if has_deconv else None,
        "out_conv": _conv(sd, f"{key}.projection"),
    }


def hf_to_params(hf_model, vit_depth: int, config=None) -> dict:
    """Convert an HF DepthProForDepthEstimation state dict to our param tree.

    With ``config`` given, routes through the production importer
    (``io.importers.import_depth_pro_hf_state`` — regex remap table + packed
    qkv merge + strict template apply), so the oracle tests pin the real HF
    import path.  Without it, falls back to the hand-rolled structural
    conversion below (kept as independent documentation of the mapping)."""
    if config is not None:
        from burn_depth_tpu.io.importers import import_depth_pro_hf_state

        state = {k: v.detach().cpu().numpy() for k, v in hf_model.state_dict().items()}
        model, report = import_depth_pro_hf_state(state, config)
        # every source tensor must either apply or be explicitly ignorable;
        # qkv triplets merge 3 → 1 so count via the remap table instead
        assert len(report.remap_table) == len(state)
        return model.params
    sd = hf_model.state_dict()

    encoder = {
        "patch_encoder": _vit_from_hf(sd, "depth_pro.encoder.patch_encoder.model", vit_depth),
        "image_encoder": _vit_from_hf(sd, "depth_pro.encoder.image_encoder.model", vit_depth),
        # HF intermediate.{0,1} follow intermediate_hook_ids=[11, 5]; apple's
        # upsample_latent{0,1} follow hook order [5, 11].
        "upsample_latent0": _project_upsample_from_hf(sd, "depth_pro.neck.feature_upsample.intermediate.1", 3),
        "upsample_latent1": _project_upsample_from_hf(sd, "depth_pro.neck.feature_upsample.intermediate.0", 2),
        # HF scaled_images.{0,1,2} are ratios [0.25, 0.5, 1]; apple's
        # upsample{0,1,2} are [1, 0.5, 0.25].
        "upsample0": _project_upsample_from_hf(sd, "depth_pro.neck.feature_upsample.scaled_images.2", 1),
        "upsample1": _project_upsample_from_hf(sd, "depth_pro.neck.feature_upsample.scaled_images.1", 1),
        "upsample2": _project_upsample_from_hf(sd, "depth_pro.neck.feature_upsample.scaled_images.0", 1),
        "upsample_lowres": _conv(sd, "depth_pro.neck.feature_upsample.image_block.layers.0"),
        "fuse_lowres": _conv(sd, "depth_pro.neck.fuse_image_with_low_res"),
    }

    # decoder: HF projections/fusions are low-res-first; ours high-res-first.
    # projections.4 is nn.Identity (hook-5 dim == fusion dim) -> convs[0]=None.
    convs = [None]
    for i in (3, 2, 1, 0):
        convs.append(_conv(sd, f"depth_pro.neck.feature_projection.projections.{i}", bias=False))
    fusions = []
    # ours fusions[0] (highest res, no deconv) == HF final
    fusions.append(_fusion_from_hf(sd, "fusion_stage.final", has_deconv=False))
    for i in (3, 2, 1, 0):
        fusions.append(_fusion_from_hf(sd, f"fusion_stage.intermediate.{i}", has_deconv=True))
    decoder = {"convs": convs, "fusions": fusions}

    head = {
        "conv0": _conv(sd, "head.layers.0"),
        "deconv": _conv(sd, "head.layers.1"),
        "conv1": _conv(sd, "head.layers.2"),
        "conv_out": _conv(sd, "head.layers.4"),
    }

    fov = {
        "encoder": _vit_from_hf(sd, "fov_model.fov_encoder.model", vit_depth),
        "encoder_proj": _conv(sd, "fov_model.fov_encoder.neck"),
        "downsample_blocks": [_conv(sd, "fov_model.conv")],
        "head_blocks": [
            _conv(sd, "fov_model.head.layers.0"),
            _conv(sd, "fov_model.head.layers.2"),
            _conv(sd, "fov_model.head.layers.4"),
        ],
    }

    return {"encoder": encoder, "decoder": decoder, "head": head, "fov": fov}


def build_hf_oracle(embed_dim=32, depth=12, heads=2, fusion=32, seed=0):
    """A flagship-geometry (window 384 / image 1536 / grid 24 / hooks [5,11] /
    pads 3/6) HF Depth Pro with a thin transformer, plus the matching config
    for our model."""
    import torch
    from transformers import DepthProConfig as HFDepthProConfig
    from transformers.models.depth_pro.modeling_depth_pro import DepthProForDepthEstimation

    vit = dict(
        model_type="dinov2",
        hidden_size=embed_dim,
        num_hidden_layers=depth,
        num_attention_heads=heads,
        patch_size=16,
        image_size=384,
        layerscale_value=1.0,
        use_mask_token=False,
        mlp_ratio=4,
        hidden_act="gelu",
        layer_norm_eps=1e-6,
    )
    # dims chosen so the HF<->apple structural equalities hold like they do at
    # full scale: fusion == intermediate dims == our encoder_feature_dims[0].
    dims = (fusion, fusion * 2, fusion * 2, fusion * 2)
    cfg = HFDepthProConfig(
        patch_size=384,
        use_fov_model=True,
        fusion_hidden_size=fusion,
        intermediate_hook_ids=[11, 5],
        intermediate_feature_dims=[dims[0], fusion],
        scaled_images_ratios=[0.25, 0.5, 1],
        scaled_images_overlap_ratios=[0.0, 0.5, 0.25],
        scaled_images_feature_dims=[dims[3], dims[2], dims[1]],
        merge_padding_value=3,
        image_model_config=vit,
        patch_model_config=vit,
        fov_model_config=vit,
        num_fov_head_layers=2,
    )
    torch.manual_seed(seed)
    hf = DepthProForDepthEstimation(cfg).eval()
    # default HF init gives near-zero convs; re-randomize for a non-degenerate
    # signal through every path.
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in hf.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.08)
    return hf, dims


def ours_config(embed_dim=32, depth=12, heads=2, fusion=32):
    from burn_depth_tpu.models.depth_pro import DepthProConfig
    from burn_depth_tpu.vit.dinov2 import DinoViTConfig

    vit = DinoViTConfig(
        img_size=384, patch_size=16, embed_dim=embed_dim, depth=depth, num_heads=heads
    )
    dims = (fusion, fusion * 2, fusion * 2, fusion * 2)
    return DepthProConfig(
        patch_encoder=vit,
        image_encoder=vit,
        fov_encoder=vit,
        decoder_features=fusion,
        encoder_feature_dims=dims,
        hook_ids=(5, 11),
        attn_impl="jnp",
    )
