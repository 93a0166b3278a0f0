#!/usr/bin/env python
"""Golden-tensor dump for Depth Pro (counterpart of the reference's
``tool/correctness_depth_pro.py``; same output schema so dumps interchange).

Two PyTorch backends produce the dump:

* ``--backend apple`` (default) — the upstream ``apple/ml-depth-pro`` package
  + its ``depth_pro.pt`` checkpoint (the reference's own golden source,
  ``/root/reference/tool/correctness_depth_pro.py``).  Needs network/weights.
* ``--backend hf`` — ``transformers``' ``DepthProForDepthEstimation``, an
  independent, validated port of the same upstream.  Runs fully offline:
  ``--hf-checkpoint`` loads a HF checkpoint directory (``apple/DepthPro-hf``),
  or ``--thin`` builds a seeded random thin-transformer model at the real
  flagship geometry (image 1536, window 384, grid 24, hooks [5,11], 35-tile
  split, merge pads 3/6).  ``--save-hf-state`` additionally writes the HF
  state dict as safetensors — importable by ``burn_depth_tpu.io.importers``
  (HF layout auto-detected) — and ``--save-config`` writes the matching model
  config JSON for ``cli.correctness --config``.  Together these let the full
  golden-dump → import → verify-gate pipeline execute end-to-end offline on a
  dump this framework did not synthesize.

Keys dumped (both backends; the replay skips absent keys):

    network_input, encoder_feature_{0..4},
    [apple only: encoder_split_x{0,1,2}, encoder_{latent0,latent1}_tokens,
     encoder_{latent0,latent1}_merge_input, encoder_merge_{latent0,latent1},
     encoder_x{0,1,2}_tokens, encoder_merge_x{0,1,2}],
    decoder_feature, decoder_lowres_feature, decoder_fusion_{i},
    head_conv0, head_deconv, head_conv1, head_relu, head_pre_out,
    canonical_inverse_depth, metric_depth, fovx, fovy
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path


def build_thin_hf_model(embed_dim=32, depth=12, heads=2, fusion=32, seed=0):
    """A flagship-geometry HF Depth Pro with a thin transformer and seeded
    random weights (same construction as ``tests/hf_depth_pro_oracle.py`` —
    kept torch-only here so the dump side never imports the framework)."""
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
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in hf.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.08)
    return hf


def condition_o1_signal(hf, calibration=None, target_mean=1.5, target_std=0.15):
    """Condition the thin model so its FINAL outputs are O(1), bounded away
    from zero — the regime the reference's bare ``max_rel`` thresholds
    presume (real checkpoints emit O(1) inverse depth and ~50° FOV; a
    random-init thin model emits O(0.1) zero-crossing signals whose
    near-zero pixels read float cancellation as relative error).
    Intermediates stay random/zero-crossing — this conditions only the
    output scale, not the network path.

    ``calibration`` (a ``[1,3,S,S]`` network-input batch): CALIBRATED mode —
    forward once, measure the raw output conv's distribution, and rescale so
    canonical inverse depth lands at ``target_mean ± target_std`` regardless
    of width/seed.  Required for the width-scaling drift sweep
    (``tools/tier_drift.py --o1-signal``): a fixed weight shrink gives each
    width a DIFFERENT output spread (w32 measured ±0.5%), which rescales the
    measured abs-rel drift arbitrarily; pinning the spread makes the
    cross-width drift trend one fixed, realistic regime.  Without
    ``calibration``: the fixed shrink (inverse depth ≈ 1, fov ≈ 50°)."""
    import torch

    with torch.no_grad():
        head_out = hf.head.layers[4]  # conv_out (1×1, 1 channel)
        fov_convs = [m for m in hf.fov_model.head.modules()
                     if isinstance(m, torch.nn.Conv2d)]
        if calibration is None:
            head_out.weight.mul_(0.05)
            head_out.bias.fill_(1.0)
        else:
            raw = {}
            h = head_out.register_forward_hook(
                lambda _m, _i, out: raw.__setitem__("head", out.detach().float())
            )
            hf(calibration)
            h.remove()
            b0 = float(head_out.bias)
            m, s = float(raw["head"].mean()), float(raw["head"].std())
            alpha = target_std / max(s, 1e-12)
            head_out.weight.mul_(alpha)
            # new_out = alpha*(raw - b0) + b_new: mean -> target_mean
            head_out.bias.fill_(target_mean - alpha * (m - b0))
        fov_convs[-1].weight.mul_(0.05)
        fov_convs[-1].bias.fill_(50.0)
    return hf


def load_network_input(image_path: Path, img_size: int):
    """Apple's transform convention: ``(x/255 − 0.5)/0.5`` then bilinear
    resize (align_corners=False) to the square working resolution
    (``/root/reference/tool/correctness_depth_pro.py:118``)."""
    import torch
    import torch.nn.functional as F
    from PIL import Image

    image = Image.open(image_path).convert("RGB")
    import numpy as np

    arr = torch.from_numpy(np.asarray(image)).permute(2, 0, 1).float() / 255.0
    batch = ((arr - 0.5) / 0.5).unsqueeze(0)
    if batch.shape[-1] != img_size or batch.shape[-2] != img_size:
        batch = F.interpolate(
            batch, size=(img_size, img_size), mode="bilinear", align_corners=False
        )
    return batch


def _fov_tensors(fovx_deg, h: int, w: int):
    """``fovx`` (deg) + apple's derived ``fovy`` (rad):
    ``2·atan((H/W)·tan(fovx/2))``."""
    import torch

    fovx = torch.as_tensor(fovx_deg, dtype=torch.float32).reshape(-1)
    fovy = 2.0 * torch.atan((h / w) * torch.tan(torch.deg2rad(fovx) / 2.0))
    return fovx, fovy


def _metric_depth(canonical, fovx_deg, w: int):
    """Apple's infer math (``mod.rs:312-364``): ``f = 0.5·W/tan(0.5·fovx)``;
    ``depth = 1/clamp(canonical·(W/f), 1e-4, 1e4)`` — at network resolution."""
    import torch

    fovx_rad = torch.deg2rad(torch.as_tensor(fovx_deg, dtype=torch.float32).reshape(-1))
    focal_px = (w * 0.5) / torch.tan(fovx_rad * 0.5)
    inverse = canonical * (w / focal_px).view(-1, 1, 1, 1)
    return (1.0 / inverse.clamp(1e-4, 1e4))[:, 0]


def run_hf(args) -> int:
    import torch
    from safetensors.torch import save_file

    if args.hf_checkpoint is not None:
        from transformers.models.depth_pro.modeling_depth_pro import (
            DepthProForDepthEstimation,
        )

        model = DepthProForDepthEstimation.from_pretrained(str(args.hf_checkpoint)).eval()
    elif args.thin:
        model = build_thin_hf_model(seed=args.seed)
    else:
        print("--backend hf needs --hf-checkpoint DIR or --thin", file=sys.stderr)
        return 2

    img_size = model.config.image_model_config.image_size * 4  # window·4 (encoder.rs:140)
    batch = load_network_input(args.image, img_size)
    if args.thin and args.o1_signal:
        # calibrated on the dump image itself so the conditioned regime is
        # width/seed-independent (mean 1.5 ± 0.15 inverse depth)
        model = condition_o1_signal(model, calibration=batch)
    tensors: dict[str, torch.Tensor] = {"network_input": batch.float().contiguous()}

    taps: dict[str, torch.Tensor] = {}

    def tap(name):
        # .clone(): several HF sublayers use inplace ReLU which would mutate
        # an un-cloned hooked tensor after capture
        def hook(_m, _i, out):
            if isinstance(out, (list, tuple)):
                taps[name] = [t.detach().float().clone() for t in out]
            else:
                taps[name] = out.detach().float().clone()

        return hook

    def tap_pre(name):
        def hook(_m, inputs):
            taps[name] = [t.detach().float().clone() for t in inputs[0]]

        return hook

    handles = []
    neck = model.depth_pro.neck
    # pre-projection feature list == apple's encoder output boundary
    # (low-res-first in HF; apple/ours is high-res-first)
    handles.append(neck.feature_projection.register_forward_pre_hook(tap_pre("pre_projection")))
    handles.append(neck.feature_projection.register_forward_hook(tap("projected")))
    # fusion taps: HF final ≙ apple fusions[0] (highest res); HF
    # intermediate[i] ≙ apple fusions[4-i]
    handles.append(model.fusion_stage.final.register_forward_hook(tap("decoder_fusion_0")))
    for i, layer in enumerate(model.fusion_stage.intermediate):
        handles.append(layer.register_forward_hook(tap(f"decoder_fusion_{4 - i}")))
    # head stage taps (same Sequential shape as apple's head)
    for idx, name in [(0, "head_conv0"), (1, "head_deconv"), (2, "head_conv1"),
                      (3, "head_relu"), (4, "head_pre_out"), (5, "canonical_inverse_depth")]:
        handles.append(model.head.layers[idx].register_forward_hook(tap(name)))

    with torch.no_grad():
        out = model(pixel_values=batch)
    for h in handles:
        h.remove()

    if args.final_only:
        # strict-rel gate mode: only the final outputs (the stages the bare
        # max_rel thresholds apply to) — the replay skips absent keys
        taps = {"canonical_inverse_depth": taps["canonical_inverse_depth"]}
    else:
        # encoder features: reverse the HF low-res-first list to apple order
        for i, f in enumerate(reversed(taps.pop("pre_projection"))):
            tensors[f"encoder_feature_{i}"] = f.contiguous()
        projected = taps.pop("projected")
        tensors["decoder_lowres_feature"] = projected[0].detach().float().contiguous()
        # clone: safetensors rejects tensors sharing storage (decoder_feature IS
        # the final fusion output in apple's schema)
        tensors["decoder_feature"] = taps["decoder_fusion_0"].clone().contiguous()
    tensors.update({k: v.contiguous() for k, v in taps.items()})

    h, w = batch.shape[-2:]
    fovx, fovy = _fov_tensors(out.field_of_view, h, w)
    tensors["fovx"], tensors["fovy"] = fovx, fovy
    tensors["metric_depth"] = _metric_depth(
        tensors["canonical_inverse_depth"], out.field_of_view, w
    ).contiguous()

    args.out.parent.mkdir(parents=True, exist_ok=True)
    save_file({k: v.cpu() for k, v in tensors.items()}, str(args.out))
    print(f"wrote {len(tensors)} tensors to {args.out}")

    if args.save_hf_state is not None:
        sd = {k: v.detach().cpu().contiguous() for k, v in model.state_dict().items()}
        args.save_hf_state.parent.mkdir(parents=True, exist_ok=True)
        save_file(sd, str(args.save_hf_state))
        print(f"wrote HF state dict ({len(sd)} tensors) to {args.save_hf_state}")

    if args.save_config is not None:
        # lazy framework import: only this sidecar needs it
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        from burn_depth_tpu.core.configio import save_config

        if args.thin:
            c = model.config.patch_model_config
            from burn_depth_tpu.models.depth_pro import DepthProConfig
            from burn_depth_tpu.vit.dinov2 import DinoViTConfig

            vit = DinoViTConfig(
                img_size=384, patch_size=16, embed_dim=c.hidden_size,
                depth=c.num_hidden_layers, num_heads=c.num_attention_heads,
            )
            fusion = model.config.fusion_hidden_size
            cfg = DepthProConfig(
                patch_encoder=vit, image_encoder=vit, fov_encoder=vit,
                decoder_features=fusion,
                encoder_feature_dims=(fusion, fusion * 2, fusion * 2, fusion * 2),
                hook_ids=(5, 11), attn_impl="jnp",
            )
        else:
            from burn_depth_tpu.models.depth_pro import DepthProConfig

            cfg = DepthProConfig.dinov2_l16_384()
        save_config(str(args.save_config), cfg)
        print(f"wrote model config to {args.save_config}")
    return 0


def run_apple(args) -> int:
    try:
        import torch
        import torch.nn.functional as F
        from PIL import Image
        from safetensors.torch import save_file

        import depth_pro  # noqa: F401  # upstream apple/ml-depth-pro (availability probe)
    except ImportError as err:
        print(
            f"missing dependency: {err}\n"
            "This tool needs the upstream apple/ml-depth-pro package "
            "(https://github.com/apple/ml-depth-pro) and its checkpoint.",
            file=sys.stderr,
        )
        return 2

    from depth_pro.depth_pro import create_model_and_transforms

    model, transform = create_model_and_transforms(
        device=torch.device("cpu"), precision=torch.float32
    )
    state = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
    model.load_state_dict(state)
    model.eval()

    image = Image.open(args.image).convert("RGB")
    batch = transform(image).unsqueeze(0)
    if batch.shape[-1] != model.img_size or batch.shape[-2] != model.img_size:
        batch = F.interpolate(
            batch, size=(model.img_size, model.img_size), mode="bilinear", align_corners=False
        )

    tensors: dict[str, torch.Tensor] = {"network_input": batch.float().contiguous()}

    # fusion hooks
    fusion_outputs: dict[str, torch.Tensor] = {}
    for idx, fusion in enumerate(model.decoder.fusions):
        def mk(i):
            return lambda _m, _i, out: fusion_outputs.__setitem__(f"decoder_fusion_{i}", out.detach().float())

        fusion.register_forward_hook(mk(idx))

    with torch.no_grad():
        # full infer for final outputs
        pred = model.infer(batch.squeeze(0))
        tensors["metric_depth"] = pred["depth"].float().cpu().unsqueeze(0)
        if "focallength_px" in pred:
            w = batch.shape[-1]
            f_px = float(pred["focallength_px"])
            fovx = 2.0 * math.degrees(math.atan(0.5 * w / f_px))
            tensors["fovx"] = torch.tensor([fovx])
            h = batch.shape[-2]
            tensors["fovy"] = torch.tensor(
                [2.0 * math.atan((h / w) * math.tan(math.radians(fovx) / 2.0))]
            )

        # encoder stage taps
        enc = model.encoder
        feats = enc.forward(batch)
        for i, f in enumerate(feats):
            tensors[f"encoder_feature_{i}"] = f.float().contiguous()

        x0, x1, x2 = enc._create_pyramid(batch)
        x0_p = enc.split(x0, overlap_ratio=0.25)
        x1_p = enc.split(x1, overlap_ratio=0.5)
        tensors["encoder_split_x0"] = x0_p.float().contiguous()
        tensors["encoder_split_x1"] = x1_p.float().contiguous()
        tensors["encoder_split_x2"] = x2.float().contiguous()

        combined = torch.cat((x0_p, x1_p, x2), dim=0)
        encodings = enc.patch_encoder(combined)
        # per-scale token splits (layout mirrors DepthProEncoder.forward)
        n0, n1 = x0_p.shape[0], x1_p.shape[0]
        tensors["encoder_x0_tokens"] = enc.reshape_feature(
            encodings[:n0], enc.out_size, enc.out_size
        ).float()
        tensors["encoder_x1_tokens"] = enc.reshape_feature(
            encodings[n0 : n0 + n1], enc.out_size, enc.out_size
        ).float()
        tensors["encoder_x2_tokens"] = enc.reshape_feature(
            encodings[n0 + n1 :], enc.out_size, enc.out_size
        ).float()

        # decoder taps
        dec_feats, lowres = model.decoder(feats)
        tensors["decoder_feature"] = dec_feats.float().contiguous()
        tensors["decoder_lowres_feature"] = lowres.float().contiguous()
        tensors.update({k: v.contiguous() for k, v in fusion_outputs.items()})

        # head stage taps
        h0 = model.head[0](dec_feats)
        h1 = model.head[1](h0)
        h2 = model.head[2](h1)
        h3 = model.head[3](h2)
        h4 = model.head[4](h3)
        tensors["head_conv0"] = h0.float()
        tensors["head_deconv"] = h1.float()
        tensors["head_conv1"] = h2.float()
        tensors["head_relu"] = h3.float()
        tensors["head_pre_out"] = h4.float()
        tensors["canonical_inverse_depth"] = model.head[5](h4).float()

    args.out.parent.mkdir(parents=True, exist_ok=True)
    save_file({k: v.cpu() for k, v in tensors.items()}, str(args.out))
    print(f"wrote {len(tensors)} tensors to {args.out}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--backend", choices=["apple", "hf"], default="apple")
    parser.add_argument("--image", type=Path, required=True)
    parser.add_argument("--checkpoint", type=Path, default=None, help="depth_pro.pt (apple backend)")
    parser.add_argument("--hf-checkpoint", type=Path, default=None,
                        help="HF checkpoint dir, e.g. apple/DepthPro-hf (hf backend)")
    parser.add_argument("--thin", action="store_true",
                        help="hf backend: seeded random thin model at flagship geometry")
    parser.add_argument("--o1-signal", action="store_true",
                        help="thin model: condition final convs so outputs are O(1) away "
                        "from zero — the regime the reference's bare max_rel gate presumes")
    parser.add_argument("--final-only", action="store_true",
                        help="dump only final outputs (canonical/metric/fov) — the "
                        "strict-rel gate surface")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=Path, default=Path("test.safetensors"))
    parser.add_argument("--save-hf-state", type=Path, default=None,
                        help="hf backend: also write the HF state dict (importable checkpoint)")
    parser.add_argument("--save-config", type=Path, default=None,
                        help="hf backend: also write the model config JSON for cli.correctness")
    args = parser.parse_args(argv)

    if args.backend == "hf":
        return run_hf(args)
    if args.checkpoint is None:
        print("--backend apple needs --checkpoint depth_pro.pt", file=sys.stderr)
        return 2
    return run_apple(args)


if __name__ == "__main__":
    raise SystemExit(main())
