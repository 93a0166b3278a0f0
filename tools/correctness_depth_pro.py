#!/usr/bin/env python
"""Golden-tensor dump for Depth Pro (counterpart of the reference's
``tool/correctness_depth_pro.py``; same output schema so dumps interchange).

Runs the upstream ``apple/ml-depth-pro`` PyTorch package on an image and
dumps per-stage tensors to safetensors for ``burn_depth_tpu.verify`` /
``python -m burn_depth_tpu.cli.correctness`` to replay.

Requires: ``pip install depth_pro`` (or the apple repo on PYTHONPATH) and the
``depth_pro.pt`` checkpoint.  Keys dumped:

    network_input, encoder_feature_{0..4},
    encoder_split_x{0,1,2}, encoder_{latent0,latent1}_tokens,
    encoder_{latent0,latent1}_merge_input, encoder_merge_{latent0,latent1},
    encoder_x{0,1,2}_tokens, encoder_merge_x{0,1,2},
    decoder_feature, decoder_lowres_feature, decoder_fusion_{i},
    head_conv0, head_deconv, head_conv1, head_relu, head_pre_out,
    canonical_inverse_depth, metric_depth, fovx, fovy
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", type=Path, required=True)
    parser.add_argument("--checkpoint", type=Path, required=True, help="depth_pro.pt")
    parser.add_argument("--out", type=Path, default=Path("test.safetensors"))
    args = parser.parse_args()

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
            import math

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


if __name__ == "__main__":
    raise SystemExit(main())
