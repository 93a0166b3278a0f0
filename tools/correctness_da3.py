#!/usr/bin/env python
"""Golden-tensor dump for Depth Anything 3 (counterpart of the reference's
``tool/correctness_da3.py``; same output schema so dumps interchange).

Two PyTorch backends produce the dump:

* ``--backend upstream`` (default) — the upstream ByteDance DA3 repo + its
  checkpoint (the reference's own golden source; needs network/weights).
* ``--backend oracle`` — ``tools/torch_da3_oracle.py``, an independent
  torch-only DA3 (DINOv2 backbone + mono DPT head) written from the reference
  spec with upstream ByteDance parameter naming.  Runs fully offline with
  seeded random weights at real ViT-S geometry (518², patch 14, embed 384,
  12 blocks, thin head).  ``--save-state`` additionally writes its state dict
  as safetensors — importable by ``burn_depth_tpu.io.importers.import_da3``
  (upstream key layout) — and ``--save-config`` writes the matching model
  config JSON for ``cli.correctness --config``.  Together these let the DA3
  golden-dump → import → verify-gate pipeline (incl. the head-only-from-
  tokens bisection, ``example/da3_small_correctness.rs:279-326``) execute
  end-to-end on a dump this framework did not synthesize.

Keys dumped:

    depth, metric_input, [depth_confidence, ray, ray_confidence],
    [pose_encoding, extrinsics, intrinsics],
    backbone_tokens.stage{i}, [aux_stage_necks.stage{i}, aux_logits,
    aux_head_input]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

# Preprocessing convention shared with the reference tool: half-pixel bicubic
# with the torch kernel (a=-0.75), clamped borders, u8 rounding.  We reuse the
# framework's vectorized implementation (tested bit-exact against the scalar
# loop in tests/test_registry.py).
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _oracle_input(args):
    import numpy as np
    import torch
    from PIL import Image

    from burn_depth_tpu.api.preprocess import TORCH_BICUBIC, resize_bicubic

    image = np.asarray(Image.open(args.image).convert("RGB"))
    resized = resize_bicubic(image, args.size, args.size, a=TORCH_BICUBIC)
    arr = torch.from_numpy(resized).permute(2, 0, 1).float() / 255.0
    mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)
    return ((arr - mean) / std)[None]  # [1, 3, H, W]


def _save_oracle_artifacts(args, oracle, tensors, cfg) -> None:
    from safetensors.torch import save_file

    args.out.parent.mkdir(parents=True, exist_ok=True)
    save_file({k: v.cpu() for k, v in tensors.items()}, str(args.out))
    print(f"wrote {len(tensors)} tensors to {args.out}")

    if args.save_state is not None:
        sd = {k: v.detach().cpu().contiguous() for k, v in oracle.state_dict().items()}
        args.save_state.parent.mkdir(parents=True, exist_ok=True)
        save_file(sd, str(args.save_state))
        print(f"wrote oracle state dict ({len(sd)} tensors) to {args.save_state}")

    if args.save_config is not None:
        from burn_depth_tpu.core.configio import save_config

        save_config(str(args.save_config), cfg)
        print(f"wrote model config to {args.save_config}")


def run_oracle(args) -> int:
    import torch

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from burn_depth_tpu.models.da3.dpt import DepthAnything3HeadConfig
    from burn_depth_tpu.models.da3.model import DepthAnything3Config

    tensor = _oracle_input(args)

    if args.variant == "small":
        from torch_da3_oracle import TorchDA3SmallOracle

        oracle = (
            TorchDA3SmallOracle(
                img_size=args.size, rope_coords=args.rope_coords, cat_order=args.cat_order
            )
            .randomize(seed=args.seed)
            .eval()
        )
        with torch.inference_mode():
            out = oracle(tensor)

        tensors = {"metric_input": tensor.contiguous()}
        for key in ("depth", "depth_confidence", "ray", "ray_confidence",
                    "pose_encoding", "extrinsics", "intrinsics",
                    "aux_logits", "aux_head_input"):
            # clone: channel selects are views into aux_logits (B=1 slices
            # count as contiguous), and safetensors rejects shared storage
            tensors[key] = out[key].clone().contiguous()
        for i, tok in enumerate(out["backbone_tokens"]):
            tensors[f"backbone_tokens.stage{i}"] = tok.contiguous()
        for i, neck in enumerate(out["aux_stage_necks"]):
            tensors[f"aux_stage_necks.stage{i}"] = neck.contiguous()

        from burn_depth_tpu.models.da3.camera import CameraDecoderConfig, CameraEncoderConfig

        cfg = DepthAnything3Config(
            image_size=args.size,
            patch_size=oracle.patch,
            hook_block_ids=oracle.hook_ids,
            head=DepthAnything3HeadConfig(
                dim_in=768, features=oracle.features, out_channels=oracle.out_channels,
                output_dim=2, activation="exp", conf_activation="exp_p1",
                dual_head=True, aux_layer_norm_stages=(0,),
            ),
            camera_encoder=CameraEncoderConfig(dim_out=384, num_heads=6),
            camera_decoder=CameraDecoderConfig(dim_in=768),
            attn_impl="jnp",
            rope_coords=args.rope_coords,
            cat_order=args.cat_order,
        )
        _save_oracle_artifacts(args, oracle, tensors, cfg)
        return 0

    from torch_da3_oracle import TorchDA3Oracle

    oracle = TorchDA3Oracle(img_size=args.size).randomize(seed=args.seed).eval()
    with torch.inference_mode():
        depth, patch_hooks = oracle(tensor)

    tensors = {"metric_input": tensor.contiguous(), "depth": depth.contiguous()}
    for i, tok in enumerate(patch_hooks):
        tensors[f"backbone_tokens.stage{i}"] = tok.contiguous()

    cfg = DepthAnything3Config(
        image_size=args.size,
        patch_size=oracle.patch,
        hook_block_ids=oracle.hook_ids,
        head=DepthAnything3HeadConfig(
            dim_in=384, features=16, out_channels=(8, 12, 16, 16),
            output_dim=1, activation="exp", conf_activation="exp",
        ),
        attn_impl="jnp",
    )
    _save_oracle_artifacts(args, oracle, tensors, cfg)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--backend", choices=["upstream", "oracle"], default="upstream")
    parser.add_argument("--image", type=Path, required=True)
    parser.add_argument("--checkpoint", type=Path, default=None,
                        help="DA3 checkpoint (upstream backend)")
    parser.add_argument("--config", type=Path, default=None, help="DA3 YAML model config")
    parser.add_argument("--size", type=int, default=518)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--variant", choices=["metric-large", "small"], default="metric-large",
                        help="oracle backend: which DA3 architecture to build "
                        "(small = dual head + camera + variant ViT-S backbone)")
    parser.add_argument("--rope-coords", choices=["index", "norm_pm1"], default="index",
                        help="small oracle: RoPE coordinate parameterization")
    parser.add_argument("--cat-order", choices=["prev_first", "cur_first"], default="prev_first",
                        help="small oracle: cat-token hook pair order")
    parser.add_argument("--out", type=Path, default=Path("test_da3_reference.safetensors"))
    parser.add_argument("--save-state", type=Path, default=None,
                        help="oracle backend: also write the state dict (importable checkpoint)")
    parser.add_argument("--save-config", type=Path, default=None,
                        help="oracle backend: also write the model config JSON for cli.correctness")
    parser.add_argument("--skip-intermediates", action="store_true")
    args = parser.parse_args(argv)

    if args.backend == "oracle":
        return run_oracle(args)
    if args.checkpoint is None:
        print("--backend upstream needs --checkpoint", file=sys.stderr)
        return 2

    try:
        import numpy as np
        import torch
        from PIL import Image
        from safetensors.torch import save_file

        from depth_anything_3.api import DepthAnything3  # upstream repo
        from depth_anything_3.utils.geometry import (
            affine_inverse,
            pose_encoding_to_extri_intri,
        )
    except ImportError as err:
        print(
            f"missing dependency: {err}\n"
            "This tool needs the upstream ByteDance Depth-Anything-3 repo on "
            "PYTHONPATH and its checkpoint.",
            file=sys.stderr,
        )
        return 2

    from burn_depth_tpu.api.preprocess import TORCH_BICUBIC, resize_bicubic

    model = DepthAnything3.from_pretrained(str(args.checkpoint)).eval()

    image = np.asarray(Image.open(args.image).convert("RGB"))
    resized = resize_bicubic(image, args.size, args.size, a=TORCH_BICUBIC)
    arr = torch.from_numpy(resized).permute(2, 0, 1).float() / 255.0
    mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)
    tensor = ((arr - mean) / std)[None, None]  # [B=1, S=1, 3, H, W]

    tensors: dict[str, torch.Tensor] = {"metric_input": tensor.squeeze(1).contiguous()}

    with torch.inference_mode():
        feats, _aux = model.backbone(tensor, cam_token=None, export_feat_layers=[])
        output = model._process_depth_head(feats, tensor.shape[-2], tensor.shape[-1])

        tensors["depth"] = output["depth"].detach().cpu().squeeze(1).contiguous()
        tensors["depth_confidence"] = output["depth_conf"].detach().cpu().squeeze(1).contiguous()
        ray = output.get("ray")
        if ray is not None:
            r = ray.detach().cpu()
            r = r.squeeze(1) if r.ndim == 5 else r
            tensors["ray"] = r.permute(0, 3, 1, 2).contiguous()
        ray_conf = output.get("ray_conf")
        if ray_conf is not None:
            rc = ray_conf.detach().cpu()
            tensors["ray_confidence"] = (rc.squeeze(1) if rc.ndim == 4 else rc).contiguous()

        if model.cam_dec is not None:
            pose = model.cam_dec(feats[-1][1])
            c2w, ixt = pose_encoding_to_extri_intri(pose, (tensor.shape[-2], tensor.shape[-1]))
            tensors["pose_encoding"] = pose.detach().cpu().contiguous()
            tensors["extrinsics"] = affine_inverse(c2w).detach().cpu().contiguous()
            tensors["intrinsics"] = ixt.detach().cpu().contiguous()

        if not args.skip_intermediates:
            b, s, n, c = feats[0][0].shape
            for i, f in enumerate(feats):
                tensors[f"backbone_tokens.stage{i}"] = (
                    f[0].reshape(b * s, n, c).detach().cpu().contiguous()
                )

    args.out.parent.mkdir(parents=True, exist_ok=True)
    save_file(tensors, str(args.out))
    print(f"wrote {len(tensors)} tensors to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
