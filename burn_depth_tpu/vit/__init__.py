"""DINOv2 vision transformers (the reference consumes these from the external
``burn_dino`` crate; here they are implemented natively, TPU-first)."""

from burn_depth_tpu.vit.dinov2 import (  # noqa: F401
    DinoViTConfig,
    DinoOutput,
    DinoHook,
    init_dinov2,
    dinov2_forward,
)
