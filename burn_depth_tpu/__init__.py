"""burn_depth_tpu — a TPU-native (JAX/XLA/Pallas) monocular depth estimation framework.

A from-scratch rebuild of the capabilities of ``mosure/burn_depth`` (Rust/Burn),
designed TPU-first:

* the full forward pass — preprocessing, multi-scale patch split/merge, ViT
  encoders, DPT decoders, heads — compiles to a single XLA program with zero
  host round-trips (the reference's custom bilinear resize is a device→host
  readback loop; here it is a pair of MXU matmuls),
* attention runs as a Pallas flash-attention kernel on TPU,
* serving shards batches data-parallel over a ``jax.sharding.Mesh`` (ICI).

Models implemented end to end:

* **Apple Depth Pro** — multi-scale DINOv2-L/16 pyramid encoder → DPT-style
  multires conv decoder → depth head + FOV/focal head; metric depth at
  1536x1536 (reference: ``src/model/depth_pro/``).
* **Depth Anything 3** — DINOv2 backbone with hook taps → DPT head;
  ``metric-large`` (ViT-L mono head @518) and ``small`` (ViT-S dual head with
  depth + confidence + ray aux + camera pose) (reference:
  ``src/model/depth_anything3/``).
"""

__version__ = "0.1.0"

from burn_depth_tpu.api import (  # noqa: F401
    AnyDepthModel,
    DepthModelKind,
    DepthPrediction,
    infer_from_rgb,
    load_model,
    rgb_to_input_tensor,
)
