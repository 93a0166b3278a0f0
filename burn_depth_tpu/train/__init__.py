"""Training subsystem (beyond-parity: the reference is inference-only).

TPU-first fine-tuning for both model families: sharded+donated train step
over the serving mesh, bf16-compute/f32-master policy, remat knobs, masked
depth losses, and a self-contained synthetic data pipeline.
"""

from burn_depth_tpu.train.data import prefetch_to_device, synthetic_depth_batches
from burn_depth_tpu.train.datasets import benchmark_eval_batches, benchmark_train_batches
from burn_depth_tpu.train.distill import build_teacher_predict, pseudo_label_batches
from burn_depth_tpu.train.losses import (
    affine_alignment,
    fov_loss,
    gradient_matching_loss,
    laplace_nll_loss,
    masked_mean,
    silog_loss,
    ssi_mae_loss,
)
from burn_depth_tpu.train.metrics import (
    aligned_depth_metrics,
    depth_metrics,
    evaluate_model,
    pose_metrics,
)
from burn_depth_tpu.train.objectives import (
    da3_multiview_objective,
    da3_objective,
    depth_pro_objective,
)
from burn_depth_tpu.train.step import (
    TrainStep,
    adamw,
    compile_train_step,
    global_norm,
    train_state,
)

__all__ = [
    "TrainStep",
    "adamw",
    "affine_alignment",
    "benchmark_eval_batches",
    "benchmark_train_batches",
    "build_teacher_predict",
    "pseudo_label_batches",
    "aligned_depth_metrics",
    "compile_train_step",
    "da3_multiview_objective",
    "da3_objective",
    "depth_metrics",
    "depth_pro_objective",
    "evaluate_model",
    "pose_metrics",
    "fov_loss",
    "global_norm",
    "gradient_matching_loss",
    "laplace_nll_loss",
    "masked_mean",
    "prefetch_to_device",
    "silog_loss",
    "ssi_mae_loss",
    "synthetic_depth_batches",
    "train_state",
]
