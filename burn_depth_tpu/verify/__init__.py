"""Parity verification harness (reference ``example/correctness.rs`` and
``example/da3_small_correctness.rs``).

Two halves, like the reference:

* the **golden dumps** come from the upstream PyTorch repos via
  ``tools/correctness_depth_pro.py`` / ``tools/correctness_da3.py`` (same
  safetensors schema as the reference's Python tools, so existing dumps drop
  in unchanged);
* this package **replays** the same input through the JAX models, compares
  every dumped stage (mean-abs / max-abs / max-rel + worst-pixel
  localization), and pass/fails on the reference's hard thresholds
  (``correctness.rs:887-904``, ``:1109-1118``).

The layered bisection idiom is preserved: full pass, decoder-only from torch
features, head-only from torch tokens (``da3_small_correctness.rs:279-326``).
"""

from burn_depth_tpu.verify.stats import StageStats, compute_stats  # noqa: F401
from burn_depth_tpu.verify.depth_pro import DEPTH_PRO_THRESHOLDS, run_depth_pro_parity  # noqa: F401
from burn_depth_tpu.verify.da3 import DA3_THRESHOLDS, run_da3_parity  # noqa: F401
