"""Apple Depth Pro (reference ``src/model/depth_pro/``)."""

from burn_depth_tpu.models.depth_pro.model import (  # noqa: F401
    DepthPro,
    DepthProConfig,
    DepthProInference,
)
