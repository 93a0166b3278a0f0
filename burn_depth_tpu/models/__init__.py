"""Model families: Apple Depth Pro and Depth Anything 3."""

from burn_depth_tpu.models.da3 import (  # noqa: F401
    DepthAnything3,
    DepthAnything3Config,
    DepthAnything3Inference,
)
from burn_depth_tpu.models.depth_pro import (  # noqa: F401
    DepthPro,
    DepthProConfig,
    DepthProInference,
)
