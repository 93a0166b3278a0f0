"""Depth Anything 3 (reference ``src/model/depth_anything3/``)."""

from burn_depth_tpu.models.da3.model import (  # noqa: F401
    DepthAnything3,
    DepthAnything3Config,
    DepthAnything3Inference,
)
from burn_depth_tpu.models.da3.dpt import DepthAnything3HeadConfig  # noqa: F401
from burn_depth_tpu.models.da3.model import (  # noqa: F401
    CachedDepthAnything3,
    DepthTrace,
)
from burn_depth_tpu.models.da3.camera import (  # noqa: F401
    CameraDecoderConfig,
    CameraEncoderConfig,
    CameraPrediction,
)
