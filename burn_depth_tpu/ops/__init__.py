"""TPU-native tensor ops shared by all models."""

from burn_depth_tpu.ops.interpolate import (  # noqa: F401
    resize_bilinear,
    resize_bilinear_scale,
)
from burn_depth_tpu.ops.conv import conv2d, conv_transpose2d  # noqa: F401
from burn_depth_tpu.ops.norm import layer_norm, token_norm  # noqa: F401
from burn_depth_tpu.ops.linear import linear  # noqa: F401
from burn_depth_tpu.ops.quant import (  # noqa: F401
    calibrate_amax,
    int8_linear,
    quantize_linear_params,
    quantize_vit_blocks,
)
from burn_depth_tpu.ops.conv import (  # noqa: F401
    conv2d_nhwc,
    conv_transpose2d_nhwc,
    conv_weight_to_hwio,
    convt_weight_to_hwio,
)
