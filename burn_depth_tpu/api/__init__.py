"""Unified inference API: preprocessing, prediction struct, model registry.

TPU-native counterpart of reference ``src/inference.rs`` + ``src/model/mod.rs``.
"""

from burn_depth_tpu.api.geometry import (  # noqa: F401
    camera_to_world,
    intrinsics_from_focal,
    normals_from_depth,
    pointcloud_from_depth,
    points_from_rays,
    project_points,
    unproject_depth,
    world_to_camera,
    write_ply,
)
from burn_depth_tpu.api.predict import (  # noqa: F401
    DepthPrediction,
    infer_from_rgb,
    rgb_to_input_tensor,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from burn_depth_tpu.api.preprocess import (  # noqa: F401
    ImageCropRegion,
    PreparedModelImage,
    prepare_depth_anything3_image,
    resize_bicubic,
)
from burn_depth_tpu.api.registry import (  # noqa: F401
    AnyDepthModel,
    DepthModelKind,
    load_model,
)
