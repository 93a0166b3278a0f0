"""Serving layer: sharded batch inference + double-buffered input staging.

Replaces the reference's realtime host pipeline (Bevy async task pool with one
in-flight inference + bounded camera channel,
``crates/bevy_burn_depth/src/main.rs:36,223``, ``platform.rs:25``) with the
TPU-native equivalents mandated by ``BASELINE.json`` configs 4-5:

* ``compile_serving_step`` — the full forward jitted over a device mesh with
  data-parallel batch sharding (+ optional tensor parallelism),
* ``DepthStream`` — persistent-weights streaming with double-buffered
  host→HBM transfers so PCIe upload overlaps TPU compute,
* ``DynamicBatcher`` — coalesces concurrent single-frame requests into the
  static-shape batch buckets XLA compiles (production request batching).
"""

from burn_depth_tpu.serve.step import (  # noqa: F401
    ServingStep,
    compile_multiview_step,
    compile_serving_step,
    with_u8_ingest,
)
from burn_depth_tpu.serve.stream import DepthStream, stream_image_dir  # noqa: F401
from burn_depth_tpu.serve.realtime import (  # noqa: F401
    FpsDiagnostic,
    FrameSource,
    ImageDirSource,
    PrefetchedDirSource,
    RealtimeFrame,
    SyntheticSource,
    run_realtime,
    run_realtime_multi,
)
from burn_depth_tpu.serve.service import BatchedInferService  # noqa: F401
from burn_depth_tpu.serve.http import DepthHTTPServer  # noqa: F401
from burn_depth_tpu.serve.grpc_server import DepthGrpcServer  # noqa: F401
from burn_depth_tpu.serve.grpc_client import DepthGrpcClient  # noqa: F401
from burn_depth_tpu.serve.batcher import DynamicBatcher  # noqa: F401
from burn_depth_tpu.serve.export import export_serving, load_exported  # noqa: F401
