"""gRPC depth service: the HTTP ``/infer`` endpoint's binary-framing twin.

High-rate clients shipping megapixel frames pay real overhead to HTTP/1.1
framing + base64-free multipart parsing (measured as the transfer floor in
BENCH.md's batched-serving section).  gRPC keeps the same server-side shape —
every RPC lands in the shared :class:`BatchedInferService`, so concurrent
clients coalesce into the static-shape XLA buckets — behind length-prefixed
HTTP/2 frames and a typed schema (``serve/proto/depth.proto``).

The service stubs are hand-written (the image ships ``grpcio`` but not
``grpcio-tools``); the message classes are protoc-generated
(``serve/proto/depth_pb2.py``).  Reference counterpart: none — the Bevy app
serves a window, not a network API; this is north-star serving surface.
"""

from __future__ import annotations

import collections
import json
import threading
from typing import Iterator, Optional

import numpy as np

__all__ = ["DepthGrpcServer", "SERVICE_NAME", "add_servicer", "MAX_MESSAGE_BYTES"]

SERVICE_NAME = "burn_depth.DepthService"

# 1536² RGB is ~7 MB; leave headroom for 4K frames without letting one
# request balloon host memory (the HTTP server's 32 MB cap, mirrored).
MAX_MESSAGE_BYTES = 32 << 20


def _decode_frame(request, context):
    """Validate an InferRequest and return the HWC u8 frame (or abort)."""
    import grpc

    w, h = int(request.width), int(request.height)
    if w <= 0 or h <= 0:
        context.abort(grpc.StatusCode.INVALID_ARGUMENT, f"bad dimensions {w}x{h}")
    expected = w * h * 3
    if len(request.rgb) != expected:
        context.abort(
            grpc.StatusCode.INVALID_ARGUMENT,
            f"rgb buffer is {len(request.rgb)} bytes, expected {expected} "
            f"({w}x{h}x3 packed u8)",
        )
    return np.frombuffer(request.rgb, np.uint8).reshape(h, w, 3)


class _DepthServicer:
    """RPC implementations over the shared batched inference lane."""

    def __init__(self, infer_service, stream_window: int = 8):
        self._service = infer_service
        self._stream_window = max(1, int(stream_window))
        self._lock = threading.Lock()
        self._requests = 0
        self._stream_frames = 0

    def _reply(self, future, request_id: str):
        from burn_depth_tpu.serve.proto import depth_pb2

        depth, u8 = future.result()
        depth = np.ascontiguousarray(np.asarray(depth, np.float32))
        u8 = np.ascontiguousarray(np.asarray(u8, np.uint8))
        s_h, s_w = depth.shape
        return depth_pb2.InferReply(
            width=s_w,
            height=s_h,
            depth_f32=depth.tobytes(),
            depth_u8=u8.tobytes(),
            request_id=request_id,
        )

    # -- RPCs -----------------------------------------------------------------

    def Infer(self, request, context):
        frame = _decode_frame(request, context)
        with self._lock:
            self._requests += 1
        return self._reply(self._service.submit(frame), request.request_id)

    def InferStream(self, request_iterator, context) -> Iterator:
        """Replies in request order with up to ``stream_window`` frames in
        flight — a lone video client still fills multi-lane buckets."""
        pending: collections.deque = collections.deque()
        for request in request_iterator:
            frame = _decode_frame(request, context)
            # Drain BEFORE submitting so in-flight frames never exceed the
            # window (submit-then-drain would transiently hold window+1).
            while len(pending) >= self._stream_window:
                yield self._reply(*pending.popleft())
            pending.append((self._service.submit(frame), request.request_id))
            with self._lock:
                self._requests += 1
                self._stream_frames += 1
        while pending:
            yield self._reply(*pending.popleft())

    def GetStats(self, request, context):
        from burn_depth_tpu.serve.proto import depth_pb2

        with self._lock:
            stats = {"requests": self._requests, "stream_frames": self._stream_frames}
        batcher = self._service.stats()
        if batcher is not None:
            stats["batcher"] = batcher
        return depth_pb2.StatsReply(json=json.dumps(stats))


def add_servicer(server, servicer) -> None:
    """Register ``servicer`` on a ``grpc.Server`` (the generated-stub role)."""
    import grpc

    from burn_depth_tpu.serve.proto import depth_pb2

    handlers = {
        "Infer": grpc.unary_unary_rpc_method_handler(
            servicer.Infer,
            request_deserializer=depth_pb2.InferRequest.FromString,
            response_serializer=depth_pb2.InferReply.SerializeToString,
        ),
        "InferStream": grpc.stream_stream_rpc_method_handler(
            servicer.InferStream,
            request_deserializer=depth_pb2.InferRequest.FromString,
            response_serializer=depth_pb2.InferReply.SerializeToString,
        ),
        "GetStats": grpc.unary_unary_rpc_method_handler(
            servicer.GetStats,
            request_deserializer=depth_pb2.StatsRequest.FromString,
            response_serializer=depth_pb2.StatsReply.SerializeToString,
        ),
    }
    server.add_generic_rpc_handlers(
        (grpc.method_handlers_generic_handler(SERVICE_NAME, handlers),)
    )


class DepthGrpcServer:
    """Own a ``grpc.Server`` + the shared batched inference lane.

    >>> srv = DepthGrpcServer(model, port=0).start()
    >>> ...  # clients hit 127.0.0.1:{srv.port}
    >>> srv.stop()
    """

    def __init__(
        self,
        model,
        host: str = "127.0.0.1",
        port: int = 50051,
        *,
        batch_sizes=(1, 2, 4),
        adaptive_batching: bool = False,
        keep_aspect: bool = False,
        stream_window: int = 8,
        max_workers: int = 8,
    ):
        from burn_depth_tpu.serve.service import BatchedInferService

        self.model = model
        self._host = host
        self._requested_port = port
        self.port: Optional[int] = None
        self.infer_service = BatchedInferService(
            model, batch_sizes=batch_sizes, adaptive=adaptive_batching,
            keep_aspect=keep_aspect,
        )
        self._servicer = _DepthServicer(self.infer_service, stream_window=stream_window)
        self._max_workers = max_workers
        self._server = None

    def start(self) -> "DepthGrpcServer":
        from concurrent import futures

        import grpc

        self._server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=self._max_workers),
            options=[
                ("grpc.max_receive_message_length", MAX_MESSAGE_BYTES),
                ("grpc.max_send_message_length", MAX_MESSAGE_BYTES),
            ],
        )
        add_servicer(self._server, self._servicer)
        self.port = self._server.add_insecure_port(f"{self._host}:{self._requested_port}")
        if self.port == 0:
            raise RuntimeError(f"cannot bind {self._host}:{self._requested_port}")
        self._server.start()
        return self

    def wait(self) -> None:
        self._server.wait_for_termination()

    def stop(self, grace: float = 1.0) -> None:
        if self._server is not None:
            self._server.stop(grace).wait()
            self._server = None
        self.infer_service.stop()
