"""Python client for the gRPC depth service (``serve/grpc_server.py``).

Thin convenience over hand-wired method stubs (no grpcio-tools in the
image): numpy frames in, numpy depth maps out.
"""

from __future__ import annotations

import json
from typing import Iterable, Iterator, Optional, Tuple

import numpy as np

from burn_depth_tpu.serve.grpc_server import MAX_MESSAGE_BYTES, SERVICE_NAME

__all__ = ["DepthGrpcClient"]


def _to_request(frame: np.ndarray, request_id: str = ""):
    from burn_depth_tpu.serve.proto import depth_pb2

    if frame.ndim != 3 or frame.shape[2] != 3 or frame.dtype != np.uint8:
        raise ValueError(f"frame must be HWC u8 RGB, got {frame.shape} {frame.dtype}")
    h, w = frame.shape[:2]
    return depth_pb2.InferRequest(
        width=w, height=h, rgb=np.ascontiguousarray(frame).tobytes(),
        request_id=request_id,
    )


def _from_reply(reply) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    h, w = int(reply.height), int(reply.width)
    depth = np.frombuffer(reply.depth_f32, np.float32).reshape(h, w)
    u8 = (
        np.frombuffer(reply.depth_u8, np.uint8).reshape(h, w)
        if reply.depth_u8 else None
    )
    return depth, u8


class DepthGrpcClient:
    """``infer`` one frame, ``infer_stream`` a pipelined frame iterator."""

    def __init__(self, target: str):
        import grpc

        from burn_depth_tpu.serve.proto import depth_pb2

        self._channel = grpc.insecure_channel(
            target,
            options=[
                ("grpc.max_receive_message_length", MAX_MESSAGE_BYTES),
                ("grpc.max_send_message_length", MAX_MESSAGE_BYTES),
            ],
        )
        prefix = f"/{SERVICE_NAME}/"
        self._infer = self._channel.unary_unary(
            prefix + "Infer",
            request_serializer=depth_pb2.InferRequest.SerializeToString,
            response_deserializer=depth_pb2.InferReply.FromString,
        )
        self._infer_stream = self._channel.stream_stream(
            prefix + "InferStream",
            request_serializer=depth_pb2.InferRequest.SerializeToString,
            response_deserializer=depth_pb2.InferReply.FromString,
        )
        self._get_stats = self._channel.unary_unary(
            prefix + "GetStats",
            request_serializer=depth_pb2.StatsRequest.SerializeToString,
            response_deserializer=depth_pb2.StatsReply.FromString,
        )

    def infer(
        self, frame: np.ndarray, timeout: Optional[float] = None
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """RGB HWC u8 frame -> (depth f32 [S,S], normalized u8 [S,S] | None)."""
        return _from_reply(self._infer(_to_request(frame), timeout=timeout))

    def infer_stream(
        self, frames: Iterable[np.ndarray], timeout: Optional[float] = None
    ) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray]]]:
        """Stream frames; yields depth maps in frame order (pipelined)."""
        requests = (_to_request(f, request_id=str(i)) for i, f in enumerate(frames))
        for reply in self._infer_stream(requests, timeout=timeout):
            yield _from_reply(reply)

    def stats(self) -> dict:
        from burn_depth_tpu.serve.proto import depth_pb2

        return json.loads(self._get_stats(depth_pb2.StatsRequest()).json)

    def close(self) -> None:
        self._channel.close()

    def __enter__(self) -> "DepthGrpcClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
