"""gRPC depth service (serve/grpc_server.py + grpc_client.py).

North-star serving surface (the reference exposes no network API): unary +
streaming RPCs land in the shared BatchedInferService, replies come back in
order, malformed frames abort with INVALID_ARGUMENT, and the wire schema
(serve/proto/depth.proto) roundtrips numpy exactly.
"""

import dataclasses

import numpy as np
import pytest

pytest.importorskip("grpc")

import jax  # noqa: E402

from burn_depth_tpu.api.registry import AnyDepthModel, DepthModelKind  # noqa: E402
from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config  # noqa: E402
from burn_depth_tpu.serve.grpc_client import DepthGrpcClient  # noqa: E402
from burn_depth_tpu.serve.grpc_server import DepthGrpcServer  # noqa: E402


@pytest.fixture(scope="module")
def server():
    tiny = dataclasses.replace(
        DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp"
    )
    inner = DepthAnything3.init(jax.random.PRNGKey(0), tiny)
    model = AnyDepthModel(kind=DepthModelKind.DEPTH_ANYTHING3, model=inner)
    srv = DepthGrpcServer(model, port=0, batch_sizes=(1, 2, 4)).start()
    yield srv
    srv.stop()


@pytest.fixture()
def client(server):
    with DepthGrpcClient(f"127.0.0.1:{server.port}") as c:
        yield c


def _frame(seed=0, h=40, w=52):
    return np.random.default_rng(seed).integers(0, 255, (h, w, 3), dtype=np.uint8)


def test_unary_infer_roundtrip(server, client):
    depth, u8 = client.infer(_frame(), timeout=120.0)
    assert depth.shape == (28, 28) and depth.dtype == np.float32
    assert np.isfinite(depth).all()
    assert u8 is not None and u8.shape == (28, 28) and u8.dtype == np.uint8
    # same frame through the in-process service == same numbers over the wire
    ref_depth, ref_u8 = server.infer_service.infer(_frame())
    np.testing.assert_array_equal(depth, ref_depth)
    np.testing.assert_array_equal(u8, ref_u8)


def test_stream_replies_in_request_order(client):
    frames = [_frame(seed=i) for i in range(5)]
    streamed = list(client.infer_stream(frames, timeout=300.0))
    assert len(streamed) == 5
    for f, (d, _) in zip(frames, streamed):
        ref, _ = client.infer(f, timeout=120.0)
        # streamed frames coalesce into bigger buckets — a different XLA
        # program than the b=1 unary path, so tolerance not bit-equality
        np.testing.assert_allclose(d, ref, rtol=1e-4, atol=1e-5)


def test_bad_buffer_length_rejected(server, client):
    import grpc

    from burn_depth_tpu.serve.proto import depth_pb2

    bad = depth_pb2.InferRequest(width=10, height=10, rgb=b"\0" * 7)
    with pytest.raises(grpc.RpcError) as e:
        client._infer(bad, timeout=30.0)
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT
    assert "expected 300" in e.value.details()

    zero = depth_pb2.InferRequest(width=0, height=10, rgb=b"")
    with pytest.raises(grpc.RpcError) as e:
        client._infer(zero, timeout=30.0)
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT


def test_client_validates_frame(client):
    with pytest.raises(ValueError, match="HWC u8 RGB"):
        client.infer(np.zeros((4, 4, 3), np.float32))


def test_stats_counts_requests(server, client):
    before = client.stats()
    client.infer(_frame(), timeout=120.0)
    after = client.stats()
    assert after["requests"] >= before["requests"] + 1
    assert "batcher" in after and after["batcher"]["served"] >= 1


def test_oversize_message_rejected(server):
    """A frame beyond the 32 MB cap must fail cleanly, not OOM the server.

    Uses a raw channel with a RAISED client-side send cap so the rejection
    provably comes from the server's grpc.max_receive_message_length (the
    default DepthGrpcClient channel would refuse to send it in the first
    place, leaving the server enforcement untested)."""
    import grpc

    from burn_depth_tpu.serve.grpc_server import SERVICE_NAME
    from burn_depth_tpu.serve.proto import depth_pb2

    channel = grpc.insecure_channel(
        f"127.0.0.1:{server.port}",
        options=[("grpc.max_send_message_length", 64 << 20)],
    )
    try:
        stub = channel.unary_unary(
            f"/{SERVICE_NAME}/Infer",
            request_serializer=depth_pb2.InferRequest.SerializeToString,
            response_deserializer=depth_pb2.InferReply.FromString,
        )
        big = np.zeros((4000, 3000, 3), np.uint8)  # 36 MB > 32 MB cap
        req = depth_pb2.InferRequest(width=3000, height=4000, rgb=big.tobytes())
        with pytest.raises(grpc.RpcError) as e:
            stub(req, timeout=60.0)
        assert e.value.code() == grpc.StatusCode.RESOURCE_EXHAUSTED
    finally:
        channel.close()
