"""Dynamic request batching (serve/batcher.py).

The reference has no batched serving (one in-flight task, ``main.rs:36``);
this is north-star surface: concurrent requests must coalesce into the
static-shape buckets XLA compiles, pad correctly, split results per caller,
and propagate failures.
"""

import threading
import time

import numpy as np
import pytest

from burn_depth_tpu.serve.batcher import DynamicBatcher, bucket_for


def test_bucket_for():
    assert bucket_for(1, (1, 2, 4)) == 1
    assert bucket_for(3, (1, 2, 4)) == 4
    assert bucket_for(4, (1, 2, 4)) == 4
    with pytest.raises(ValueError):
        bucket_for(5, (1, 2, 4))


def test_single_request_roundtrip():
    calls = []

    def infer(x):
        calls.append(x.shape[0])
        return x * 2.0

    with DynamicBatcher(infer, batch_sizes=(1, 2, 4), max_delay_s=0.0) as b:
        out = b.infer(np.ones((3, 4), np.float32))
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones((3, 4), np.float32))
    assert calls == [1]


def test_concurrent_requests_coalesce_and_split():
    seen_batches = []
    release = threading.Event()

    def infer(x):
        seen_batches.append(x.shape[0])
        release.wait(5.0)  # hold the FIRST batch so the rest pile up
        return x + 100.0

    b = DynamicBatcher(infer, batch_sizes=(1, 2, 4, 8), max_delay_s=0.01).start()
    try:
        futures = [b.submit(np.full((2, 2), i, np.float32)) for i in range(9)]
        time.sleep(0.15)  # let requests 1..8 queue behind the held batch
        release.set()
        results = [f.result(10.0) for f in futures]
    finally:
        b.stop()

    for i, r in enumerate(results):
        np.testing.assert_array_equal(np.asarray(r), np.full((2, 2), i + 100.0, np.float32))
    # the pile-up must have produced at least one genuinely multi-lane batch
    assert max(seen_batches) > 1
    assert sum(seen_batches) >= 9  # padded lanes allowed
    stats = b.stats()
    assert stats["served"] == 9
    assert stats["mean_batch"] > 1.0


def test_padding_rounds_up_to_bucket():
    shapes = []

    def infer(x):
        shapes.append(x.shape[0])
        return x

    b = DynamicBatcher(infer, batch_sizes=(4,), max_delay_s=0.05).start()
    try:
        fs = [b.submit(np.full((1,), i, np.float32)) for i in range(3)]
        results = [f.result(5.0) for f in fs]
    finally:
        b.stop()
    assert shapes and all(s == 4 for s in shapes)  # 3 requests padded to the 4-bucket
    for i, r in enumerate(results):
        assert float(np.asarray(r)[0]) == i
    assert b.stats()["pad_fraction"] > 0


def test_error_propagates_to_all_callers():
    def infer(x):
        raise RuntimeError("boom")

    b = DynamicBatcher(infer, batch_sizes=(2,), max_delay_s=0.05).start()
    try:
        fs = [b.submit(np.zeros((1,), np.float32)) for _ in range(2)]
        for f in fs:
            with pytest.raises(RuntimeError, match="boom"):
                f.result(5.0)
    finally:
        b.stop()


def test_stop_fails_pending_and_rejects_new():
    started = threading.Event()
    block = threading.Event()

    def infer(x):
        started.set()
        block.wait(5.0)
        return x

    b = DynamicBatcher(infer, batch_sizes=(1,), max_delay_s=0.0).start()
    f = b.submit(np.zeros((1,), np.float32))
    started.wait(5.0)
    stopper = threading.Thread(target=b.stop)
    stopper.start()
    block.set()
    stopper.join(10.0)
    assert f.done()  # either served (raced the stop) or failed — never hung
    with pytest.raises(RuntimeError):
        b.submit(np.zeros((1,), np.float32))


def test_pytree_outputs_split_per_request():
    def infer(x):
        return {"depth": x * 2.0, "conf": x[:, :1]}

    with DynamicBatcher(infer, batch_sizes=(1, 2), max_delay_s=0.0) as b:
        out = b.infer(np.arange(4, dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(out["depth"]), 2 * np.arange(4, dtype=np.float32))
    assert np.asarray(out["conf"]).shape == (1,)


def test_batcher_over_sharded_serving_step():
    """End-to-end with the mesh path: buckets shard over the virtual 8-device
    data axis (bucket sizes = multiples of the mesh's data dim)."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices (virtual CPU mesh)")

    from burn_depth_tpu.parallel.mesh import make_mesh
    from burn_depth_tpu.serve.step import compile_serving_step

    mesh = make_mesh(jax.devices()[:4], model=1)
    params = {"w": jnp.full((3,), 2.0)}

    def fwd(p, x):  # [B,3,H,W] -> [B,H,W]
        return jnp.einsum("bchw,c->bhw", x, p["w"])

    step = compile_serving_step(fwd, params, mesh)
    with DynamicBatcher(lambda x: step(jnp.asarray(x)), batch_sizes=(4, 8), max_delay_s=0.02) as b:
        fs = [b.submit(np.full((3, 2, 2), i, np.float32)) for i in range(6)]
        results = [np.asarray(f.result(30.0)) for f in fs]
    for i, r in enumerate(results):
        np.testing.assert_allclose(r, np.full((2, 2), 6.0 * i))


def test_ragged_batch_fails_callers_but_worker_survives():
    """Mismatched frame shapes in one batch must error those callers only —
    the worker thread stays alive and serves the next request."""
    def infer(x):
        return x

    b = DynamicBatcher(infer, batch_sizes=(2,), max_delay_s=0.05).start()
    try:
        f1 = b.submit(np.zeros((2, 2), np.float32))
        f2 = b.submit(np.zeros((3, 3), np.float32))  # ragged with f1
        for f in (f1, f2):
            with pytest.raises(Exception):
                f.result(5.0)
        # worker must still be alive
        out = b.submit(np.ones((2, 2), np.float32))
        out2 = b.submit(np.ones((2, 2), np.float32))
        np.testing.assert_array_equal(np.asarray(out.result(5.0)), np.ones((2, 2), np.float32))
        np.testing.assert_array_equal(np.asarray(out2.result(5.0)), np.ones((2, 2), np.float32))
    finally:
        b.stop()


def test_adaptive_lone_request_skips_the_linger():
    """With no arrival history, an adaptive batcher serves a lone request
    immediately instead of holding it for the full max_delay_s."""
    def infer(x):
        return x

    with DynamicBatcher(infer, batch_sizes=(1, 2, 4), max_delay_s=1.0, adaptive=True) as b:
        t0 = time.monotonic()
        b.infer(np.zeros((1,), np.float32), timeout=5.0)
        dt = time.monotonic() - t0
    assert dt < 0.5, f"adaptive batcher lingered {dt:.3f}s on a lone request"


def test_adaptive_burst_still_coalesces():
    release = threading.Event()

    def infer(x):
        release.wait(5.0)  # hold the first batch so the burst piles up
        return x

    b = DynamicBatcher(infer, batch_sizes=(1, 2, 4, 8), max_delay_s=0.01, adaptive=True).start()
    try:
        futures = [b.submit(np.full((2,), i, np.float32)) for i in range(9)]
        time.sleep(0.1)
        release.set()
        for f in futures:
            f.result(10.0)
        assert b.stats()["mean_batch"] > 1.0
    finally:
        b.stop()


def test_worth_waiting_policy():
    b = DynamicBatcher(lambda x: x, batch_sizes=(1, 2, 4), adaptive=True)
    # no history -> sparse assumption -> never wait
    assert not b._worth_waiting(1, remaining=1.0)
    # fast arrivals (1 ms apart): 10 ms remaining covers the 1-lane gap at n=3
    b._ewma_gap_s = 0.001
    assert b._worth_waiting(3, remaining=0.010)
    # slow arrivals (100 ms apart): the same gap can't fill in 10 ms
    b._ewma_gap_s = 0.1
    assert not b._worth_waiting(3, remaining=0.010)
    # at the largest bucket there is nothing to wait for
    b._ewma_gap_s = 0.001
    assert not b._worth_waiting(4, remaining=1.0)
    # at an interior boundary (n=2), waiting targets the next bucket (gap 2)
    assert b._worth_waiting(2, remaining=0.010)
    b._ewma_gap_s = 0.1
    assert not b._worth_waiting(2, remaining=0.010)


def test_cancelled_future_skipped_without_poisoning_batch():
    release = threading.Event()

    def infer(x):
        release.wait(5.0)
        return x + 1.0

    b = DynamicBatcher(infer, batch_sizes=(1, 4), max_delay_s=0.05).start()
    try:
        hold = b.submit(np.zeros((1,), np.float32))  # occupies the worker
        time.sleep(0.05)
        f_cancel = b.submit(np.full((1,), 5.0, np.float32))
        f_keep = b.submit(np.full((1,), 7.0, np.float32))
        assert f_cancel.cancel()
        release.set()
        hold.result(5.0)
        np.testing.assert_array_equal(np.asarray(f_keep.result(5.0)), np.full((1,), 8.0, np.float32))
        assert f_cancel.cancelled()
    finally:
        b.stop()


def test_stop_with_full_queue_does_not_deadlock():
    """stop() while the queue is at queue_limit and the worker is mid-batch:
    the sentinel put must never block (the worker exits without another get),
    and the queued requests must be failed."""
    entered, release = threading.Event(), threading.Event()

    def infer(x):
        entered.set()
        release.wait(5.0)
        return x

    b = DynamicBatcher(infer, batch_sizes=(1,), max_delay_s=0.0, queue_limit=2).start()
    first = b.submit(np.zeros((2,), np.float32))
    assert entered.wait(2.0)  # worker is now inside _serve
    queued = [b.submit(np.zeros((2,), np.float32)) for _ in range(2)]  # fills the queue

    stopper = threading.Thread(target=b.stop)
    stopper.start()
    time.sleep(0.2)  # let stop() hit the full queue first
    release.set()
    stopper.join(timeout=5.0)
    assert not stopper.is_alive(), "stop() deadlocked on a full queue"
    assert np.asarray(first.result(1.0)).shape == (2,)
    for f in queued:
        with pytest.raises(RuntimeError, match="batcher stopped"):
            f.result(1.0)


def test_shape_lanes_group_by_shape():
    """by_shape: mixed-shape traffic is coalesced per shape lane — every
    batch the backend sees is shape-uniform, every caller succeeds, and the
    stats count the distinct lanes."""
    seen = []

    def infer(x):
        seen.append(x.shape)
        return x + 1

    b = DynamicBatcher(infer, batch_sizes=(1, 2, 4), max_delay_s=0.05, by_shape=True).start()
    try:
        futs = []
        for i in range(6):
            shape = (2, 2) if i % 2 == 0 else (3, 3)
            futs.append((shape, b.submit(np.zeros(shape, np.float32))))
        for shape, f in futs:
            out = np.asarray(f.result(10.0))
            np.testing.assert_array_equal(out, np.ones(shape, np.float32))
        # backend only ever saw shape-uniform batches
        assert all(s[1:] in ((2, 2), (3, 3)) for s in seen)
        assert b.stats()["shape_lanes"] == 2
        assert b.stats()["served"] == 6
    finally:
        b.stop()


def test_shape_lanes_holdover_not_starved():
    """A lone odd-shape request held over during another lane's linger must
    still be served (oldest lane seeds the next round)."""
    def infer(x):
        return x

    b = DynamicBatcher(infer, batch_sizes=(4,), max_delay_s=0.02, by_shape=True).start()
    try:
        f_a = b.submit(np.zeros((2, 2), np.float32))
        f_b = b.submit(np.zeros((5, 5), np.float32))  # held over behind lane A
        assert np.asarray(f_a.result(10.0)).shape == (2, 2)
        assert np.asarray(f_b.result(10.0)).shape == (5, 5)
    finally:
        b.stop()


def test_shape_lanes_stop_fails_holdover():
    """stop() must fail holdover futures too, not just queued ones."""
    import threading

    started = threading.Event()
    release = threading.Event()

    def infer(x):
        started.set()
        release.wait(10.0)
        return x

    b = DynamicBatcher(infer, batch_sizes=(1,), max_delay_s=0.2, by_shape=True).start()
    try:
        f1 = b.submit(np.zeros((2, 2), np.float32))
        started.wait(10.0)
        # while the worker is blocked serving f1, enqueue two different
        # shapes; the worker's next _collect sweeps one into holdover
        f2 = b.submit(np.zeros((3, 3), np.float32))
        f3 = b.submit(np.zeros((4, 4), np.float32))
    finally:
        release.set()
        f1.result(10.0)
        b.stop()
    for f in (f2, f3):
        assert f.done()
        if f.exception() is not None:
            assert "stopped" in str(f.exception())
