"""TCP feature-server tests (the ServerSiftGPU distribution layer analog,
SURVEY.md §2.2 / §3.4 ⚠): protocol round-trip, remote parity with local
results, and the CreateRemoteSiftGPU-style spawn path."""

import sys
import threading

import numpy as np
import pytest

from siftgpu_tpu.oracle import fixtures
from siftgpu_tpu.pipeline import server
from siftgpu_tpu.pipeline.api import SiftTPU, SiftMatchTPU


@pytest.fixture(scope="module")
def served():
    """In-process server on an ephemeral port (conftest pins the CPU
    platform, so the thread shares the test process's backend)."""
    import queue

    q = queue.Queue()
    t = threading.Thread(
        target=server.serve,
        args=(0,),
        kwargs=dict(argv=["-t", "0.02"], max_sift=512, _ready_cb=q.put),
        daemon=True,
    )
    t.start()
    port = q.get(timeout=30)
    combo = server.RemoteComboSiftTPU("127.0.0.1", port)
    yield combo
    combo.shutdown()
    t.join(timeout=10)


@pytest.fixture(scope="module")
def frames():
    a = fixtures.random_texture(64, 80, seed=5)
    b = fixtures.warp_affine(a, np.eye(2), np.array([2.0, -1.0]))
    return a, b


def test_ping(served):
    assert served.ping()


def test_remote_matches_local(served, frames):
    a, _ = frames
    assert served.sift.run_sift(a)
    rk, rd = served.sift.get_feature_vector()
    assert served.sift.get_feature_num() == len(rk) > 5

    local = SiftTPU(argv=["-t", "0.02"])
    local.run_sift(a)
    lk, ld = local.get_feature_vector()
    np.testing.assert_allclose(rk, lk)
    np.testing.assert_array_equal(rd, ld)


def test_remote_match_flow(served, frames):
    a, b = frames
    served.sift.run_sift(a)
    k0, d0 = served.sift.get_feature_vector()
    served.sift.run_sift(b)
    k1, d1 = served.sift.get_feature_vector()
    served.matcher.set_descriptors(0, d0)
    served.matcher.set_descriptors(1, d1)
    pairs = served.matcher.get_sift_match()
    assert len(pairs) >= 5

    m = SiftMatchTPU(max_sift=512)
    m.set_descriptors(0, d0)
    m.set_descriptors(1, d1)
    np.testing.assert_array_equal(pairs, m.get_sift_match())


def test_server_error_does_not_kill_session(served):
    with pytest.raises(RuntimeError, match="server error"):
        served.matcher.get_guided_sift_match()  # locations never set
    assert served.ping()  # command loop survived


@pytest.mark.slow
def test_spawned_server_roundtrip(frames):
    """create_remote_sift_tpu spawn path: a real subprocess server."""
    a, _ = frames
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    combo = server.create_remote_sift_tpu(port, spawn=True, cpu=True)
    try:
        assert combo.ping()
        assert combo.sift.run_sift(a)
        assert combo.sift.get_feature_num() > 5
    finally:
        combo.shutdown()
