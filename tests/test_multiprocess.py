"""TRUE multi-process distributed test (SURVEY.md §4.3).

Spawns two OS processes that form one global 8-device CPU mesh via
`jax.distributed.initialize` on localhost and run the distributed Schur BA —
the collectives cross a real process boundary (the multi-host DCN code path),
unlike the in-process virtual-mesh tests.  The reference's `ServerSiftGPU`
TCP layer had no cross-process test at all ⚠."""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_ba(tmp_path):
    port = _free_port()
    out = tmp_path / "result.json"
    worker = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
    env = dict(os.environ)
    # drop any single-process device-count forcing from conftest so the
    # workers control their own XLA_FLAGS
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extra = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [repo, "/root/.axon_site", extra] if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=560)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    res = json.loads(out.read_text())
    assert res["processes"] == 2
    assert res["devices"] == 8
    # distributed run must reach the noise-free optimum and agree with the
    # single-device solve up to solver tolerance
    assert res["cost"] < 1e-4, res
    assert res["ref_cost"] < 1e-4, res
    assert res["rot_err"] < 1e-3, res
