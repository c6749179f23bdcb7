"""Actual 2-process ``jax.distributed`` run on localhost CPU (2 x 4 virtual
devices) asserting loss parity with a single-process run — validates the
``make_array_from_process_local_data`` feeding path in ``shard_batch``
(round-1 VERDICT next-round #2)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_dist_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\nSTDOUT:{out}\nSTDERR:{err[-3000:]}"
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("DIST_RESULT "):
                r = json.loads(line[len("DIST_RESULT "):])
                results[r["pid"]] = r["losses"]
    assert set(results) == {0, 1}, results
    # the loss is a replicated global scalar: both processes must agree
    np.testing.assert_allclose(results[0], results[1], rtol=1e-12)

    # single-process reference over the identical global batch (this pytest
    # process has 8 virtual devices via conftest)
    from tests._dist_worker import run_steps, synth_batch
    from deep_prob_feature_track_tpu.parallel.mesh import make_mesh

    ref = run_steps(make_mesh(), synth_batch(B=8), B=8)
    # step 1 is a pure forward+backward of identical data: tight match.
    # step 2 went through one Adam update, which amplifies the float
    # non-associativity of cross-process collectives (gloo) vs in-process
    # reductions — observed ~1e-3 relative; anything beyond 1% would mean a
    # real sharding bug (e.g. unsynced halves).
    np.testing.assert_allclose(results[0][0], ref[0], rtol=1e-4)
    np.testing.assert_allclose(results[0][1], ref[1], rtol=1e-2)
    # training actually progressed
    assert ref[1] < ref[0]
