"""True multi-process validation of the multi-host path: two separate
python processes, `jax.distributed.initialize` over localhost, 4 virtual
CPU devices each -> one global 8-device mesh.  Exercises for real what
single-process tests cannot: per-process global-batch assembly
(`jax.make_array_from_process_local_data`), wrapped equal loader shards,
equal per-host collective counts, the tagged replicated eval step, and
the index dedupe (reference DDP analog, trainer_ddp.py:144-156,259-267).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two processes x jit compiles: minutes

WORKER = os.path.join(os.path.dirname(__file__), "_mp_eval_worker.py")
N_VAL = 5


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_world(world: int, timeout: int = 900) -> list[subprocess.CompletedProcess]:
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(r), str(world), str(port), str(N_VAL)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for r in range(world)
    ]
    done = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        done.append((p.returncode, out, err))
    return done


def _metrics(out: str) -> list[float]:
    for line in out.splitlines():
        if line.startswith("METRICS "):
            return json.loads(line[len("METRICS "):])
    raise AssertionError(f"no METRICS line in: {out!r}")


def _nrows(out: str) -> int:
    for line in out.splitlines():
        if line.startswith("NROWS "):
            return int(line.split()[1])
    raise AssertionError(f"no NROWS line in: {out!r}")


def test_two_process_eval_matches_single_process():
    ref = _run_world(1)
    assert ref[0][0] == 0, ref[0][2][-2000:]
    ref_metrics = _metrics(ref[0][1])

    res = _run_world(2)
    for rc, out, err in res:
        assert rc == 0, err[-2000:]
    m0, m1 = _metrics(res[0][1]), _metrics(res[1][1])
    # replicated tagged outputs -> all ranks compute identical metrics
    np.testing.assert_allclose(m0, m1, rtol=0, atol=0)
    np.testing.assert_allclose(m0, ref_metrics, rtol=1e-4, atol=1e-4)
    # inference_test dedupes the wrap duplicate: exactly N_VAL rows
    assert _nrows(res[0][1]) == N_VAL
    assert _nrows(res[1][1]) == N_VAL

    # DDP train step across processes: psum'd aux is replicated — both
    # ranks must report the identical finite loss
    def _aux(out):
        for line in out.splitlines():
            if line.startswith("TRAINAUX "):
                return json.loads(line[len("TRAINAUX "):])
        raise AssertionError(f"no TRAINAUX line in: {out!r}")

    a0, a1 = _aux(res[0][1]), _aux(res[1][1])
    assert a0 == a1, (a0, a1)  # psum'd aux replicated across ranks
    assert all(np.isfinite(v) for v in a0.values()), a0
    # (no world=1 comparison: global batch composition differs, so the
    # per-step loss legitimately differs — replication + finiteness is
    # the cross-process contract here)
