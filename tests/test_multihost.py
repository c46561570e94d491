"""Multi-host skeleton CI: the sharded train step must produce the same
losses when its 8-device mesh spans 2 OS processes (jax.distributed + Gloo
CPU collectives) as when it lives in one process. This is the CI-able stand-in
for a real multi-host TPU slice (VERDICT r2 missing #1): same code path
(`jax.distributed.initialize` -> global mesh -> `put_global` inputs -> jitted
shard_map step), different process topology."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(procs, port, timeout=420, mode="", tag="MHLOSSES"):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets platform itself
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_mh_cache")
    argv_tail = [mode] if mode else []
    handles = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(procs), str(port)] + argv_tail,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for i in range(procs)
    ]
    losses = {}
    for i, h in enumerate(handles):
        out, err = h.communicate(timeout=timeout)
        assert h.returncode == 0, f"rank {i} failed:\n{err[-2000:]}"
        for line in out.splitlines():
            if line.startswith(tag):
                parts = line.split()
                losses[int(parts[1])] = [float(v) for v in parts[2:]]
    assert len(losses) == procs, losses
    return losses


@pytest.mark.slow
def test_two_process_mesh_matches_single_process():
    single = _run(1, _free_port())[0]
    multi = _run(2, _free_port())
    # every rank reports the same fully-replicated loss vector
    assert multi[0] == multi[1], multi
    for a, b in zip(single, multi[0]):
        assert abs(a - b) < 1e-6, (single, multi[0])


@pytest.mark.slow
def test_two_process_densify_growth_matches_single_process():
    """Capacity growth + densify_and_prune across a process-spanning mesh
    (PARITY known-gap: growth paths were single-process only). The worker
    grows 256 -> 512 capacity, densifies with a tiny threshold, re-shards,
    and runs another sharded step; counts and losses must match the
    single-process run exactly."""
    single = _run(1, _free_port(), mode="densify", tag="MHDENSIFY")[0]
    multi = _run(2, _free_port(), mode="densify", tag="MHDENSIFY")
    assert multi[0] == multi[1], multi
    # n_new, n_alive integers match exactly; losses to fp tolerance
    assert single[0] == multi[0][0] and single[1] == multi[0][1], (single, multi)
    for a, b in zip(single[2:], multi[0][2:]):
        assert abs(a - b) < 1e-6, (single, multi[0])
