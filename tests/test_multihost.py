"""Two-process distributed mesh test (parallel/multihost.py).

Launches two REAL OS processes that join one jax.distributed runtime on
the CPU backend (2 virtual devices each -> a global 4-device mesh) and
run a body-sharded direct force step through ring.ShardedSimulation.
Proves the multi-host plumbing (coordinator, global mesh, cross-process
collectives) composes with the simulation stack — the DCN-analogue path
SURVEY.md SS5 requires."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})

from spacetpu.parallel import multihost
ok = multihost.initialize(
    coordinator_address={coord!r}, num_processes=2, process_id={pid},
)
assert ok and jax.process_count() == 2
assert jax.device_count() == 4

import jax.numpy as jnp
import numpy as np
from spacetpu.parallel import ring
from spacetpu.state import make_state

mesh = ring.make_mesh()  # all 4 global devices
sim = ring.ShardedSimulation(mesh, 64, softening="plummer", eps=1e-2,
                             g=1.0, backend="xla", algorithm="direct")
rng = np.random.default_rng(0)
state = make_state(rng.normal(size=(64, 3)), np.zeros((64, 3)),
                   rng.uniform(0.5, 1.5, 64) / 64, dtype=jnp.float32)
# each process feeds its local shard via device_put on the global mesh
state = sim.shard_state(state)
state = sim.prime(state)
state = sim.step(state, jnp.float32(1e-3))
acc0 = np.asarray(jax.experimental.multihost_utils.process_allgather(
    state.acc, tiled=True))
assert np.all(np.isfinite(acc0))
print("WORKER_OK", jax.process_index(), acc0.shape, flush=True)
"""


@pytest.mark.skipif(os.environ.get("SPACETPU_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_cpu_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = []
    for pid in range(2):
        code = _WORKER.format(repo=repo, coord=coord, pid=pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env={**os.environ,
                 "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
                 "JAX_PLATFORMS": "cpu"},
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "WORKER_OK" in out, out
