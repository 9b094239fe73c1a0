"""Bench bit-rot guard (round-3 weak #7: two of three queue-10 chip jobs
died on stale bench kwargs after the chip had been held for an hour).

Two tiers:
  * every script under benches/ (plus the repo-root chip probes and
    bench.py) must at least byte-compile, so a syntax error can't reach
    a chip queue;
  * the scripts that honour SPACETPU_BENCH_SCALE=smoke are EXECUTED on
    CPU at tiny sizes — the same files the chip queue runs, so any
    drifted library API fails here in minutes instead of on the chip.

The smoke runs are subprocesses: each script configures its own JAX
backend via spacetpu.utils.benchenv (SPACETPU_BENCH_CPU=1), and the
parent test process's TPU-free config does not leak in either direction.
"""

import os
import py_compile
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ALL_SCRIPTS = sorted(
    [os.path.join("benches", f) for f in os.listdir(os.path.join(REPO, "benches"))
     if f.endswith(".py")]
    + [f for f in os.listdir(REPO)
       if f.endswith(".py") and (f.startswith("_probe") or f == "bench.py")]
)

# scripts wired for SPACETPU_BENCH_SCALE=smoke (see spacetpu/utils/benchenv.py)
SMOKE_SCRIPTS = [
    "bench.py",
    os.path.join("benches", "probe_treepm_chip.py"),
    os.path.join("benches", "r3_largen.py"),
    os.path.join("benches", "r3_prof8m.py"),
    os.path.join("benches", "r3_tree2_prof.py"),
    os.path.join("benches", "r3_treepm.py"),
    os.path.join("benches", "r4_engine_auto.py"),
    os.path.join("benches", "r4_engine_sync.py"),
    os.path.join("benches", "r4_fftmm.py"),
    os.path.join("benches", "r4_fused_1m.py"),
    os.path.join("benches", "r4_multirate.py"),
    os.path.join("benches", "r4_pm_compact.py"),
    os.path.join("benches", "r4_scorecard.py"),
    os.path.join("benches", "r4_scorecard_1k.py"),
    os.path.join("benches", "r4_scorecard_plummer_tree.py"),
    os.path.join("benches", "r4_treepm_grid256.py"),
    os.path.join("benches", "r4_treepm_prof.py"),
    os.path.join("benches", "r5_maxn.py"),
    os.path.join("benches", "r5_treepm_finegrid.py"),
    os.path.join("benches", "r5_direct_mxu.py"),
    os.path.join("benches", "r5_engine_accurate_4m.py"),
    os.path.join("benches", "r5_pairs_mxu.py"),
    os.path.join("benches", "r5_kernel_device.py"),
    os.path.join("benches", "r5_tree_largen.py"),
    os.path.join("benches", "r5_16m_treepm_mesh.py"),
    os.path.join("benches", "r5_overlap_probe.py"),
    os.path.join("benches", "r5_scorecard.py"),
]


@pytest.mark.parametrize("script", ALL_SCRIPTS)
def test_bench_compiles(script):
    py_compile.compile(os.path.join(REPO, script), doraise=True)


@pytest.mark.parametrize("script", SMOKE_SCRIPTS)
def test_bench_smoke_runs(script):
    env = dict(os.environ)
    env.update(SPACETPU_BENCH_CPU="1", SPACETPU_BENCH_SCALE="smoke")
    # don't let the suite's 8-virtual-device setting slow the subprocess
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script)], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"{script} smoke run failed:\n{proc.stdout[-4000:]}\n"
        f"{proc.stderr[-4000:]}")
