"""TreePM-vs-tree at 1M/4M under the round-4 production defaults.

Re-runs benches/r3_treepm.py at grid=256 (the post-fftmm default for
N>=1M: matmul-DFT Poisson + poly split). The last large-N rows
(logs/r4w8_r3_treepm.log) were taken at grid=128 in the Chebyshev-kernel
era: 1M 1674 ms, 4M 14986 ms. r4w11 already showed 1M at 714 ms; this
fills the 4M cell and the step-time/force-delta table the docs cite.

Run detached: nohup python benches/r4_treepm_largen.py > log 2>&1 &
"""
import os
import runpy

os.environ.setdefault(
    "SPACETPU_TREEPM_GRID",
    "32" if os.environ.get("SPACETPU_BENCH_SCALE") == "smoke" else "256")

runpy.run_path(
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "r3_treepm.py"),
    run_name="__main__",
)
