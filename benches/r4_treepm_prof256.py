"""TreePM phase profile at the production default grid (256 at N=1M).

The r4w11 A/B showed grid=256 + matmul DFT is both the speed and the
accuracy choice (714 ms/step vs 1189 at grid=128, p99 9.8e-4 vs 2.9e-3);
this decomposes where the remaining time goes at the new default —
whether the short pass (rcut halves -> ~1/8 the pairs) or the mesh pass
(deposit + 2x solve cost) now dominates.

Run detached: nohup python benches/r4_treepm_prof256.py > log 2>&1 &
"""
import os
import runpy

os.environ.setdefault(
    "SPACETPU_TREEPM_GRID",
    "64" if os.environ.get("SPACETPU_BENCH_SCALE") == "smoke" else "256")

runpy.run_path(
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "r4_treepm_prof.py"),
    run_name="__main__",
)
