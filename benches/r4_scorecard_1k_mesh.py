"""Re-run the 1000-step scorecard's pm + treepm rows on random_cluster
after the mesh fixes (matmul-DFT Poisson at Precision.HIGHEST +
poly-split TreePM): the r4w4 rows measured the reduced-precision FFT
(med err 0.25 for both), not the solvers. The tree row is unchanged
(logs/r4w4_r4_scorecard_1k.log).

Run detached: nohup python benches/r4_scorecard_1k_mesh.py > log 2>&1 &
"""
import os
import runpy

os.environ.setdefault("SPACETPU_SCORECARD_SOLVERS", "pm,treepm")
# each solver's own default grid: pm 128, treepm 256 (r4w11: the treepm
# default is 1.66x faster AND 3x tighter p99 than grid=128 at N=1M)
os.environ.setdefault("SPACETPU_SCORECARD_GRID", "auto")
# recalibrate at production cadence: the r4w4 run ended with ~1e6
# counted near-overflows against t=0 caps as the cluster collapsed
os.environ.setdefault("SPACETPU_SCORECARD_RECAL_EVERY", "100")

runpy.run_path(
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "r4_scorecard_1k.py"),
    run_name="__main__",
)
