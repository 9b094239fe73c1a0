"""1000-step drift rows for the solver scorecard (VERDICT-r3 #4).

The r4w2 scorecard run measured force error + 200-step drift for
pm/treepm/tree at N=1M; the tree's existing 1k-step rows are in
BENCH_NOTES (plummer +1.32e-6, fixed_cloud 0.0). This wrapper re-runs
the same scorecard at 1000 steps on the mesh-resolvable scene so the
PM/TreePM drift rows match the tree's horizon. Knobs stay overridable.

Run detached: nohup python benches/r4_scorecard_1k.py > log 2>&1 &
"""
import os
import runpy

os.environ.setdefault("SPACETPU_SCORECARD_STEPS",
                      "3" if os.environ.get("SPACETPU_BENCH_SCALE") ==
                      "smoke" else "1000")
os.environ.setdefault("SPACETPU_SCORECARD_SCENES", "cluster")
os.environ.setdefault("SPACETPU_SCORECARD_SOLVERS", "pm,treepm,tree")

runpy.run_path(
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "r4_scorecard.py"),
    run_name="__main__",
)
