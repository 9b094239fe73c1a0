"""Retry the scorecard's plummer x tree cell (r4w2 TPU-worker crash).

logs/r4w2_r4_scorecard.log: the tree cell on plummer(1M) died with
"UNAVAILABLE: TPU worker process crashed or restarted ... kernel
fault" after ~80 minutes of sustained TreePM near-kernel work, and the
scene-2 exact prime then hit the dead worker. The same tree
configuration ran fine in r3 (logs/r3_leaf_sweep3.log: 1874 ms/step),
so this isolates the cell: a clean pass = transient worker loss; a
repeat crash = deterministic kernel fault to chase.

Run detached: nohup python benches/r4_scorecard_plummer_tree.py > log &
"""
import os
import runpy

os.environ.setdefault("SPACETPU_SCORECARD_SCENES", "plummer")
os.environ.setdefault("SPACETPU_SCORECARD_SOLVERS", "tree")
os.environ.setdefault("SPACETPU_SCORECARD_STEPS",
                      "3" if os.environ.get("SPACETPU_BENCH_SCALE") ==
                      "smoke" else "200")

runpy.run_path(
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "r4_scorecard.py"),
    run_name="__main__",
)
