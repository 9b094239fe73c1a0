"""TreePM at grid=256: does halving r_cut flip the 4M loss into a win?

logs/r4w1_r3_treepm.log measured TreePM at grid=128 losing to the tree
(0.56x at 1M, 0.37x at 4M) because the cutoff near tiles explode with
density (1.65M tiles at 4M). Doubling the grid halves h and therefore
r_cut = 4.5*1.75*h, cutting the short-range pair count ~8x, while the
doubled-mesh FFT grows 8x (256^3 -> 512^3 cells) — r4_treepm_prof's
phase breakdown says which side wins. This reruns the r3 bench at
grid=256 (the kernel table is 269 MB, threaded as a jit argument —
the exact configuration that used to HTTP-413 before the
consts-as-arguments fix).

Run detached: nohup python benches/r4_treepm_grid256.py > log 2>&1 &
"""
import os
import runpy

os.environ.setdefault(
    "SPACETPU_TREEPM_GRID",
    "64" if os.environ.get("SPACETPU_BENCH_SCALE") == "smoke" else "256")

runpy.run_path(
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "r3_treepm.py"),
    run_name="__main__",
)
