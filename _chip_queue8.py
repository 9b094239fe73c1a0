"""Eighth chip job wave: measure the gather-based pair-segment build
(tree._pack_rows_flat — replaces the G*W scatter that cost 363 ms inside
tree2's shard_map at N=1M and ~1 s in the 4M single-chip prep):

  1. tree2 D=1 re-profile      — the 1.69x -> target <=1.3x tax claim
  2. TreePM small-N accuracy   — pallas vs xla vs exact on hardware
  3. large-N re-run            — 1M/4M/8M equal+adaptive step times with
                                 the cheap segment build (and the 8M
                                 adaptive config that used to OOM)
  4. bench.py                  — headline guard

Waits for _chip_queue7 (r3_queue10.log ALL DONE) so two jobs never share
the chip. Run detached:
  nohup python _chip_queue8.py > logs/r3_queue11.log 2>&1 &
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
LOGS = os.path.join(REPO, "logs")
PREV = os.path.join(LOGS, "r3_queue10.log")


def say(msg):
    print(f"[queue11] {msg} {time.strftime('%H:%M:%S')}", flush=True)


while True:
    with open(PREV) as fh:
        if "ALL DONE" in fh.read():
            break
    time.sleep(30)
say("queue10 finished; starting wave 8")

JOBS = [
    (os.path.join("benches", "r3_tree2_prof.py"), "r3_tree2_prof3.log"),
    ("_probe_treepm_chip.py", "r3_probe_treepm3.log"),
    (os.path.join("benches", "r3_prof8m.py"), "r3_prof8m2.log"),
    (os.path.join("benches", "r3_treepm.py"), "r3_treepm4.log"),
    (os.path.join("benches", "r3_largen.py"), "r3_largen3.log"),
    ("bench.py", "r3_bench3.log"),
]

for script, log in JOBS:
    say(f"start {script} -> logs/{log}")
    with open(os.path.join(LOGS, log), "w") as fh:
        rc = subprocess.call([sys.executable, os.path.join(REPO, script)],
                             cwd=REPO, stdout=fh, stderr=subprocess.STDOUT)
    say(f"done {script} rc={rc}")
say("ALL DONE")
