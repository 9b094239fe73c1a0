"""Seventh chip job wave (round-3 session 3): TreePM small-N accuracy
probe (vs exact, pallas-vs-xla on hardware), the TreePM bench re-run on
the new ~2-cells-per-spacing auto grid (the grid=128 numbers in
logs/r3_treepm2.log predate the auto-grid retarget in fa2f8c6), and the
4M/8M step-phase decomposition for the remaining superlinearity.

Run detached: nohup python _chip_queue7.py > logs/r3_queue10.log 2>&1 &
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
LOGS = os.path.join(REPO, "logs")

JOBS = [
    ("_probe_treepm_chip.py", "r3_probe_treepm2.log"),
    (os.path.join("benches", "r3_treepm.py"), "r3_treepm3.log"),
    (os.path.join("benches", "r3_prof8m.py"), "r3_prof8m.log"),
]


def say(msg):
    print(f"[queue10] {msg} {time.strftime('%H:%M:%S')}", flush=True)


for script, log in JOBS:
    say(f"start {script} -> logs/{log}")
    with open(os.path.join(LOGS, log), "w") as fh:
        rc = subprocess.call([sys.executable, os.path.join(REPO, script)],
                             cwd=REPO, stdout=fh, stderr=subprocess.STDOUT)
    say(f"done {script} rc={rc}")
say("ALL DONE")
