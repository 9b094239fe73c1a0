"""Sixth chip job wave: the Mosaic transpose probe (gates the
transposed pair-tile layout fix) — runs after wave 5 (queue8).

Run detached: nohup python _chip_queue6.py > logs/r3_queue9.log 2>&1 &
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
LOGS = os.path.join(REPO, "logs")
PREV = os.path.join(LOGS, "r3_queue8.log")


def say(msg):
    print(f"[queue9] {msg} {time.strftime('%H:%M:%S')}", flush=True)


while True:
    try:
        with open(PREV) as f:
            if "ALL DONE" in f.read():
                break
    except OSError:
        pass
    time.sleep(120)
say("queue8 finished; starting wave 6")

JOBS = [
    ("benches/r3_trans_probe.py", "r3_trans_probe.log"),
]
for script, logname in JOBS:
    say(f"start {script} -> logs/{logname}")
    with open(os.path.join(LOGS, logname), "w") as f:
        r = subprocess.run([sys.executable, os.path.join(REPO, script)],
                           stdout=f, stderr=subprocess.STDOUT, cwd=REPO)
    say(f"done {script} rc={r.returncode}")
say("ALL DONE")
