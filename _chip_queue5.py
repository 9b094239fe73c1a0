"""Fifth chip job wave: wait for _chip_queue4.py (queue7) to finish,
then validate the transposed pair-tile layout (correctness + 1M step +
the formerly-OOMing 8M adaptive config) and re-run the 8M scaling bench
against the fixed layout.

Run detached: nohup python _chip_queue5.py > logs/r3_queue8.log 2>&1 &
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
LOGS = os.path.join(REPO, "logs")
PREV = os.path.join(LOGS, "r3_queue7.log")


def say(msg):
    print(f"[queue8] {msg} {time.strftime('%H:%M:%S')}", flush=True)


while True:
    try:
        with open(PREV) as f:
            if "ALL DONE" in f.read():
                break
    except OSError:
        pass
    time.sleep(120)
say("queue7 finished; starting wave 5")

JOBS = [
    ("benches/r3_tlayout.py", "r3_tlayout.log"),
    # earlier waves crashed these on a missing sys.path insert /
    # fixed_cloud signature (both fixed); re-run them here
    ("benches/r3_treepm.py", "r3_treepm2.log"),
    ("benches/r3_pm.py", "r3_pm2.log"),
    ("benches/r3_multirate.py", "r3_multirate2.log"),
    ("bench.py", "r3_bench2.log"),  # headline re-check on the new layout
]
for script, logname in JOBS:
    say(f"start {script} -> logs/{logname}")
    with open(os.path.join(LOGS, logname), "w") as f:
        r = subprocess.run([sys.executable, os.path.join(REPO, script)],
                           stdout=f, stderr=subprocess.STDOUT, cwd=REPO)
    say(f"done {script} rc={r.returncode}")
say("ALL DONE")
