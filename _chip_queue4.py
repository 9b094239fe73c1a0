"""Fourth chip job wave: wait for _chip_queue3.py (queue6) to finish,
then drive the TreePM solver + the library verify surface on the chip.

Run detached: nohup python _chip_queue4.py > logs/r3_queue7.log 2>&1 &
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
LOGS = os.path.join(REPO, "logs")
PREV = os.path.join(LOGS, "r3_queue6.log")


def say(msg):
    print(f"[queue7] {msg} {time.strftime('%H:%M:%S')}", flush=True)


while True:
    try:
        with open(PREV) as f:
            if "ALL DONE" in f.read():
                break
    except OSError:
        pass
    time.sleep(120)
say("queue6 finished; starting wave 4")

JOBS = [
    ("benches/r3_treepm.py", "r3_treepm.log"),
    ("_verify_lib.py", "r3_verify_lib.log"),
]
for script, logname in JOBS:
    say(f"start {script} -> logs/{logname}")
    with open(os.path.join(LOGS, logname), "w") as f:
        r = subprocess.run([sys.executable, os.path.join(REPO, script)],
                           stdout=f, stderr=subprocess.STDOUT, cwd=REPO)
    say(f"done {script} rc={r.returncode}")
say("ALL DONE")
