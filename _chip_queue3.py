"""Third chip job wave: wait for _chip_queue2.py (queue5) to finish,
then run the benches added since it started.

Run detached: nohup python _chip_queue3.py > logs/r3_queue6.log 2>&1 &
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
LOGS = os.path.join(REPO, "logs")
PREV = os.path.join(LOGS, "r3_queue5.log")


def say(msg):
    print(f"[queue6] {msg} {time.strftime('%H:%M:%S')}", flush=True)


while True:
    try:
        with open(PREV) as f:
            if "ALL DONE" in f.read():
                break
    except OSError:
        pass
    time.sleep(120)
say("queue5 finished; starting wave 3")

JOBS = [
    ("benches/r3_pm.py", "r3_pm.log"),
]
for script, logname in JOBS:
    say(f"start {script} -> logs/{logname}")
    with open(os.path.join(LOGS, logname), "w") as f:
        r = subprocess.run([sys.executable, os.path.join(REPO, script)],
                           stdout=f, stderr=subprocess.STDOUT, cwd=REPO)
    say(f"done {script} rc={r.returncode}")
say("ALL DONE")
