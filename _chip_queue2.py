"""Second chip job wave: wait for _chip_queue.py (queue4) to finish its
jobs, then run the benches added since it started.

Run detached: nohup python _chip_queue2.py > logs/r3_queue5.log 2>&1 &
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
LOGS = os.path.join(REPO, "logs")
Q4 = os.path.join(LOGS, "r3_queue4.log")


def say(msg):
    print(f"[queue5] {msg} {time.strftime('%H:%M:%S')}", flush=True)


# Wait until the first queue is done (its log ends with ALL DONE) so two
# processes never share the TPU tunnel.
while True:
    try:
        with open(Q4) as f:
            if "ALL DONE" in f.read():
                break
    except OSError:
        pass
    time.sleep(120)
say("queue4 finished; starting wave 2")

JOBS = [
    ("benches/r3_multirate.py", "r3_multirate.log"),
]
for script, logname in JOBS:
    say(f"start {script} -> logs/{logname}")
    with open(os.path.join(LOGS, logname), "w") as f:
        r = subprocess.run([sys.executable, os.path.join(REPO, script)],
                           stdout=f, stderr=subprocess.STDOUT, cwd=REPO)
    say(f"done {script} rc={r.returncode}")
say("ALL DONE")
