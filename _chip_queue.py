"""Chip job queue: wait for the axon tunnel to recover, then run the
pending round-3 benches sequentially (each in its own process so a
runtime fault in one can't poison the next).

Run detached: nohup python _chip_queue.py > logs/r3_queue4.log 2>&1 &
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
LOGS = os.path.join(REPO, "logs")
WAIT_PID = 30937  # the hung probe from the wedged-tunnel era


def say(msg):
    print(f"[queue4] {msg} {time.strftime('%H:%M:%S')}", flush=True)


def pid_alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


# 1. never start a second TPU client while the old probe still hangs
while pid_alive(WAIT_PID):
    say(f"old probe {WAIT_PID} still attached; sleeping 60s")
    time.sleep(60)

# 2. probe until the tunnel answers (fresh process each attempt)
while True:
    say("probing tunnel")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "_tunnel_probe.py")],
        capture_output=True, text=True, timeout=None,
    )
    if r.returncode == 0 and "sum:" in r.stdout:
        say("tunnel OK: " + r.stdout.strip().splitlines()[-1])
        break
    say(f"probe failed rc={r.returncode}; sleeping 120s")
    time.sleep(120)

JOBS = [
    ("benches/r3_leaf_sweep.py", "r3_leaf_sweep3.log"),
    ("benches/r3_largen.py", "r3_largen2.log"),
    ("benches/r3_tree2_prof.py", "r3_tree2_prof2.log"),
    ("bench.py", "r3_bench.log"),  # headline record in case the tunnel
                                   # is down again at round end
]
for script, logname in JOBS:
    say(f"start {script} -> logs/{logname}")
    with open(os.path.join(LOGS, logname), "w") as f:
        r = subprocess.run([sys.executable, os.path.join(REPO, script)],
                           stdout=f, stderr=subprocess.STDOUT, cwd=REPO)
    say(f"done {script} rc={r.returncode}")
say("ALL DONE")
