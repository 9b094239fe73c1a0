"""Sequential chip job queue: one parameterized runner for TPU benches.

Replaces the numbered `_chip_queue*.py` one-shot runners (round-3 weak #9
— the copy-paste pattern is how a whole authored wave silently never
launched). One queue = one process = one chip user at a time.

Usage (run detached — NEVER timeout-kill a TPU-attached child):

  nohup python tools/chip_queue.py --tag r4_wave1 \
      benches/r3_tree2_prof.py benches/probe_treepm_chip.py bench.py \
      > logs/r4_wave1.log 2>&1 &

  # wait for a previous queue to finish first:
  nohup python tools/chip_queue.py --tag r4_wave2 --after logs/r4_wave1.log \
      benches/r3_largen.py > logs/r4_wave2.log 2>&1 &

Each job's output goes to logs/<tag>_<script-stem>.log; the queue's own
log records start/stop timestamps and return codes and ends with
"ALL DONE" (the token --after polls for). Jobs that fail do NOT abort the
queue — later jobs usually measure something unrelated, and chip time is
the scarce resource.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGS = os.path.join(REPO, "logs")


def say(tag: str, msg: str) -> None:
    print(f"[{tag}] {msg} {time.strftime('%H:%M:%S')}", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("scripts", nargs="+",
                    help="python scripts to run sequentially (repo-relative)")
    ap.add_argument("--tag", required=True,
                    help="queue name; job logs are logs/<tag>_<stem>.log")
    ap.add_argument("--after", default=None,
                    help="poll this log for 'ALL DONE' before starting")
    ap.add_argument("--poll", type=float, default=30.0)
    args = ap.parse_args()

    os.makedirs(LOGS, exist_ok=True)

    if args.after:
        say(args.tag, f"waiting on {args.after}")
        while True:
            try:
                with open(args.after) as fh:
                    if "ALL DONE" in fh.read():
                        break
            except FileNotFoundError:
                pass
            time.sleep(args.poll)
        say(args.tag, "dependency finished")

    failures = []
    for script in args.scripts:
        stem = os.path.splitext(os.path.basename(script))[0].lstrip("_")
        log = os.path.join(LOGS, f"{args.tag}_{stem}.log")
        say(args.tag, f"start {script} -> {os.path.relpath(log, REPO)}")
        t0 = time.time()
        with open(log, "w") as fh:
            rc = subprocess.call(
                [sys.executable, os.path.join(REPO, script)],
                cwd=REPO, stdout=fh, stderr=subprocess.STDOUT)
        say(args.tag, f"done {script} rc={rc} ({time.time() - t0:.0f}s)")
        if rc != 0:
            failures.append(script)
    if failures:
        say(args.tag, f"FAILED jobs: {failures}")
    say(args.tag, "ALL DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
