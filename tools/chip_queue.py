"""Sequential chip job queue: one parameterized runner for TPU benches.

Replaces the numbered `_chip_queue*.py` one-shot runners (round-3 weak #9
— the copy-paste pattern is how a whole authored wave silently never
launched). One queue = one process = one chip user at a time.

Usage (run detached — NEVER timeout-kill a TPU-attached queue from
outside; the queue supervises its own children):

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

Watchdog (round-4 verdict #5 — r4w17's deposit probe hung for 3.2 h and
taxed everything behind it): a job whose log is silent for
--watchdog seconds (default 2400 — TreePM calibration at 1M legitimately
prints nothing for ~25 min, and a post-wedge compile has been measured
at 557 s, so the bar sits well above both) is SIGTERM'd (60 s grace,
then SIGKILL) and recorded as rc=WATCHDOG; the queue moves on. Between
jobs — and with patient backoff after any watchdog kill — a tiny
subprocess probe (import jax + one scalar readback, ~27 s healthy)
gates the next job so it never pays its first compile into a wedged
tunnel (r4w17's follow-on bench paid 557 s vs the normal 29 s).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGS = os.environ.get("SPACETPU_QUEUE_LOGS", os.path.join(REPO, "logs"))

WATCHDOG_RC = -1000  # sentinel: job killed for log silence

_PROBE = (
    "import time; t0=time.time(); import jax; import jax.numpy as jnp; "
    "d=jax.devices()[0]; v=float(jnp.arange(8.0).sum()); "
    "print(f'tunnel probe ok platform={d.platform} sum={v} "
    "t={time.time()-t0:.1f}s', flush=True)"
)


def say(tag: str, msg: str) -> None:
    print(f"[{tag}] {msg} {time.strftime('%H:%M:%S')}", flush=True)


def run_supervised(argv, log_path: str, watchdog_s: float,
                   poll_s: float) -> int:
    """Run argv with stdout/stderr appended to log_path; SIGTERM it if the
    log goes silent for watchdog_s. Returns the return code (WATCHDOG_RC
    on a watchdog kill)."""
    with open(log_path, "a") as fh:
        proc = subprocess.Popen(argv, cwd=REPO, stdout=fh,
                                stderr=subprocess.STDOUT)
    last_size = -1
    last_change = time.time()
    while True:
        rc = proc.poll()
        if rc is not None:
            return rc
        time.sleep(poll_s)
        try:
            size = os.path.getsize(log_path)
        except OSError:
            size = -1
        if size != last_size:
            last_size = size
            last_change = time.time()
        elif watchdog_s and time.time() - last_change > watchdog_s:
            proc.terminate()
            try:
                proc.wait(60)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
            return WATCHDOG_RC


def tunnel_gate(tag: str, *, probe_timeout_s: float, retries: int,
                backoff_s: float) -> bool:
    """Cheap health probe before a job: a subprocess runs one scalar
    readback; a healthy tunnel answers in ~27 s, a wedged one hangs or
    takes minutes. Backs off between attempts while wedged (the tunnel
    self-recovers; killing real work mid-compile is what wedges it, and
    this probe's op is trivially small/cached). Returns True when the
    probe passed, False when every retry timed out (the queue proceeds
    anyway, loudly)."""
    for attempt in range(1, retries + 1):
        log = os.path.join(LOGS, f"{tag}_tunnel_probe.log")
        t0 = time.time()
        rc = run_supervised([sys.executable, "-c", _PROBE], log,
                            watchdog_s=probe_timeout_s, poll_s=5.0)
        dt = time.time() - t0
        if rc == 0:
            if dt > 90.0:
                say(tag, f"tunnel probe SLOW ({dt:.0f}s) — proceeding")
            else:
                say(tag, f"tunnel probe ok ({dt:.0f}s)")
            return True
        say(tag, f"tunnel probe {'hung' if rc == WATCHDOG_RC else 'failed'} "
                 f"(rc={rc}, {dt:.0f}s), attempt {attempt}/{retries}; "
                 f"backing off {backoff_s:.0f}s")
        time.sleep(backoff_s)
    say(tag, "tunnel probe never passed — proceeding anyway (job may pay "
             "a wedged first compile)")
    return False


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("scripts", nargs="+",
                    help="python scripts to run sequentially (repo-relative)")
    ap.add_argument("--tag", required=True,
                    help="queue name; job logs are logs/<tag>_<stem>.log")
    ap.add_argument("--after", default=None,
                    help="poll this log for 'ALL DONE' before starting")
    ap.add_argument("--poll", type=float, default=30.0)
    ap.add_argument("--watchdog", type=float, default=2400.0,
                    help="kill a job whose log is silent this long "
                         "(seconds; 0 disables)")
    ap.add_argument("--no-tunnel-check", action="store_true",
                    help="skip the between-jobs tunnel health probe")
    # Patient probe: a wedged tunnel holds stale sessions for ~5-10 min
    # and KILLING a hung probe leaves another stale session behind — the
    # r5w2 feedback loop (3+ consecutive 305s probe kills). One attempt
    # that simply outwaits the expiry beats many short killed attempts;
    # a healthy probe still returns in ~25 s, so the long timeout is
    # free when nothing is wrong.
    ap.add_argument("--probe-timeout", type=float, default=600.0)
    ap.add_argument("--probe-retries", type=int, default=5)
    ap.add_argument("--probe-backoff", type=float, default=120.0)
    ap.add_argument("--settle", type=float, default=75.0,
                    help="wait this long after a job exits before probing:"
                         " the tunnel holds the old session briefly and a"
                         " too-eager probe just burns a timeout cycle")
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
    need_gate = not args.no_tunnel_check
    for i, script in enumerate(args.scripts):
        if need_gate:
            if i > 0 and args.settle > 0:
                say(args.tag, f"settling {args.settle:.0f}s before probe")
                time.sleep(args.settle)
            tunnel_gate(args.tag, probe_timeout_s=args.probe_timeout,
                        retries=args.probe_retries,
                        backoff_s=args.probe_backoff)
        stem = os.path.splitext(os.path.basename(script))[0].lstrip("_")
        log = os.path.join(LOGS, f"{args.tag}_{stem}.log")
        open(log, "w").close()  # truncate: run_supervised appends
        say(args.tag, f"start {script} -> {os.path.relpath(log, REPO)}")
        t0 = time.time()
        rc = run_supervised([sys.executable, os.path.join(REPO, script)],
                            log, watchdog_s=args.watchdog,
                            poll_s=min(args.poll, 30.0))
        if rc == WATCHDOG_RC:
            say(args.tag, f"WATCHDOG killed {script} after "
                          f"{time.time() - t0:.0f}s of log silence "
                          f">{args.watchdog:.0f}s")
        else:
            say(args.tag, f"done {script} rc={rc} ({time.time() - t0:.0f}s)")
        if rc != 0:
            failures.append(script)
    if failures:
        say(args.tag, f"FAILED jobs: {failures}")
    say(args.tag, "ALL DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
