"""chip_queue watchdog: a hung job is detected, killed, and skipped
(round-4 verdict #5 — r4w17's deposit probe hung 3.2 h and taxed the
whole queue behind it). Pure-subprocess tests, no device work."""
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUEUE = os.path.join(REPO, "tools", "chip_queue.py")


def _run_queue(tmp_path, scripts, extra_args):
    env = dict(os.environ, SPACETPU_QUEUE_LOGS=str(tmp_path))
    out = subprocess.run(
        [sys.executable, QUEUE, "--tag", "t", "--no-tunnel-check",
         *extra_args, *scripts],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=120)
    return out


def test_watchdog_kills_silent_job_and_continues(tmp_path):
    hung = tmp_path / "hung_job.py"
    hung.write_text(textwrap.dedent("""\
        import time
        print("starting", flush=True)
        time.sleep(600)  # silent forever: the r4w17 shape
    """))
    ok = tmp_path / "ok_job.py"
    ok.write_text('print("fine")\n')
    out = _run_queue(tmp_path, [str(hung), str(ok)],
                     ["--watchdog", "8", "--poll", "0.5"])
    assert out.returncode == 0
    assert "WATCHDOG killed" in out.stdout
    # the follow-on job still ran and passed
    assert "rc=0" in out.stdout
    assert "ALL DONE" in out.stdout
    assert "FAILED jobs" in out.stdout  # the hung one is recorded


def test_healthy_jobs_untouched_by_watchdog(tmp_path):
    slow = tmp_path / "slow_but_chatty.py"
    slow.write_text(textwrap.dedent("""\
        import time
        for i in range(6):
            print("tick", i, flush=True)
            time.sleep(0.5)
    """))
    out = _run_queue(tmp_path, [str(slow)],
                     ["--watchdog", "8", "--poll", "0.5"])
    assert out.returncode == 0
    assert "WATCHDOG" not in out.stdout
    assert "rc=0" in out.stdout


def test_watchdog_disabled_with_zero(tmp_path):
    quick = tmp_path / "quick.py"
    quick.write_text('print("hi")\n')
    out = _run_queue(tmp_path, [str(quick)], ["--watchdog", "0"])
    assert out.returncode == 0
    assert "rc=0" in out.stdout
