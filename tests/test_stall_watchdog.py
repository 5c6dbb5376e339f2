"""tools/stall_watchdog.py: supervised-job semantics (CPU only, --no-probe).

The watchdog is the committed form of the relay-outage survival recipe
(CLAUDE.md): restart a TPU job when its log goes quiet.  These tests pin
the three exits — clean finish passes rc through, a quiet log triggers
kill+restart, and the restart budget bounds a crash-looping job.
"""
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
WD = REPO / "tools" / "stall_watchdog.py"


def run_wd(log, *wd_args, timeout=60):
    return subprocess.run(
        [sys.executable, str(WD), "--log", str(log), "--no-probe",
         *wd_args],
        capture_output=True, text=True, timeout=timeout,
    )


def test_clean_finish_returns_zero(tmp_path):
    log = tmp_path / "job.log"
    r = run_wd(log, "--", sys.executable, "-c", "print('done')")
    assert r.returncode == 0
    assert "done" in log.read_text()
    assert "[watchdog] job finished" in log.read_text()


def test_quiet_log_triggers_restart_until_budget(tmp_path):
    # the job prints once then hangs silently; with a 2s quiet threshold
    # the watchdog must kill it and, after the restart budget, give up
    log = tmp_path / "job.log"
    r = run_wd(
        log, "--quiet-seconds", "2", "--max-restarts", "1", "--",
        sys.executable, "-c", "import time; print('hi', flush=True); "
        "time.sleep(600)",
    )
    assert r.returncode == 3
    text = log.read_text()
    assert text.count("killing job") == 2  # initial try + 1 restart
    assert "restart budget exhausted" in text


def test_nonzero_exit_restarts_and_budget_bounds(tmp_path):
    log = tmp_path / "job.log"
    r = run_wd(
        log, "--quiet-seconds", "30", "--max-restarts", "2", "--",
        sys.executable, "-c", "import sys; sys.exit(7)",
    )
    assert r.returncode == 3
    assert log.read_text().count("exited rc=7") == 3  # 1 + 2 restarts
