"""Stall watchdog: run a TPU job, restart it when its log goes quiet.

The axon relay this box reaches its TPU through has two documented failure
modes (CLAUDE.md "Environment quirks"): sporadic multi-minute stalls of a
single execution, and multi-hour outages where even a tiny jitted matmul
hangs at device enumeration.  Long-running jobs (certification sweeps, BaB
refinement passes, attack evaluations) must therefore be supervised: this
tool spawns the job with stdout/stderr appended to a log file, restarts it
whenever the log stops growing for --quiet-seconds (the job is presumed
wedged on a dead relay call), and before every (re)start blocks until a
tiny-matmul probe confirms the relay is actually serving — so restarts
wait out an outage instead of burning the retry budget against it.

Only useful for jobs that are resumable (stream-resume sweeps/refinement)
or cheap to redo (bench, a single attack batch).  Pair --quiet-seconds
with the job's own print cadence: a BaB pass prints once per image, so
quiet-seconds must exceed its --image-seconds cap with compile slack.

Usage:
  python tools/stall_watchdog.py --log LOG [--quiet-seconds 900]
      [--max-restarts 8] [--probe-timeout 75] [--no-probe] -- CMD ARG...

Exits with the job's return code once it finishes on its own; exits 3
when the restart budget is exhausted.
"""
from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "print(float(jax.jit(lambda a:(a@a).sum())(jnp.ones((256,256)))))"
)


def relay_ok(timeout: float) -> bool:
    try:
        subprocess.run([sys.executable, "-c", PROBE_SRC], check=True,
                       timeout=timeout, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


def wait_for_relay(timeout: float, log) -> None:
    while not relay_ok(timeout):
        print(f"[watchdog] relay probe failed; retrying in 100s",
              file=log, flush=True)
        time.sleep(100)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True)
    ap.add_argument("--quiet-seconds", type=float, default=900.0,
                    help="restart the job when its log has not grown for "
                    "this long (must exceed the job's longest legitimate "
                    "silent stretch, e.g. a BaB per-image time cap)")
    ap.add_argument("--max-restarts", type=int, default=8)
    ap.add_argument("--probe-timeout", type=float, default=75.0)
    ap.add_argument("--no-probe", action="store_true",
                    help="skip the relay health probe before (re)starts "
                    "(for CPU jobs)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- CMD ARG... (the job)")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (use -- CMD ARG...)")

    with open(args.log, "a", buffering=1) as log:
        for attempt in range(args.max_restarts + 1):
            if not args.no_probe:
                wait_for_relay(args.probe_timeout, log)
            print(f"[watchdog] start attempt {attempt + 1}: "
                  f"{' '.join(cmd)}", file=log, flush=True)
            child = subprocess.Popen(cmd, stdout=log, stderr=log,
                                     start_new_session=True)
            poll = max(1.0, min(30.0, args.quiet_seconds / 3))
            while True:
                try:
                    rc = child.wait(timeout=poll)
                    if rc == 0:
                        print("[watchdog] job finished", file=log,
                              flush=True)
                        return 0
                    print(f"[watchdog] job exited rc={rc}; restarting",
                          file=log, flush=True)
                    break
                except subprocess.TimeoutExpired:
                    pass
                quiet = time.time() - os.path.getmtime(args.log)
                if quiet > args.quiet_seconds:
                    print(f"\n[watchdog] log quiet {quiet:.0f}s > "
                          f"{args.quiet_seconds:.0f}s; killing job",
                          file=log, flush=True)
                    try:
                        os.killpg(child.pid, signal.SIGKILL)
                    except ProcessLookupError:
                        pass
                    child.wait()
                    break
        print("[watchdog] restart budget exhausted", file=log, flush=True)
        return 3


if __name__ == "__main__":
    sys.exit(main())
