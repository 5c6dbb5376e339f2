"""Shared stall-resilient driver for the repo-root benchmarks.

The axon TPU relay sporadically stalls a client process for minutes
(CLAUDE.md).  Both benchmarks therefore run their measurement in a child
process with a timeout, retrying on a fresh TPU client, with the retries
spaced out so one bench invocation can bridge a multi-minute outage
window.  The child prints the single JSON line; the parent relays it
verbatim (the driver contract: exactly ONE JSON line on stdout).

Deterministic child failures are NOT retried: an argparse usage error
(rc=2) is passed through immediately, and a clean exit without a JSON
line (e.g. ``--help``) has its stdout forwarded verbatim.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

ATTEMPTS = 4
CHILD_TIMEOUT_S = 480
RETRY_SPACING_S = 90


def stall_resilient_main(bench_fn, name: str) -> None:
    """Run ``bench_fn`` in a supervised child process.

    ``bench_fn`` is the actual measurement (argparse included, if any);
    it must print one line starting with ``{`` on success.  The parent
    re-executes ``sys.argv`` with ``FIODE_BENCH_CHILD=1`` so the child
    takes the ``bench_fn`` branch directly.
    """
    if os.environ.get("FIODE_BENCH_CHILD"):
        return bench_fn()

    env = dict(os.environ, FIODE_BENCH_CHILD="1")
    for attempt in range(ATTEMPTS):
        if attempt:
            # Relay outages come in multi-minute windows; spacing the
            # retries bridges a window instead of burning every attempt
            # inside one.
            time.sleep(RETRY_SPACING_S)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(sys.argv[0]),
                 *sys.argv[1:]],
                env=env, capture_output=True, text=True,
                timeout=CHILD_TIMEOUT_S,
            )
        except subprocess.TimeoutExpired:
            print(f"[bench] attempt {attempt + 1} stalled; retrying",
                  file=sys.stderr, flush=True)
            continue
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode == 0 and lines:
            print(lines[-1])
            return
        if out.returncode == 0:
            # clean exit without a JSON line: --help or similar — forward
            sys.stdout.write(out.stdout)
            return
        if out.returncode == 2:
            # argparse usage error: deterministic, retrying cannot help
            sys.stderr.write(out.stderr)
            raise SystemExit(2)
        print(f"[bench] attempt {attempt + 1} failed rc={out.returncode}:\n"
              f"{out.stderr[-2000:]}", file=sys.stderr, flush=True)
    raise SystemExit(f"{name} failed after {ATTEMPTS} attempts")
