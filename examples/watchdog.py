"""Run a command under a log-staleness watchdog, restarting on wedges.

The TPU relay on this host occasionally wedges a client mid-call: the
process stays alive but blocks forever in a device call (observed in the
round-3 300-epoch run at epoch 90, and again in the round-4 s16
extension at step 800 — zero CPU accrual, no log output).  Crash-only
drivers handle exits; this wrapper adds the missing half: if the child's
log file stops growing for ``--stall`` seconds, kill it and start a new
attempt.  The wrapped command must therefore be resumable (e.g.
examples/distill_s16_extend.py snapshots every 100 steps).

Usage:
    python examples/watchdog.py --log /tmp/run.log --stall 900 \
        [--max-attempts 12] -- python examples/distill_s16_extend.py

Exits with the child's return code once it exits 0, or 1 when attempts
are exhausted.  Same pattern as examples/at_size_128_run.py's
phase_diffusion watchdog (ref for the failure mode:
artifacts/at_size_128/resume_log.txt), generalized to any command.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def log_mtime(path: str) -> float:
    try:
        return os.path.getmtime(path)
    except OSError:
        return 0.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True,
                    help="file the child's output is appended to; its "
                         "mtime is the liveness signal")
    ap.add_argument("--stall", type=int, default=900,
                    help="seconds without log growth before the child "
                         "is killed")
    ap.add_argument("--max-attempts", type=int, default=12)
    ap.add_argument("--poll", type=int, default=30)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to run")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (use -- cmd ...)")

    for attempt in range(1, args.max_attempts + 1):
        with open(args.log, "ab") as lf:
            lf.write(f"[watchdog] attempt {attempt}: "
                     f"{' '.join(cmd)}\n".encode())
            lf.flush()
            child = subprocess.Popen(cmd, stdout=lf, stderr=lf)
        last = time.time()
        last_m = log_mtime(args.log)
        while child.poll() is None:
            time.sleep(args.poll)
            m = log_mtime(args.log)
            if m > last_m:
                last_m, last = m, time.time()
            elif time.time() - last > args.stall:
                with open(args.log, "ab") as lf:
                    lf.write(f"[watchdog] STALL: no output in "
                             f"{args.stall}s - killing\n".encode())
                child.kill()
                child.wait()
                break
        rc = child.returncode
        with open(args.log, "ab") as lf:
            lf.write(f"[watchdog] child exited rc={rc}\n".encode())
        if rc == 0:
            return 0
        time.sleep(10)
    print(f"[watchdog] giving up after {args.max_attempts} attempts",
          file=sys.stderr)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
