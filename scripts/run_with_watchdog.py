"""Stall-resilient runner for long chip jobs through a flaky transport.

The axon tunnel's worst failure mode is a HANG: an in-flight request never
returns, the client blocks forever (no exception), and a training process
wedges mid-step or mid-checkpoint (observed live in the round-5 10k-step
drive: a best-checkpoint d2h froze at step 3300 during a tunnel outage;
SIGTERM's graceful path could not run because the process was stuck inside
the blocked transfer). On real TPU VMs the same pattern appears as
maintenance-event freezes.

This driver makes such runs unattended-safe:
  * launch the command; watch a progress file (metrics.jsonl) mtime;
  * on a stall > --stall-seconds, SIGKILL the process group (graceful
    signals can't help a process stuck in a dead RPC);
  * probe the device from a KILLABLE subprocess (an in-process probe
    would hang the watchdog the same way) until compute answers;
  * relaunch with the resume flag appended; repeat until clean exit.

Usage:
  python scripts/run_with_watchdog.py --progress-file RUN/metrics.jsonl \
      [--stall-seconds 900] [--resume-flag --resume] -- CMD ARGS...
"""

import argparse
import os
import signal
import subprocess
import sys
import time

PROBE = ("import jax, jax.numpy as jnp; "
         "print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))")


def tunnel_ok(timeout: float = 90.0) -> bool:
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE], capture_output=True,
            text=True, timeout=timeout,
        )
        return out.returncode == 0 and "64.0" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def wait_for_tunnel(poll_s: float = 120.0) -> None:
    n = 0
    while not tunnel_ok():
        n += 1
        print(f"[watchdog] device probe {n} failed; retry in {poll_s:.0f}s",
              flush=True)
        time.sleep(poll_s)
    if n:
        print(f"[watchdog] device back after {n} failed probes", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--progress-file", required=True)
    ap.add_argument("--stall-seconds", type=float, default=900.0)
    ap.add_argument("--resume-flag", default="--resume")
    ap.add_argument("--max-restarts", type=int, default=20)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to run")
    a = ap.parse_args()
    cmd = a.cmd[1:] if a.cmd and a.cmd[0] == "--" else a.cmd
    assert cmd, "no command given"

    restarts = 0
    resumed = False
    while True:
        wait_for_tunnel()
        run_cmd = cmd + ([a.resume_flag] if resumed and a.resume_flag
                         else [])
        print(f"[watchdog] launching: {' '.join(run_cmd)}", flush=True)
        proc = subprocess.Popen(run_cmd, start_new_session=True)
        launched = time.time()  # a fresh child starts with a stale
        # progress file (compile + eval before the first metric write) —
        # count the stall from whichever is newer
        while True:
            try:
                rc = proc.wait(timeout=60)
                break
            except subprocess.TimeoutExpired:
                pass
            try:
                last = max(os.path.getmtime(a.progress_file), launched)
            except OSError:
                last = launched
            age = time.time() - last
            if age > a.stall_seconds:
                print(f"[watchdog] no progress for {age:.0f}s — killing "
                      f"process group {proc.pid}", flush=True)
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                rc = proc.wait()
                break
        if rc == 0:
            print("[watchdog] command completed cleanly", flush=True)
            return 0
        restarts += 1
        resumed = True
        print(f"[watchdog] exit rc={rc}; restart {restarts}", flush=True)
        if restarts >= a.max_restarts:
            print("[watchdog] giving up", flush=True)
            return 1


if __name__ == "__main__":
    sys.exit(main())
