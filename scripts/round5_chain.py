"""Unattended round-5 operational-envelope chain (VERDICT r4 #1/#2).

Runs the full-duration chip sequence back-to-back as soon as the device
answers, stall-resilient per stage (same SIGKILL-probe-resume policy as
``run_with_watchdog.py``), so a multi-hour tunnel outage costs only the
outage, not the operator's attention:

  1. GRU reference recipe, 10,000 steps (``scripts/train_model.py:18``)
     with a deliberate SIGTERM around step 5,000 and a resume to
     completion — proves the graceful elastic path at scale;
  2. short GRU training on the competition-scale demo corpus;
  3. one-command competition pipeline at the reference operating point
     (>=1k utterances, 60k lexicon, 5-gram ARPA, OPT-6.7B int8,
     nbest=100) — ``eval_competition.py:84-148`` equivalent;
  4. Conformer reference recipe, 15,000 steps
     (``scripts/train_conformer.py:8``).

A global ``--deadline-epoch`` SIGTERMs the active stage (graceful
checkpoint-and-exit), so the chip is free for the driver's end-of-round
bench; completed stages are recorded in ``runs/round5_chain.log``.

Usage:
  python scripts/round5_chain.py --deadline-epoch EPOCH [--stages 1,2,3,4]
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_with_watchdog import wait_for_tunnel  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "runs", "round5_chain.log")


def log(msg: str) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def last_step(metrics_path: str) -> int:
    try:
        with open(metrics_path, "rb") as f:
            f.seek(max(-4096, -os.path.getsize(metrics_path)), 2)
            lines = f.read().decode(errors="replace").strip().splitlines()
        for ln in reversed(lines):
            try:
                return int(json.loads(ln).get("step", -1))
            except (json.JSONDecodeError, TypeError, ValueError):
                continue
    except OSError:
        pass
    return -1


def run_stage(name, cmd, *, progress, stdout_path, done_marker=None,
              kill_at_step=None, resume_flag="--resume",
              stall_seconds=900.0, max_restarts=12, deadline=None,
              poll_s=20.0, need_tunnel=True):
    """Run ``cmd`` to completion with stall-kill + resume. Returns True on
    success, False on give-up/deadline."""
    restarts, resumed, killed_once = 0, False, False
    peak_rss_kb = 0

    def sample_rss(pid: int) -> None:
        nonlocal peak_rss_kb
        try:
            with open(f"/proc/{pid}/status") as f:
                for ln in f:
                    if ln.startswith("VmRSS:"):
                        peak_rss_kb = max(peak_rss_kb, int(ln.split()[1]))
                        return
        except (OSError, ValueError, IndexError):
            pass

    def done() -> bool:
        if done_marker is None:
            return False
        try:
            with open(stdout_path) as f:
                return done_marker in f.read()
        except OSError:
            return False

    while True:
        if done():
            log(f"{name}: already complete")
            return True
        if deadline and time.time() > deadline:
            log(f"{name}: deadline before launch; stopping chain stage")
            return False
        if need_tunnel:
            wait_for_tunnel()
            # the tunnel wait is unbounded — re-check the deadline after
            if deadline and time.time() > deadline:
                log(f"{name}: deadline passed during tunnel wait")
                return False
        full = cmd + ([resume_flag] if resumed and resume_flag else [])
        log(f"{name}: launch {' '.join(full)}")
        env = dict(os.environ, PYTHONUNBUFFERED="1")
        with open(stdout_path, "a") as out:
            proc = subprocess.Popen(full, start_new_session=True, env=env,
                                    stdout=out, stderr=subprocess.STDOUT)
        launched = time.time()
        rc = None
        while rc is None:
            try:
                rc = proc.wait(timeout=poll_s)
                break
            except subprocess.TimeoutExpired:
                pass
            sample_rss(proc.pid)
            now = time.time()
            if deadline and now > deadline:
                log(f"{name}: deadline — SIGTERM {proc.pid} (graceful "
                    f"checkpoint), 180s grace")
                proc.send_signal(signal.SIGTERM)
                try:
                    proc.wait(timeout=180)
                except subprocess.TimeoutExpired:
                    os.killpg(proc.pid, signal.SIGKILL)
                    proc.wait()
                log(f"{name}: stopped at deadline")
                return False
            if (kill_at_step is not None and not killed_once
                    and last_step(progress) >= kill_at_step):
                log(f"{name}: step {last_step(progress)} >= "
                    f"{kill_at_step} — deliberate SIGTERM (elastic-path "
                    f"proof)")
                proc.send_signal(signal.SIGTERM)
                killed_once = True
                continue
            try:
                prog_m = os.path.getmtime(progress)
            except OSError:
                prog_m = launched
            if now - max(prog_m, launched) > stall_seconds:
                log(f"{name}: stalled {now - max(prog_m, launched):.0f}s "
                    f"— SIGKILL pg {proc.pid}")
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                rc = proc.wait()
                break
        if done() or (done_marker is None and rc == 0):
            log(f"{name}: DONE (rc={rc}, peak host RSS "
                f"{peak_rss_kb / 1024:.0f} MB)")
            return True
        restarts += 1
        resumed = True
        if restarts > max_restarts:
            log(f"{name}: giving up after {restarts} restarts")
            return False
        log(f"{name}: rc={rc}, not done — restart {restarts}"
            + (" (resume)" if resume_flag else ""))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--deadline-epoch", type=float, default=None,
                    help="unix time after which the chain checkpoints "
                         "the active stage and exits (frees the chip)")
    ap.add_argument("--stages", default="1,2,3,4,5,6,7")
    ap.add_argument("--dataset", default="runs/refscale.pkl")
    ap.add_argument("--demo", default="runs/comp_demo")
    a = ap.parse_args()
    stages = {int(s) for s in a.stages.split(",")}
    dl = a.deadline_epoch
    py = sys.executable
    os.makedirs(os.path.join(REPO, "runs"), exist_ok=True)
    if 1 in stages:
        run_stage(
            "gru10k",
            [py, "scripts/train_gru.py", "--outputDir", "runs/gru10k",
             "--datasetPath", a.dataset, "--device-resident-data"],
            progress="runs/gru10k/metrics.jsonl",
            stdout_path="runs/gru10k.stdout.log",
            done_marker="Training completed!",
            kill_at_step=5000, deadline=dl,
        )
    if 2 in stages:
        run_stage(
            "comp_model",
            [py, "scripts/train_gru.py", "--outputDir", "runs/comp_model",
             "--datasetPath", os.path.join(a.demo, "dataset.pkl"),
             "--nBatch", "600", "--device-resident-data",
             "--set", "evalEvery=200"],
            progress="runs/comp_model/metrics.jsonl",
            stdout_path="runs/comp_model.stdout.log",
            done_marker="Training completed!", deadline=dl,
        )
    if 3 in stages:
        run_stage(
            "comp_eval",
            [py, "-m",
             "neural_speech_decoder_tpu.decoding.eval_competition",
             "--modelPath", "runs/comp_model",
             "--datasetPath", os.path.join(a.demo, "dataset.pkl"),
             "--partition", "competition",
             "--lexicon", os.path.join(a.demo, "lexicon.txt"),
             "--lm", os.path.join(a.demo, "lm_5gram.arpa"),
             "--llmPath", os.path.join(a.demo, "opt_6.7b_bigram"),
             "--llmDtype", "int8", "--nbest", "100"],
            progress="runs/comp_eval.stdout.log",
            stdout_path="runs/comp_eval.stdout.log",
            resume_flag=None, stall_seconds=2400.0, max_restarts=3,
            deadline=dl,
        )
    if 4 in stages:
        run_stage(
            "conformer15k",
            [py, "scripts/train_conformer.py", "--outputDir",
             "runs/conformer15k", "--datasetPath", a.dataset,
             "--device-resident-data"],
            progress="runs/conformer15k/metrics.jsonl",
            stdout_path="runs/conformer15k.stdout.log",
            done_marker="Training completed!", deadline=dl,
        )
    if 5 in stages:
        run_stage(
            "conv_module_ab",
            [py, "scripts/exp_conv_module_fullstep_ab.py"],
            progress="runs/conv_module_ab.stdout.log",
            stdout_path="runs/conv_module_ab.stdout.log",
            done_marker="conformer_fullstep_conv_module_ab",
            resume_flag=None, stall_seconds=1200.0, max_restarts=3,
            deadline=dl,
        )
    if 6 in stages:
        run_stage(
            "b128_deficit",
            [py, "scripts/exp_b128_deficit.py"],
            progress="runs/b128_deficit.stdout.log",
            stdout_path="runs/b128_deficit.stdout.log",
            done_marker="gru_b128_deficit_attribution",
            resume_flag=None, stall_seconds=1200.0, max_restarts=3,
            deadline=dl,
        )
    if 7 in stages:
        run_stage(
            "bench_final",
            [py, "bench.py"],
            progress="runs/bench_final.stdout.log",
            stdout_path="runs/bench_final.stdout.log",
            done_marker="vs_baseline",
            resume_flag=None, stall_seconds=1800.0, max_restarts=3,
            deadline=dl,
        )
    log("chain finished")
    return 0


if __name__ == "__main__":
    sys.exit(main())
