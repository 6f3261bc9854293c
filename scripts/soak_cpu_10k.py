"""CPU operational-envelope soak: the reference's EXACT step count and
cadence (10,000 GRU / 15,000 Conformer steps, eval-every-100,
checkpoint-every-500, best-CER selection, wandb-offline/JSONL) at
reduced model width, with a deliberate SIGTERM halfway and a resume to
completion — run by the same ``round5_chain.run_stage`` supervisor the
chip drives use. The Conformer family additionally exercises the AdamW
warmup-cosine schedule, label smoothing, SpecAugment and the InterCTC
tap (6 blocks keeps it live) over the full 15k horizon.

This exercises everything about full-duration operation that is not
chip-speed: 100 eval cycles over a long best-CER trajectory, periodic
``lastState`` cadence, metric-history growth, host-memory stability
(peak RSS is logged), the graceful-preemption checkpoint at scale, and
the invisibility of the resume seam in the metric history. The chip run
(``round5_chain.py`` stage 1) then only adds the full-width throughput
numbers.

Usage:  python scripts/soak_cpu_10k.py [--out runs/soak_cpu_10k]
"""

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from round5_chain import log, run_stage  # noqa: E402


GRU_OVERRIDES = [
    "--set", "nUnits=64", "--set", "nLayers=2",
    "--set", "batchSize=8", "--set", "nInputFeatures=32",
    "--set", "maxTimeSeriesLen=128", "--set", "dropout=0.0",
    "--set", "whiteNoiseSD=0.2", "--set", "constantOffsetSD=0.05",
    "--set", "lrStart=0.005", "--set", "lrEnd=0.005",
    "--set", "compute_dtype=float32",
]

# 6 blocks keeps the InterCTC tap (layer L/2, gated to L>=6) live over
# the full 15k horizon; masks sized to the tiny latent dim.
CONFORMER_OVERRIDES = [
    "--set", "frontend_dim=48", "--set", "latent_dim=48",
    "--set", "autoencoder_hidden_dim=32",
    "--set", "transformer_num_layers=6", "--set", "transformer_n_heads=4",
    "--set", "transformer_dim_ff=96", "--set", "transformer_dropout=0.1",
    "--set", "batchSize=8", "--set", "nInputFeatures=32",
    "--set", "maxTimeSeriesLen=128",
    "--set", "spec_augment_freq_mask=16", "--set", "spec_augment_time_mask=8",
    "--set", "whiteNoiseSD=0.2", "--set", "constantOffsetSD=0.05",
    "--set", "warmup_steps=1000",
    "--set", "compute_dtype=float32",
]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--family", default="gru", choices=("gru", "conformer"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--kill-at", type=int, default=None)
    a = ap.parse_args()
    conformer = a.family == "conformer"
    # reference durations: 10k GRU / 15k Conformer steps
    a.steps = a.steps or (15000 if conformer else 10000)
    a.kill_at = a.kill_at if a.kill_at is not None else a.steps // 2
    a.out = a.out or f"runs/soak_cpu_{a.family}"

    ds_path = a.out + ".dataset.pkl"
    if not os.path.exists(ds_path):
        from neural_speech_decoder_tpu.data.synthetic import (
            synthetic_dataset,
        )

        ds = synthetic_dataset(
            seed=5, n_days=4, trials_per_day=32, n_channels=32,
            min_t=60, max_t=100, min_u=4, max_u=8, signal_scale=3.0,
        )
        os.makedirs(os.path.dirname(ds_path) or ".", exist_ok=True)
        with open(ds_path, "wb") as f:
            pickle.dump(ds, f, protocol=4)

    t0 = time.time()
    script = ("scripts/train_conformer.py" if conformer
              else "scripts/train_gru.py")
    overrides = CONFORMER_OVERRIDES if conformer else GRU_OVERRIDES
    ok = run_stage(
        f"soak_cpu_{a.family}",
        [sys.executable, script,
         "--outputDir", a.out, "--datasetPath", ds_path,
         "--nBatch", str(a.steps), "--platform", "cpu"] + overrides,
        progress=os.path.join(a.out, "metrics.jsonl"),
        stdout_path=a.out + ".stdout.log",
        done_marker="Training completed!",
        kill_at_step=a.kill_at, stall_seconds=600.0, poll_s=5.0,
        need_tunnel=False,
    )
    wall = time.time() - t0
    if not ok:
        log("soak: FAILED")
        return 1

    # ---- post-run envelope checks ---------------------------------------
    evals, steps = [], []
    with open(os.path.join(a.out, "metrics.jsonl")) as f:
        for ln in f:
            rec = json.loads(ln)
            # per-step training records only: a resumed process re-logs
            # its param-count banner at step 0, and the final summary
            # has step null — neither is part of the training history
            if "train/loss" in rec:
                steps.append(rec["step"])
            if "eval/cer" in rec:
                evals.append((rec["step"], rec["eval/cer"],
                              rec.get("eval/best_cer")))
    n_expected = a.steps // 100
    # resume seam invisible: every step 0..N-1 exactly once, in order
    seam_ok = steps == list(range(a.steps))
    best_curve = [b for _, _, b in evals if b is not None]
    best_monotone = all(x >= y for x, y in zip(best_curve, best_curve[1:]))
    summary = {
        "metric": f"soak_cpu_{a.family}",
        "steps": a.steps,
        "kill_at": a.kill_at,
        "wall_minutes": round(wall / 60, 1),
        "eval_cycles": len(evals),
        "eval_cycles_expected": n_expected,
        "first_cer": evals[0][1] if evals else None,
        "final_cer": evals[-1][1] if evals else None,
        "best_cer": min(e[1] for e in evals) if evals else None,
        "metric_history_monotone": seam_ok,
        "best_cer_curve_monotone": best_monotone,
    }
    print(json.dumps(summary), flush=True)
    log(f"soak summary: {json.dumps(summary)}")
    ok = (len(evals) >= n_expected - 1 and seam_ok and best_monotone
          and summary["best_cer"] < summary["first_cer"])
    log(f"soak: {'PASS' if ok else 'ENVELOPE-CHECK-FAILED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
