"""Preemption-safe training: a SIGUSR1/SIGTERM mid-run checkpoints and
exits cleanly, and ``resume: true`` continues from the exact step.

The reference's SLURM wrapper requests a USR1 warning 120 s before kill
(``eval_competition.sh:13``) but nothing catches it — an interrupted run
restarts from scratch. TPU VMs send SIGTERM on maintenance/preemption
events; the trainer converts either signal into a clean
checkpoint-and-exit at the next step boundary.
"""

import os
import signal
import threading
import time

import numpy as np
import pytest

from neural_speech_decoder_tpu.data.synthetic import synthetic_dataset
from neural_speech_decoder_tpu.training.checkpoints import CheckpointManager
from neural_speech_decoder_tpu.training.trainer import train_model


def _args(out, dataset, n_batch):
    return {
        "outputDir": out,
        "dataset": dataset,
        "batchSize": 4,
        "lrStart": 0.005,
        "lrEnd": 0.005,
        "l2_decay": 0.0,
        "nBatch": n_batch,
        "evalEvery": 10_000_000,  # only the step-0 eval runs in this test
        "whiteNoiseSD": 0.0,
        "constantOffsetSD": 0.0,
        "gaussianSmoothWidth": 2.0,
        "nUnits": 16,
        "nLayers": 1,
        "nInputFeatures": 8,
        "nClasses": 40,
        "dropout": 0.0,
        "strideLen": 2,
        "kernelLen": 4,
        "bidirectional": False,
        "seed": 0,
        "wandb_mode": "disabled",
        "time_multiple": 16,
    }


@pytest.mark.parametrize("sig", [signal.SIGUSR1, signal.SIGTERM])
def test_signal_checkpoints_and_resumes(tmp_path, sig, capsys):
    ds = synthetic_dataset(
        seed=3, n_days=1, trials_per_day=8, n_channels=8,
        min_t=24, max_t=40, min_u=2, max_u=4,
    )
    out = str(tmp_path / "run")

    # fire the preemption signal once real steps are running: the trainer
    # installs its handlers before any artifact is written, and
    # ``trainingStats`` appears at the step-0 eval, so the file guarantees
    # both that the signal will be caught and that steps are under way
    stop_poll = threading.Event()

    def _fire_when_started():
        while not stop_poll.is_set():
            if os.path.exists(os.path.join(out, "trainingStats")):
                time.sleep(0.5)
                os.kill(os.getpid(), sig)
                return
            time.sleep(0.05)

    poller = threading.Thread(target=_fire_when_started, daemon=True)
    poller.start()
    try:
        summary = train_model(_args(out, ds, n_batch=500_000))
    finally:
        stop_poll.set()

    stop_step = summary.get("summary/preempted_at")
    assert stop_step is not None and 0 < stop_step < 500_000
    # the preempted summary must stay rankable by sweep drivers
    # (parallel/sweep.py sorts on this key; ADVICE r2, medium)
    assert np.isfinite(summary["summary/best_cer"])
    ckpt = CheckpointManager(out)
    assert ckpt.exists("lastState")
    side = ckpt.load_sidecar()
    assert side["step"] == stop_step

    # the trainer's handler must have been restored on return
    handler = signal.getsignal(sig)
    assert (
        getattr(handler, "__qualname__", "")
        != "train_model.<locals>._request_stop"
    )

    # resume finishes the (shortened) run from exactly the saved step
    args2 = _args(out, ds, n_batch=stop_step + 5)
    args2["resume"] = True
    summary2 = train_model(args2)
    captured = capsys.readouterr().out
    assert f"Resumed from step {stop_step}" in captured
    assert "summary/final_cer" in summary2
    assert CheckpointManager(out).load_sidecar()["step"] == stop_step + 5


def test_preempt_signals_can_be_disabled(tmp_path):
    """preempt_signals: false leaves the process's handlers untouched."""
    ds = synthetic_dataset(
        seed=3, n_days=1, trials_per_day=8, n_channels=8,
        min_t=24, max_t=40, min_u=2, max_u=4,
    )
    seen = []
    prev = signal.signal(signal.SIGUSR1, lambda s, f: seen.append(s))
    try:
        args = _args(str(tmp_path / "run2"), ds, n_batch=3)
        args["preempt_signals"] = False
        train_model(args)
        os.kill(os.getpid(), signal.SIGUSR1)
        assert seen == [signal.SIGUSR1]
    finally:
        signal.signal(signal.SIGUSR1, prev)
