"""Hyperparameter sweep driver (task parallelism).

The reference fans sweeps out as SLURM job arrays via hydra-submitit with
``array_parallelism: 50`` (``conf/hydra/launcher/gpu_slurm_med_time.yaml:14``)
and declares the optuna sweeper as a dependency (``setup.cfg:46``). This
driver provides the same capability cluster-agnostically:

  * grid or random search over parameter spaces,
  * bounded concurrency (the ``array_parallelism`` semantic) via worker
    processes — one trial per process so each gets its own JAX runtime
    (device OOM/compile state cannot leak across trials),
  * per-trial output dirs + a sweep summary ranked by best CER,
  * optional Optuna TPE search when optuna is installed (gated).
"""

from __future__ import annotations

import itertools
import json
import multiprocessing as mp
import os
import traceback
import warnings
from dataclasses import dataclass
from typing import Any, Callable, Sequence

import numpy as np


@dataclass
class Trial:
    trial_id: int
    overrides: dict[str, Any]
    output_dir: str
    best_cer: float = float("inf")
    status: str = "pending"
    error: str | None = None
    chips: str | None = None  # TPU chip subset the trial ran on (if pinned)


def grid_space(space: dict[str, Sequence[Any]]) -> list[dict[str, Any]]:
    keys = list(space)
    return [
        dict(zip(keys, combo))
        for combo in itertools.product(*(space[k] for k in keys))
    ]


def random_space(
    space: dict[str, Callable[[np.random.Generator], Any]],
    n_trials: int,
    seed: int = 0,
) -> list[dict[str, Any]]:
    rng = np.random.default_rng(seed)
    return [{k: fn(rng) for k, fn in space.items()} for _ in range(n_trials)]


def slice_env(slot: int, chips_per_trial: int) -> dict[str, str]:
    """Env vars pinning a worker process to its own TPU chip subset.

    The real analog of the reference's ``array_parallelism: 50`` across a
    GPU cluster: on a TPU host/pod slice, concurrent trials must not share
    chips. Each worker slot sees ``chips_per_trial`` consecutive chips via
    the libtpu visibility env (must be set before jax/libtpu initializes —
    hence the pool initializer, one slot per worker process).
    """
    first = slot * chips_per_trial
    chips = ",".join(str(first + i) for i in range(chips_per_trial))
    return {
        "TPU_VISIBLE_DEVICES": chips,
        "TPU_PROCESS_BOUNDS": "1,1,1",
        "TPU_CHIPS_PER_PROCESS_BOUNDS": f"{chips_per_trial},1,1",
        # each trial is an independent single-process JAX runtime
        "JAX_PROCESS_COUNT": "1",
    }


_WORKER_BASE_ARGS: dict | None = None


def _worker_init(base_args: dict, slot_queue, chips_per_trial: int) -> None:
    """Pool initializer: receive base_args ONCE per worker (they may embed
    an in-memory dataset — pickling them per trial would ship a multi-GB
    payload for every trial) and claim a chip-slot when pinning is on."""
    global _WORKER_BASE_ARGS
    _WORKER_BASE_ARGS = base_args
    if slot_queue is not None:
        slot = slot_queue.get()
        os.environ.update(slice_env(slot, chips_per_trial))


def _run_trial(base_args: dict, trial: Trial) -> Trial:
    trial.chips = os.environ.get("TPU_VISIBLE_DEVICES")
    try:
        from ..training.trainer import train_model

        args = dict(base_args)
        args.update(trial.overrides)
        args["outputDir"] = trial.output_dir
        summary = train_model(args)
        trial.best_cer = float(summary.get("summary/best_cer", float("inf")))
        # A SIGTERM/SIGUSR1-preempted trial checkpointed cleanly and can be
        # resumed — record it distinctly, not as a failure.
        trial.status = (
            "preempted" if "summary/preempted_at" in summary else "done"
        )
    except Exception:
        trial.status = "failed"
        trial.error = traceback.format_exc()
    return trial


def _worker(trial):
    return _run_trial(_WORKER_BASE_ARGS, trial)


def run_sweep(
    base_args: dict,
    override_list: list[dict[str, Any]],
    sweep_dir: str,
    *,
    array_parallelism: int = 1,
    use_processes: bool = True,
    chips_per_trial: int | None = None,
    total_chips: int | None = None,
    subdir_names: Sequence[str] | None = None,
) -> list[Trial]:
    """Run every override set; returns trials sorted by best CER.

    ``chips_per_trial`` (with ``total_chips``) gives each concurrent trial
    its own TPU chip subset — concurrency is then bounded by
    ``total_chips // chips_per_trial`` as well as ``array_parallelism``.
    ``subdir_names`` overrides the default ``trial_NNNN`` per-trial dir
    names (the CLI multirun passes hydra-style override dirnames).
    """
    os.makedirs(sweep_dir, exist_ok=True)
    if subdir_names is not None and len(subdir_names) != len(override_list):
        raise ValueError("subdir_names must match override_list length")
    trials = [
        Trial(
            i,
            ov,
            os.path.join(
                sweep_dir,
                subdir_names[i] if subdir_names else f"trial_{i:04d}",
            ),
        )
        for i, ov in enumerate(override_list)
    ]
    if len({t.output_dir for t in trials}) != len(trials):
        raise ValueError("per-trial output dirs collide")
    slot_queue = None
    if chips_per_trial:
        n_slots = max((total_chips or chips_per_trial) // chips_per_trial, 1)
        array_parallelism = min(array_parallelism, n_slots)
        ctx0 = mp.get_context("spawn")
        slot_queue = ctx0.Manager().Queue()
        for s in range(array_parallelism):
            slot_queue.put(s)
    if use_processes and array_parallelism > 1:
        ctx = mp.get_context("spawn")  # fresh JAX runtime per trial
        with ctx.Pool(
            processes=array_parallelism, initializer=_worker_init,
            initargs=(base_args, slot_queue, chips_per_trial or 0),
        ) as pool:
            results = pool.map(_worker, trials)
    else:
        if chips_per_trial:
            os.environ.update(slice_env(0, chips_per_trial))
        results = [_run_trial(base_args, t) for t in trials]
    results.sort(key=lambda t: t.best_cer)
    with open(os.path.join(sweep_dir, "sweep_summary.json"), "w") as f:
        json.dump(
            [
                {
                    "trial_id": t.trial_id,
                    "overrides": t.overrides,
                    "outputDir": t.output_dir,
                    "best_cer": t.best_cer,
                    "status": t.status,
                    "error": t.error,
                    "chips": t.chips,
                }
                for t in results
            ],
            f,
            indent=2,
            default=str,
        )
    return results


def run_optuna_sweep(
    base_args: dict,
    suggest: Callable[["optuna.Trial"], dict[str, Any]],  # noqa: F821
    sweep_dir: str,
    *,
    n_trials: int = 20,
    direction: str = "minimize",
):
    """Optuna-driven search (parity with the reference's
    hydra-optuna-sweeper dependency, ``setup.cfg:46``). Uses the real
    optuna (TPE) when installed; otherwise falls back to the vendored
    API-compatible random-search shim (``_optuna_shim``) so the path is
    runnable and tested in dependency-free environments. The ``suggest``
    callback receives an optuna(-compatible) Trial and returns the
    override dict for ``train_model``."""
    try:
        import optuna
    except ImportError:
        from . import _optuna_shim as optuna

        # The shim samples uniformly at random (no TPE) — make the
        # quality downgrade visible so search conclusions aren't
        # mistaken for TPE results.
        warnings.warn(
            "optuna not installed: run_optuna_sweep is using the vendored "
            "random-search shim (uniform sampling, no TPE).",
            stacklevel=2,
        )

    def objective(trial):
        overrides = suggest(trial)
        t = Trial(
            trial.number, overrides,
            os.path.join(sweep_dir, f"trial_{trial.number:04d}"),
        )
        t = _run_trial(base_args, t)
        if t.status == "failed":
            raise optuna.TrialPruned()
        return t.best_cer

    study = optuna.create_study(direction=direction)
    study.optimize(objective, n_trials=n_trials)
    return study
