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


def _run_trial(base_args: dict, trial: Trial) -> Trial:
    try:
        from ..training.trainer import train_model

        args = dict(base_args)
        args.update(trial.overrides)
        args["outputDir"] = trial.output_dir
        summary = train_model(args)
        trial.best_cer = float(summary["summary/best_cer"])
        trial.status = "done"
    except Exception:
        trial.status = "failed"
        trial.error = traceback.format_exc()
    return trial


def _worker(payload):
    base_args, trial = payload
    return _run_trial(base_args, trial)


def run_sweep(
    base_args: dict,
    override_list: list[dict[str, Any]],
    sweep_dir: str,
    *,
    array_parallelism: int = 1,
    use_processes: bool = True,
) -> list[Trial]:
    """Run every override set; returns trials sorted by best CER."""
    os.makedirs(sweep_dir, exist_ok=True)
    trials = [
        Trial(i, ov, os.path.join(sweep_dir, f"trial_{i:04d}"))
        for i, ov in enumerate(override_list)
    ]
    payloads = [(base_args, t) for t in trials]
    if use_processes and array_parallelism > 1:
        ctx = mp.get_context("spawn")  # fresh JAX runtime per trial
        with ctx.Pool(processes=array_parallelism) as pool:
            results = pool.map(_worker, payloads)
    else:
        results = [_worker(p) for p in payloads]
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
):  # pragma: no cover - optuna not installed in this image
    """Optuna TPE search (parity with the reference's hydra-optuna-sweeper
    dependency). Gated: raises ImportError when optuna is unavailable."""
    import optuna

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
