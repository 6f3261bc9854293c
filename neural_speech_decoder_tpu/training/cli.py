"""Training CLI: YAML config + dotted overrides -> train_model.

Equivalent of the reference hydra entry point
(``python -m neural_decoder.neural_decoder_trainer`` with
``conf/config.yaml`` — ``neural_decoder_trainer.py:413-419``), without the
hydra dependency:

    python -m neural_speech_decoder_tpu.training.cli \\
        --config neural_speech_decoder_tpu/configs/gru_baseline.yaml \\
        outputDir=/tmp/run datasetPath=/data/ptDecoder_ctc lrStart=0.01

Multirun (hydra ``--multirun`` choice sweeps, ``conf/config.yaml:1-12``):
``-m``/``--multirun`` expands comma-swept override values into the
cartesian product of jobs; each job runs under
``${outputDir}/${override_dirname}`` (overrides sorted by key, joined
with ``,``, excluding outputDir/datasetPath — the reference's
``hydra.sweep.subdir`` + ``exclude_keys`` exactly). ``--jobs N`` runs up
to N jobs concurrently in spawned worker processes (the
``array_parallelism`` semantic; each job gets a fresh JAX runtime):

    nsd-train --config cfg.yaml -m lrStart=0.01,0.02 nUnits=512,1024 \\
        outputDir=/tmp/sweep --jobs 2
"""

from __future__ import annotations

import argparse
import copy

from ..utils.config import (
    apply_overrides,
    expand_multirun,
    load_yaml_config,
    override_dirname,
)


def main(argv: list[str] | None = None) -> dict:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True, help="YAML config path")
    parser.add_argument(
        "-m",
        "--multirun",
        action="store_true",
        help="expand comma-swept overrides into a job per combination "
        "(hydra --multirun), each under outputDir/<override_dirname>",
    )
    parser.add_argument(
        "--jobs",
        type=int,
        default=1,
        help="multirun concurrency (worker processes; array_parallelism)",
    )
    parser.add_argument(
        "overrides", nargs="*", help="key=value overrides (YAML-typed)"
    )
    args = parser.parse_args(argv)
    base_cfg = load_yaml_config(args.config)
    job_overrides = expand_multirun(args.overrides)
    if not args.multirun:
        if len(job_overrides) > 1:
            raise SystemExit(
                "comma-swept override values need -m/--multirun "
                f"(would launch {len(job_overrides)} jobs)"
            )
        cfg = apply_overrides(base_cfg, args.overrides)
        if "outputDir" not in cfg:
            raise SystemExit("outputDir must be set (config or override)")
        from .trainer import train_model

        return train_model(cfg)
    return _multirun(base_cfg, job_overrides, jobs=args.jobs)


def _multirun(
    base_cfg: dict, job_overrides: list[list[str]], *, jobs: int = 1
) -> dict:
    """Run every override combination under the hydra sweep layout:
    ``sweep.dir = ${outputDir}``, ``subdir = ${override_dirname}``.
    Returns a summary dict (sweep dir, per-job dirs, best CER)."""
    from ..parallel.sweep import run_sweep

    job_cfgs, names = [], []
    for i, ov_list in enumerate(job_overrides):
        cfg = apply_overrides(copy.deepcopy(base_cfg), ov_list)
        cfg.pop("outputDir", None)  # run_sweep assigns the per-trial dir
        job_cfgs.append(cfg)
        # Hydra leaves override_dirname empty when every override is
        # excluded; distinct jobs still need distinct dirs.
        names.append(override_dirname(ov_list) or f"job_{i}")
    # sweep.dir = ${outputDir}: resolved from the config plus any
    # outputDir= override (identical across jobs by construction — an
    # outputDir sweep would nest runs inside each other).
    probe = apply_overrides(copy.deepcopy(base_cfg), job_overrides[0])
    sweep_dir = probe.get("outputDir")
    if not sweep_dir:
        raise SystemExit("outputDir must be set (config or override)")
    trials = run_sweep(
        {},
        job_cfgs,
        str(sweep_dir),
        array_parallelism=jobs,
        use_processes=jobs > 1,
        subdir_names=names,
    )
    failed = [t for t in trials if t.status == "failed"]
    for t in failed:
        print(f"job {t.output_dir} failed:\n{t.error}")
    if len(failed) == len(trials):
        # Mirror the single-run path, which propagates the exception: a
        # sweep with zero surviving jobs must not exit 0 (drivers gate on
        # the process status).
        raise SystemExit(f"all {len(trials)} multirun jobs failed")
    best = trials[0]
    return {
        "sweep_dir": str(sweep_dir),
        "jobs": {t.output_dir: t.status for t in trials},
        "best_dir": best.output_dir,
        "summary/best_cer": best.best_cer,
        "n_failed": len(failed),
    }


if __name__ == "__main__":
    main()
