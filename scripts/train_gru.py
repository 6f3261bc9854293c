"""Canonical GRU baseline training run (reference scripts/train_model.py).

    python scripts/train_gru.py --outputDir LOGDIR --datasetPath PICKLE
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--outputDir", required=True)
    p.add_argument("--datasetPath", required=True)
    p.add_argument("--nBatch", type=int, default=10000)
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--platform", default=None, choices=("cpu", "axon", "tpu"),
        help="pin the jax platform (the site hook's JAX_PLATFORMS=axon "
             "wins over env vars, so CPU runs need this flag)",
    )
    p.add_argument(
        "--device-resident-data", action="store_true",
        help="stage the packed dataset in device HBM once and assemble "
             "batches on-device (data/device_data.py) — removes the "
             "per-step host->device batch copy",
    )
    p.add_argument(
        "--set", action="append", default=[], metavar="K=V",
        help="override any trainer args entry (repeatable; values parsed "
             "as int/float/bool when possible)",
    )
    cli = p.parse_args()

    if cli.platform:
        import jax

        jax.config.update("jax_platforms", cli.platform)
    from neural_speech_decoder_tpu.training.trainer import train_model

    # Reference baseline hyperparameters (scripts/train_model.py:4-31).
    args = {
        "outputDir": cli.outputDir,
        "datasetPath": cli.datasetPath,
        "wandb_project": "neural-speech-decoder",
        "wandb_run_name": os.path.basename(cli.outputDir),
        "wandb_mode": "offline",
        "seqLen": 150,
        "maxTimeSeriesLen": 1200,
        "batchSize": 64,
        "lrStart": 0.02,
        "lrEnd": 0.02,
        "nUnits": 1024,
        "nBatch": cli.nBatch,
        "nLayers": 5,
        "seed": 0,
        "nClasses": 40,
        "nInputFeatures": 256,
        "dropout": 0.4,
        "whiteNoiseSD": 0.8,
        "constantOffsetSD": 0.2,
        "gaussianSmoothWidth": 2.0,
        "strideLen": 4,
        "kernelLen": 32,
        "bidirectional": True,
        "l2_decay": 1e-5,
        # TPU-native additions
        "compute_dtype": "bfloat16",
        "checkpointEvery": 500,
        "resume": cli.resume,
        "deviceResidentData": cli.device_resident_data,
    }
    for kv in cli.set:
        k, v = kv.split("=", 1)
        args[k] = _parse(v)
    train_model(args)


def _parse(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    return v


if __name__ == "__main__":
    main()
