"""Canonical Conformer training run (reference scripts/train_conformer.py).

    python scripts/train_conformer.py --outputDir LOGDIR --datasetPath PICKLE
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--outputDir", required=True)
    p.add_argument("--datasetPath", required=True)
    p.add_argument("--nBatch", type=int, default=15000)
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

    # Reference Conformer hyperparameters (scripts/train_conformer.py:4-58).
    args = {
        "outputDir": cli.outputDir,
        "datasetPath": cli.datasetPath,
        "batchSize": 64,
        "nBatch": cli.nBatch,
        "seed": 0,
        "wandb_project": "neural-speech-decoder",
        "wandb_run_name": os.path.basename(cli.outputDir),
        "wandb_mode": "offline",
        "model_type": "transformer_ctc",
        "nInputFeatures": 256,
        "nClasses": 40,
        "temporal_kernel": 32,
        "temporal_stride": 4,
        "gaussian_smooth_width": 2.0,
        "whiteNoiseSD": 0.8,
        "constantOffsetSD": 0.2,
        "frontend_dim": 1024,
        "latent_dim": 1024,
        "autoencoder_hidden_dim": 512,
        "transformer_num_layers": 8,
        "transformer_n_heads": 8,
        "transformer_dim_ff": 2048,
        "transformer_dropout": 0.3,
        "conformer_conv_kernel": 31,
        "drop_path_prob": 0.1,
        "optimizer": "adamw",
        "lrStart": 0.0004,
        "lrEnd": 0.0001,
        "weight_decay": 1e-3,
        "warmup_steps": 1000,
        "label_smoothing": 0.1,
        "use_spec_augment": True,
        "spec_augment_freq_mask": 100,
        "spec_augment_time_mask": 40,
        "interctc_weight": 0.3,
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
