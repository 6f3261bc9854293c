"""Training CLI: YAML config + dotted overrides -> train_model.

Equivalent of the reference hydra entry point
(``python -m neural_decoder.neural_decoder_trainer`` with
``conf/config.yaml`` — ``neural_decoder_trainer.py:413-419``), without the
hydra dependency:

    python -m neural_speech_decoder_tpu.training.cli \\
        --config neural_speech_decoder_tpu/configs/gru_baseline.yaml \\
        outputDir=/tmp/run datasetPath=/data/ptDecoder_ctc lrStart=0.01
"""

from __future__ import annotations

import argparse

from ..utils.config import apply_overrides, load_yaml_config
from .trainer import train_model


def main(argv: list[str] | None = None) -> dict:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True, help="YAML config path")
    parser.add_argument(
        "overrides", nargs="*", help="key=value overrides (YAML-typed)"
    )
    args = parser.parse_args(argv)
    cfg = load_yaml_config(args.config)
    apply_overrides(cfg, args.overrides)
    if "outputDir" not in cfg:
        raise SystemExit("outputDir must be set (config or override)")
    return train_model(cfg)


if __name__ == "__main__":
    main()
