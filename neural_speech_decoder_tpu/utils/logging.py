"""Metric logging with the reference's wandb metric-name contract.

The reference logs per-step ``train/*``, per-eval ``eval/*`` and final
``summary/*`` metrics to Weights & Biases (``neural_decoder_trainer.py:
71-76,263-277,343-357,373-378``). Here wandb is optional: when installed and
enabled we log to it with identical names; otherwise metrics stream to a
JSONL file under the output dir (the system of record for offline runs) —
same names, same steps.
"""

from __future__ import annotations

import json
import os
from typing import Any


class MetricLogger:
    def __init__(
        self,
        output_dir: str,
        *,
        project: str = "neural-speech-decoder",
        run_name: str | None = None,
        config: dict | None = None,
        mode: str = "offline",
    ):
        self.output_dir = output_dir
        self._wandb = None
        self._jsonl = None
        # Multi-process runs: only the primary writes (every process would
        # otherwise clobber the same metrics.jsonl / wandb run).
        try:
            import jax

            if jax.process_count() > 1 and jax.process_index() != 0:
                mode = "disabled"
        except Exception:
            pass
        if mode != "disabled":
            if mode == "online":
                try:
                    import wandb

                    wandb.init(
                        project=project,
                        name=run_name or os.path.basename(output_dir),
                        config=config,
                        mode=mode,
                    )
                    self._wandb = wandb
                except Exception:
                    self._wandb = None
            if self._wandb is None:
                os.makedirs(output_dir, exist_ok=True)
                self._jsonl = open(
                    os.path.join(output_dir, "metrics.jsonl"), "a", buffering=1
                )

    def log(self, metrics: dict[str, Any], step: int | None = None) -> None:
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if self._jsonl is not None:
            rec = {"step": step}
            rec.update({k: _to_py(v) for k, v in metrics.items()})
            self._jsonl.write(json.dumps(rec) + "\n")

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        if self._jsonl is not None:
            self._jsonl.close()


def _to_py(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)
