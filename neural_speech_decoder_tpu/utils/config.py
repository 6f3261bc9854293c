"""Config handling: YAML files + hydra-style dotted CLI overrides.

The reference exposes two config front ends (SURVEY.md §5): hydra YAML
(``conf/config.yaml``) and plain dict scripts. Hydra is not a dependency
here; this module covers the same surface with plain YAML plus
``key=value`` overrides (typed by YAML parsing), so
``python -m neural_speech_decoder_tpu.training.cli --config cfg.yaml
lrStart=0.01 nBatch=500`` works like a hydra command line.
"""

from __future__ import annotations

from typing import Any, Sequence

import yaml


def load_yaml_config(path: str) -> dict[str, Any]:
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    if not isinstance(cfg, dict):
        raise ValueError(f"config root must be a mapping: {path}")
    return cfg


def apply_overrides(cfg: dict[str, Any], overrides: Sequence[str]) -> dict:
    """Apply ``a.b.c=value`` overrides in place; values YAML-parsed."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov!r}")
        key, _, raw = ov.partition("=")
        value = yaml.safe_load(raw) if raw != "" else None
        if isinstance(value, str):
            # YAML 1.1 parses "1e-3" as a string; accept scientific notation.
            try:
                value = int(value)
            except ValueError:
                try:
                    value = float(value)
                except ValueError:
                    pass
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"cannot override through non-dict at {p}")
        node[parts[-1]] = value
    return cfg
