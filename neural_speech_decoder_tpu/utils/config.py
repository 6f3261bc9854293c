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

import re

import yaml


def load_yaml_config(path: str) -> dict[str, Any]:
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    if not isinstance(cfg, dict):
        raise ValueError(f"config root must be a mapping: {path}")
    return cfg


_SCI_NOTATION = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+")


def apply_overrides(cfg: dict[str, Any], overrides: Sequence[str]) -> dict:
    """Apply ``a.b.c=value`` overrides in place; values YAML-parsed."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov!r}")
        key, _, raw = ov.partition("=")
        value = yaml.safe_load(raw) if raw != "" else None
        if isinstance(value, str) and _SCI_NOTATION.fullmatch(value):
            # YAML 1.1 parses "1e-3" as a string; coerce ONLY scientific
            # notation (a bare int()/float() fallback would also convert
            # intended strings like "1_5" or "1E5" tags).
            value = float(value)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            nxt = node.setdefault(p, {})
            if nxt is None:  # empty YAML section ("model:") parses to None
                nxt = node[p] = {}
            if not isinstance(nxt, dict):
                raise ValueError(f"cannot override through non-dict at {p}")
            node = nxt
        node[parts[-1]] = value
    return cfg
