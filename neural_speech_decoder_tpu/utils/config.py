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

import itertools
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


def expand_multirun(overrides: Sequence[str]) -> list[list[str]]:
    """Hydra-multirun expansion: a comma in an override value sweeps it.

    ``["lrStart=0.01,0.02", "nUnits=512"]`` expands to the cartesian
    product ``[["lrStart=0.01", "nUnits=512"], ["lrStart=0.02",
    "nUnits=512"]]`` — the semantics of ``hydra --multirun`` choice
    sweeps (the reference's sweep front end,
    ``conf/config.yaml:1-12``). Bracketed YAML lists (``key=[1,2]``)
    and quoted values are single values, not sweeps; ``range(...)``
    sweeps are not supported (use an explicit choice list).
    """
    per_key: list[list[str]] = []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov!r}")
        key, _, raw = ov.partition("=")
        stripped = raw.strip()
        if (
            "," in raw
            and not stripped.startswith(("[", "{", "'", '"'))
        ):
            choices = [c.strip() for c in raw.split(",")]
            if any(c == "" for c in choices):
                raise ValueError(f"empty choice in sweep override: {ov!r}")
            per_key.append([f"{key}={c}" for c in choices])
        else:
            per_key.append([ov])
    return [list(combo) for combo in itertools.product(*per_key)]


def override_dirname(
    overrides: Sequence[str],
    exclude_keys: Sequence[str] = ("outputDir", "datasetPath"),
    sep: str = ",",
) -> str:
    """Hydra's ``${hydra.job.override_dirname}``: the CLI overrides as
    ``key=value`` pairs, sorted by key and joined with ``sep``, minus
    ``exclude_keys`` — the reference's per-job sweep subdir naming
    (``conf/config.yaml:4-12``, which excludes exactly outputDir and
    datasetPath). Values are kept verbatim, as hydra does."""
    pairs = []
    for ov in overrides:
        key, _, _ = ov.partition("=")
        if key not in exclude_keys:
            pairs.append(ov)
    return sep.join(sorted(pairs))
