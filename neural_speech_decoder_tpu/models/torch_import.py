"""Import reference PyTorch checkpoints into framework parameter pytrees.

Migration path for users of the reference codebase: load a torch
``state_dict`` (the reference's ``modelWeights`` file, ``neural_decoder_
trainer.py:355``) and convert it to this framework's parameter layout.
fp32 logit parity of the converted models is pinned by
``tests/test_gru_parity.py`` / ``tests/test_conformer_parity.py``.

Only numpy arrays cross this boundary — pass ``{k: v.numpy() for k, v in
state_dict.items()}`` (torch itself is not required here).

Weight-layout conventions converted:
  * torch Linear / GRU weights are ``[out, in]``; ours are ``[in, out]``;
  * GRU gate order r,z,n is shared; per-direction tensors stack on a
    leading axis (``_reverse`` suffixes);
  * the GRU's dead ``inpLayer{i}`` parameters (``model.py:66-73``, never
    used in forward) are ignored;
  * day bias ``[nDays, 1, D]`` squeezes to ``[nDays, D]``.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from .conformer import ConformerConfig
from .gru import GRUConfig


def import_gru_state_dict(
    sd: Mapping[str, np.ndarray], cfg: GRUConfig
) -> dict:
    """Reference ``GRUDecoder`` state dict -> ``init_gru_params`` pytree."""
    d = cfg.num_dirs
    layers = []
    for li in range(cfg.num_layers):
        sfx = [f"l{li}", f"l{li}_reverse"][:d]
        layers.append(
            {
                "w_ih": jnp.stack(
                    [jnp.asarray(np.asarray(sd[f"gru_decoder.weight_ih_{s}"]).T)
                     for s in sfx]
                ),
                "w_hh": jnp.stack(
                    [jnp.asarray(np.asarray(sd[f"gru_decoder.weight_hh_{s}"]).T)
                     for s in sfx]
                ),
                "b_ih": jnp.stack(
                    [jnp.asarray(sd[f"gru_decoder.bias_ih_{s}"]) for s in sfx]
                ),
                "b_hh": jnp.stack(
                    [jnp.asarray(sd[f"gru_decoder.bias_hh_{s}"]) for s in sfx]
                ),
            }
        )
    return {
        "day": {
            "weight": jnp.asarray(sd["dayWeights"]),
            "bias": jnp.asarray(np.asarray(sd["dayBias"])[:, 0, :]),
        },
        "gru": {"layers": layers},
        "fc": {
            "weight": jnp.asarray(np.asarray(sd["fc_decoder_out.weight"]).T),
            "bias": jnp.asarray(sd["fc_decoder_out.bias"]),
        },
    }


def _lin(sd, prefix):
    return {
        "w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T),
        "b": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _ln(sd, prefix):
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def import_conformer_state_dict(
    sd: Mapping[str, np.ndarray], cfg: ConformerConfig
) -> dict:
    """Reference ``NeuralTransformerCTCModel`` state dict -> pytree."""
    blocks = []
    for i in range(cfg.num_layers):
        p = f"conformer_layers.{i}"
        blocks.append(
            {
                "ff1": {
                    "ln": _ln(sd, f"{p}.ff1.0"),
                    "lin1": _lin(sd, f"{p}.ff1.1"),
                    "lin2": _lin(sd, f"{p}.ff1.4"),
                },
                "attn": {
                    "ln": _ln(sd, f"{p}.ln_attn"),
                    "in_proj_w": jnp.asarray(
                        np.asarray(sd[f"{p}.attn.in_proj_weight"]).T
                    ),
                    "in_proj_b": jnp.asarray(sd[f"{p}.attn.in_proj_bias"]),
                    "out": _lin(sd, f"{p}.attn.out_proj"),
                },
                "conv": {
                    "ln": _ln(sd, f"{p}.conv_module.ln"),
                    "pw1": _lin(sd, f"{p}.conv_module.pw_conv1"),
                    "dw_w": jnp.asarray(
                        np.asarray(sd[f"{p}.conv_module.dw_conv.weight"])[:, 0, :].T
                    ),
                    "dw_b": jnp.asarray(sd[f"{p}.conv_module.dw_conv.bias"]),
                    "ln_conv": _ln(sd, f"{p}.conv_module.ln_conv"),
                    "pw2": _lin(sd, f"{p}.conv_module.pw_conv2"),
                },
                "ff2": {
                    "ln": _ln(sd, f"{p}.ff2.0"),
                    "lin1": _lin(sd, f"{p}.ff2.1"),
                    "lin2": _lin(sd, f"{p}.ff2.4"),
                },
                "ln_final": _ln(sd, f"{p}.ln_final"),
            }
        )
    params = {
        "day": {
            "weight": jnp.asarray(sd["day_linear.day_weights"]),
            "bias": jnp.asarray(np.asarray(sd["day_linear.day_bias"])[:, 0, :]),
        },
        "frontend": {
            "tconv_w": jnp.asarray(
                np.asarray(sd["frontend.temporal_conv.weight"])[:, 0, :].T
            ),
            "proj": _lin(sd, "frontend.proj"),
            "ln": _ln(sd, "frontend.ln"),
        },
        "bottleneck": {
            "lin1": _lin(sd, "encoder.net.0"),
            "lin2": _lin(sd, "encoder.net.2"),
        },
        "blocks": blocks,
        "head": {
            "lin1": _lin(sd, "output.0"),
            "ln": _ln(sd, "output.1"),
            "lin2": _lin(sd, "output.4"),
        },
    }
    if cfg.use_interctc:
        params["inter_out"] = _lin(sd, "inter_output")
    return params
