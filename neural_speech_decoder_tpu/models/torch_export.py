"""Export framework parameter pytrees to reference PyTorch state dicts.

Inverse of ``torch_import`` — the round-trip OUT of this framework: a
model trained here can be saved as the reference's ``modelWeights``
state-dict layout and loaded by the reference's ``loadModel``
(``neural_decoder_trainer.py:390-410``) with ``strict=True``, enabling
independent verification of a converted model in the original stack.

Only numpy arrays cross this boundary — the returned dict maps the
reference's state-dict keys to numpy arrays; wrap with
``{k: torch.from_numpy(v) for ...}`` on the torch side.

Layout conventions are the exact inverses of ``torch_import``:
  * our ``[in, out]`` Linear/GRU weights transpose back to torch
    ``[out, in]``;
  * per-direction GRU tensors unstack into ``_reverse``-suffixed keys;
  * day bias ``[nDays, D]`` unsqueezes to ``[nDays, 1, D]``;
  * the reference's dead ``inpLayer{i}`` parameters (``model.py:66-73``,
    never used in forward, absent from our pytree) are synthesized as
    identity/zero so ``load_state_dict(strict=True)`` succeeds;
  * the ``gaussianSmoother.weight`` BUFFER is regenerated from the
    config's sigma/kernel-size (``augmentations.py:69`` registers it, so
    it appears in the reference state dict).

fp32 logit parity of exported models against the reference forward is
pinned by ``tests/test_torch_export.py``.
"""

from __future__ import annotations

import numpy as np

from ..ops.gaussian import gaussian_kernel
from .conformer import ConformerConfig
from .gru import GRUConfig


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def export_gru_state_dict(params: dict, cfg: GRUConfig) -> dict:
    """``init_gru_params`` pytree -> reference ``GRUDecoder`` state dict
    (numpy values; torch-loadable with ``strict=True``)."""
    c = cfg.neural_dim
    sd: dict[str, np.ndarray] = {
        "dayWeights": _np(params["day"]["weight"]),
        "dayBias": _np(params["day"]["bias"])[:, None, :],
        "fc_decoder_out.weight": _np(params["fc"]["weight"]).T,
        "fc_decoder_out.bias": _np(params["fc"]["bias"]),
    }
    # smoother buffer: [C, 1, k] taps, one copy per channel group
    taps = gaussian_kernel(
        cfg.gaussian_kernel_size, cfg.gaussian_smooth_width
    )
    sd["gaussianSmoother.weight"] = np.tile(
        np.asarray(taps, np.float32)[None, None, :], (c, 1, 1)
    )
    for li, lp in enumerate(params["gru"]["layers"]):
        for di, sfx in enumerate([f"l{li}", f"l{li}_reverse"][: cfg.num_dirs]):
            sd[f"gru_decoder.weight_ih_{sfx}"] = _np(lp["w_ih"][di]).T
            sd[f"gru_decoder.weight_hh_{sfx}"] = _np(lp["w_hh"][di]).T
            sd[f"gru_decoder.bias_ih_{sfx}"] = _np(lp["b_ih"][di])
            sd[f"gru_decoder.bias_hh_{sfx}"] = _np(lp["b_hh"][di])
    # dead per-day input layers (never used in the reference forward):
    # deterministic identity/zero keeps strict loading happy
    for day in range(cfg.n_days):
        sd[f"inpLayer{day}.weight"] = np.eye(c, dtype=np.float32)
        sd[f"inpLayer{day}.bias"] = np.zeros((c,), np.float32)
    return sd


def _exp_lin(sd: dict, prefix: str, p: dict) -> None:
    sd[f"{prefix}.weight"] = _np(p["w"]).T
    sd[f"{prefix}.bias"] = _np(p["b"])


def _exp_ln(sd: dict, prefix: str, p: dict) -> None:
    sd[f"{prefix}.weight"] = _np(p["scale"])
    sd[f"{prefix}.bias"] = _np(p["bias"])


def export_conformer_state_dict(params: dict, cfg: ConformerConfig) -> dict:
    """``init_conformer_params`` pytree -> reference
    ``NeuralTransformerCTCModel`` state dict (numpy values).

    Requires the canonical (non-TP-interleaved) qkv layout — export a
    checkpoint saved with ``n_model_devices>1`` via
    ``parallel.shardings.deinterleave_attention_params`` first if needed.
    """
    if cfg.qkv_interleaved:
        raise ValueError(
            "export requires the canonical qkv layout; de-interleave the "
            "attention params first (parallel/shardings.py)"
        )
    sd: dict[str, np.ndarray] = {
        "day_linear.day_weights": _np(params["day"]["weight"]),
        "day_linear.day_bias": _np(params["day"]["bias"])[:, None, :],
        # the reference's strided depthwise conv is bias-free
        # (transformer_ctc.py:82-88, bias=False)
        "frontend.temporal_conv.weight": _np(
            params["frontend"]["tconv_w"]
        ).T[:, None, :],
    }
    _exp_lin(sd, "frontend.proj", params["frontend"]["proj"])
    _exp_ln(sd, "frontend.ln", params["frontend"]["ln"])
    _exp_lin(sd, "encoder.net.0", params["bottleneck"]["lin1"])
    _exp_lin(sd, "encoder.net.2", params["bottleneck"]["lin2"])
    for i, bp in enumerate(params["blocks"]):
        p = f"conformer_layers.{i}"
        _exp_ln(sd, f"{p}.ff1.0", bp["ff1"]["ln"])
        _exp_lin(sd, f"{p}.ff1.1", bp["ff1"]["lin1"])
        _exp_lin(sd, f"{p}.ff1.4", bp["ff1"]["lin2"])
        _exp_ln(sd, f"{p}.ln_attn", bp["attn"]["ln"])
        sd[f"{p}.attn.in_proj_weight"] = _np(bp["attn"]["in_proj_w"]).T
        sd[f"{p}.attn.in_proj_bias"] = _np(bp["attn"]["in_proj_b"])
        _exp_lin(sd, f"{p}.attn.out_proj", bp["attn"]["out"])
        _exp_ln(sd, f"{p}.conv_module.ln", bp["conv"]["ln"])
        _exp_lin(sd, f"{p}.conv_module.pw_conv1", bp["conv"]["pw1"])
        sd[f"{p}.conv_module.dw_conv.weight"] = _np(
            bp["conv"]["dw_w"]
        ).T[:, None, :]
        sd[f"{p}.conv_module.dw_conv.bias"] = _np(bp["conv"]["dw_b"])
        _exp_ln(sd, f"{p}.conv_module.ln_conv", bp["conv"]["ln_conv"])
        _exp_lin(sd, f"{p}.conv_module.pw_conv2", bp["conv"]["pw2"])
        _exp_ln(sd, f"{p}.ff2.0", bp["ff2"]["ln"])
        _exp_lin(sd, f"{p}.ff2.1", bp["ff2"]["lin1"])
        _exp_lin(sd, f"{p}.ff2.4", bp["ff2"]["lin2"])
        _exp_ln(sd, f"{p}.ln_final", bp["ln_final"])
    _exp_lin(sd, "output.0", params["head"]["lin1"])
    _exp_ln(sd, "output.1", params["head"]["ln"])
    _exp_lin(sd, "output.4", params["head"]["lin2"])
    if cfg.use_interctc and "inter_out" in params:
        _exp_lin(sd, "inter_output", params["inter_out"])
    return sd
