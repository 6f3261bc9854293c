"""Checkpoint export to the reference torch layout (models/torch_export).

Pins the migration path OUT of this framework: a model trained here,
exported with ``export_gru_state_dict`` / ``export_conformer_state_dict``,
must (a) round-trip bit-exactly through ``torch_import`` and (b) load
into the actual reference modules with ``strict=True`` and reproduce our
fp32 logits — the inverse of the import-parity tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_speech_decoder_tpu.models.conformer import (
    ConformerConfig,
    conformer_forward,
    init_conformer_params,
)
from neural_speech_decoder_tpu.models.gru import (
    GRUConfig,
    gru_forward,
    init_gru_params,
)
from neural_speech_decoder_tpu.models.torch_export import (
    export_conformer_state_dict,
    export_gru_state_dict,
)
from neural_speech_decoder_tpu.models.torch_import import (
    import_conformer_state_dict,
    import_gru_state_dict,
)

from _torch_ref import load_reference

GRU_CFG = GRUConfig(
    neural_dim=8, n_classes=5, hidden_dim=12, num_layers=2, n_days=3,
    dropout=0.0, stride_len=2, kernel_len=4, gaussian_smooth_width=2.0,
    bidirectional=True,
)


def _tree_equal(a, b):
    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_gru_export_roundtrips_through_import():
    params = init_gru_params(jax.random.key(0), GRU_CFG)
    sd = export_gru_state_dict(params, GRU_CFG)
    back = import_gru_state_dict(sd, GRU_CFG)
    _tree_equal(params, back)


def test_gru_export_loads_strict_and_matches_logits():
    ref_model, _, _ = load_reference()
    import torch

    params = init_gru_params(jax.random.key(1), GRU_CFG)
    # randomize the day calibration so the export exercises it
    params["day"]["weight"] = params["day"]["weight"] + 0.1 * (
        jax.random.normal(jax.random.key(2), params["day"]["weight"].shape)
    )
    params["day"]["bias"] = 0.1 * jax.random.normal(
        jax.random.key(3), params["day"]["bias"].shape
    )
    sd = export_gru_state_dict(params, GRU_CFG)

    m = ref_model.GRUDecoder(
        device="cpu", neural_dim=8, n_classes=5, hidden_dim=12,
        layer_dim=2, nDays=3, dropout=0.0, strideLen=2, kernelLen=4,
        gaussianSmoothWidth=2.0, bidirectional=True,
    )
    missing, unexpected = m.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected
    m.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 40, 8)).astype(np.float32)
    days = np.asarray([0, 2])
    with torch.no_grad():
        ref = m(torch.from_numpy(x), torch.from_numpy(days)).numpy()
    ours = np.asarray(
        gru_forward(params, GRU_CFG, jnp.asarray(x), jnp.asarray(days))
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


CONF_CFG = ConformerConfig(
    n_channels=8, n_classes=5, n_days=3, frontend_dim=16, latent_dim=16,
    autoencoder_hidden_dim=12, num_layers=2, num_heads=2, ff_dim=24,
    dropout=0.0, temporal_kernel=4, temporal_stride=2,
    gaussian_smooth_width=2.0, conv_kernel=5, use_spec_augment=False,
    drop_path_prob=0.0, head_dropout=0.0,
)


def test_conformer_export_roundtrips_through_import():
    params = init_conformer_params(jax.random.key(4), cfg=CONF_CFG)
    sd = export_conformer_state_dict(params, CONF_CFG)
    back = import_conformer_state_dict(sd, CONF_CFG)
    _tree_equal(params, back)


def test_conformer_export_rejects_interleaved_layout():
    import dataclasses

    cfg = dataclasses.replace(CONF_CFG, qkv_interleaved=True)
    params = init_conformer_params(jax.random.key(5), cfg=cfg)
    with pytest.raises(ValueError, match="canonical"):
        export_conformer_state_dict(params, cfg)


def test_conformer_export_loads_into_reference_and_matches_logits():
    _, _, ref_tfm = load_reference()
    import torch

    params = init_conformer_params(jax.random.key(6), cfg=CONF_CFG)
    sd = export_conformer_state_dict(params, CONF_CFG)

    m = ref_tfm.NeuralTransformerCTCModel(
        n_channels=8, n_classes=CONF_CFG.n_out, n_days=3, frontend_dim=16,
        latent_dim=16, autoencoder_hidden_dim=12,
        transformer_layers=2, transformer_heads=2,
        transformer_ff_dim=24, transformer_dropout=0.0,
        temporal_kernel=4, temporal_stride=2, gaussian_smooth_width=2.0,
        conformer_conv_kernel=5, use_spec_augment=False,
        drop_path_prob=0.0, device="cpu",
    )
    tsd = {k: torch.from_numpy(np.ascontiguousarray(v))
           for k, v in sd.items()}
    missing, unexpected = m.load_state_dict(tsd, strict=False)
    # buffers/aux the export intentionally leaves at module defaults
    # (e.g. positional-encoding tables) may appear as "missing"; nothing
    # we exported may be unexpected, and no *parameter* may be missing
    assert not unexpected, unexpected
    param_names = {n for n, _ in m.named_parameters()}
    assert not (set(missing) & param_names), set(missing) & param_names
    m.eval()

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 32, 8)).astype(np.float32)
    days = np.asarray([0, 1])
    lens = np.asarray([32, 28])
    with torch.no_grad():
        out = m(
            torch.from_numpy(x), torch.from_numpy(days),
            torch.from_numpy(lens),
        )
    ref = (out[0] if isinstance(out, tuple) else out).numpy()
    ref = np.transpose(ref, (1, 0, 2))  # reference emits [T', B, K]
    lp, _, _ = conformer_forward(
        params, CONF_CFG, jnp.asarray(x), jnp.asarray(days),
        jnp.asarray(lens),
    )
    np.testing.assert_allclose(np.asarray(lp), ref, atol=3e-5, rtol=1e-5)


def test_export_cli_end_to_end(tmp_path):
    """scripts/export_checkpoint.py: run-dir -> torch file the reference
    loads with strict=True."""
    import runpy
    import sys

    from neural_speech_decoder_tpu.data.synthetic import synthetic_dataset
    from neural_speech_decoder_tpu.training import train_model

    out = str(tmp_path / "run")
    train_model({
        "outputDir": out,
        "dataset": synthetic_dataset(seed=3, n_days=2, trials_per_day=8,
            n_channels=8, min_t=24, max_t=40, min_u=2, max_u=3),
        "batchSize": 4, "lrStart": 0.01, "lrEnd": 0.01, "l2_decay": 0.0,
        "nBatch": 3, "evalEvery": 2, "whiteNoiseSD": 0.0,
        "constantOffsetSD": 0.0, "gaussianSmoothWidth": 2.0, "nUnits": 16,
        "nLayers": 1, "nInputFeatures": 8, "nClasses": 40, "dropout": 0.0,
        "strideLen": 2, "kernelLen": 4, "bidirectional": True, "seed": 0,
        "wandb_mode": "disabled", "time_multiple": 16,
    })
    dst = str(tmp_path / "modelWeights")
    sys.path.insert(0, "scripts")
    try:
        mod = runpy.run_path("scripts/export_checkpoint.py",
                             run_name="not_main")
        mod["main"]([out, dst])
    finally:
        sys.path.remove("scripts")

    ref_model, _, _ = load_reference()
    import torch

    m = ref_model.GRUDecoder(
        device="cpu", neural_dim=8, n_classes=40, hidden_dim=16,
        layer_dim=1, nDays=2, dropout=0.0, strideLen=2, kernelLen=4,
        gaussianSmoothWidth=2.0, bidirectional=True,
    )
    sd = torch.load(dst)
    m.load_state_dict(sd, strict=True)
    # value-level check: the CLI exported THIS run's trained weights (a
    # stale/init checkpoint or swapped same-shape tensor would still
    # strict-load) — compare against the run directory's params
    from neural_speech_decoder_tpu.training.trainer import load_model

    params, _, _ = load_model(out)
    np.testing.assert_allclose(
        sd["fc_decoder_out.weight"].numpy(),
        np.asarray(params["fc"]["weight"]).T,
        atol=0,
    )
    np.testing.assert_allclose(
        sd["dayWeights"].numpy(), np.asarray(params["day"]["weight"]),
        atol=0,
    )
