"""Training/eval loop with the reference's ``trainModel(args)`` surface.

Reproduces the observable semantics of the reference trainer
(``neural_decoder_trainer.py:61-387``): per-step uniformly-random batches,
GRU or Conformer model selection via ``args["model_type"]``, CTC loss with
the reference's reduction/label-smoothing/InterCTC blending, Adam+LinearLR
or AdamW+warmup-cosine, eval every 100 steps (summed CTC loss + greedy PER),
best-on-CER checkpointing, and identical metric names.

TPU-first redesign:
  * one jitted, buffer-donated train step over static shapes — compiles once;
  * augmentation RNG is explicit (``jax.random`` keys folded per step),
    replacing torch global RNG;
  * data-parallel batch sharding over a ``jax.sharding.Mesh`` when multiple
    devices are visible (the reference is single-device only);
  * eval decode is a batched on-device op; only edit distance runs on host;
  * checkpoints carry full train state (params+opt+step) via Orbax, with the
    reference's ``args``/``trainingStats`` artifact contract preserved.
"""

from __future__ import annotations

import math
import os
import signal
import threading
import time
from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.batching import (
    Batch,
    bucket_batch_sizes,
    choose_envelope,
    eval_batches,
    length_buckets,
    sample_batch,
)
from ..data.dataset import PackedDataset, load_pickle_dataset, pack_days
from ..models.gru import GRUConfig, gru_forward, init_gru_params
from ..ops.ctc import ctc_loss
from ..ops.decode import batch_per, greedy_decode
from ..ops.noise import apply_noise
from ..ops.unfold import ctc_input_lengths
from ..parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from ..utils.logging import MetricLogger
from .checkpoints import CheckpointManager, save_args, save_training_stats
from .optim import make_optimizer


class ModelAPI(NamedTuple):
    """Uniform model interface for the trainer.

    forward(params, x, day_idx, x_lens, train, key) ->
        (log_probs [B, T', K], out_lens [B], inter_log_probs or None)
    """

    name: str
    config: Any
    init: Callable[[jax.Array], Any]
    forward: Callable[..., tuple]


def build_model(args: dict, n_days: int) -> ModelAPI:
    """Model selection mirroring ``neural_decoder_trainer.py:84-119``."""
    model_type = args.get("model_type", "gru_baseline")
    if model_type == "transformer_ctc":
        from ..models.conformer import (
            ConformerConfig,
            conformer_forward,
            init_conformer_params,
        )

        cfg = ConformerConfig(
            n_channels=args["nInputFeatures"],
            n_classes=args["nClasses"],
            n_days=n_days,
            frontend_dim=args.get("frontend_dim", 1024),
            latent_dim=args.get("latent_dim", 1024),
            autoencoder_hidden_dim=args.get("autoencoder_hidden_dim", 512),
            num_layers=args.get("transformer_num_layers", 8),
            num_heads=args.get("transformer_n_heads", 8),
            ff_dim=args.get("transformer_dim_ff", 2048),
            dropout=args.get("transformer_dropout", 0.3),
            temporal_kernel=args.get("temporal_kernel", 32),
            temporal_stride=args.get("temporal_stride", 4),
            gaussian_smooth_width=args.get("gaussian_smooth_width", 2.0),
            conv_kernel=args.get("conformer_conv_kernel", 31),
            use_spec_augment=args.get("use_spec_augment", True),
            spec_augment_freq_mask=args.get("spec_augment_freq_mask", 100),
            spec_augment_time_mask=args.get("spec_augment_time_mask", 40),
            drop_path_prob=args.get("drop_path_prob", 0.1),
            compute_dtype=jnp.dtype(args.get("compute_dtype", "float32")),
            fused_attention=args.get("fused_attention", True),
            # opt-in experiment kernels (measured-NO-GAIN defaults OFF;
            # BASELINE.md "Fused-FFN" / "Fused conv-module" experiments)
            fused_ffn=args.get("fused_ffn", False),
            fused_conv=args.get("fused_conv", False),
            # streaming-compatible variant (banded attention + causal convs)
            causal=args.get("causal", False),
            attn_left_context=args.get("attn_left_context", 128),
            # Head-parallel TP needs the per-head-interleaved qkv layout
            # (parallel/shardings.py applies the matching weight relayout).
            qkv_interleaved=bool(
                args.get(
                    "qkv_interleaved",
                    int(args.get("n_model_devices", 1) or 1) > 1,
                )
            ),
        )

        def forward(params, x, day_idx, x_lens, *, train, key):
            return conformer_forward(
                params, cfg, x, day_idx, x_lens, train=train, key=key
            )

        return ModelAPI(
            "transformer_ctc", cfg, partial(init_conformer_params, cfg=cfg), forward
        )

    cfg = GRUConfig(
        neural_dim=args["nInputFeatures"],
        n_classes=args["nClasses"],
        hidden_dim=args["nUnits"],
        num_layers=args["nLayers"],
        n_days=n_days,
        dropout=args["dropout"],
        stride_len=args["strideLen"],
        kernel_len=args["kernelLen"],
        gaussian_smooth_width=args["gaussianSmoothWidth"],
        bidirectional=args["bidirectional"],
        compute_dtype=jnp.dtype(args.get("compute_dtype", "float32")),
        # None = auto (Pallas scan on TPU for tile-aligned shapes; multi-
        # device via the registered kernel mesh); True forces the kernel
        # (interpreter mode off-TPU — multi-device CPU tests).
        use_pallas=args.get("use_pallas"),
        # None = auto: OFF — the hand-tiled Pallas GEMMs win isolated but
        # regress the full step 15% (BASELINE.md round-4 A/B); True forces
        # the experiment path (ops/pallas/matmul.py).
        use_pallas_matmul=args.get("use_pallas_matmul"),
    )

    def forward(params, x, day_idx, x_lens, *, train, key):
        logits = gru_forward(
            params, cfg, x, day_idx, train=train, dropout_key=key
        )
        out_lens = ctc_input_lengths(x_lens, cfg.kernel_len, cfg.stride_len)
        out_lens = jnp.clip(out_lens, 0, logits.shape[1])
        return jax.nn.log_softmax(logits, axis=-1), out_lens, None

    def init(key):
        return init_gru_params(key, cfg)

    return ModelAPI("gru_baseline", cfg, init, forward)


def _loss_and_metrics(args: dict, model: ModelAPI, params, batch_arrays, key):
    """Training loss with the reference's blending semantics
    (neural_decoder_trainer.py:212-248)."""
    x, y, x_lens, y_lens, days = batch_arrays
    k_noise, k_model = jax.random.split(key)
    x = apply_noise(
        k_noise, x, args["whiteNoiseSD"], args["constantOffsetSD"]
    )
    log_probs, out_lens, inter_log_probs = model.forward(
        params, x, days, x_lens, train=True, key=k_model
    )
    label_smoothing = args.get("label_smoothing", 0.0)
    n_classes = args["nClasses"] + 1
    metrics = {}
    ck = args.get("ctc_use_kernel")  # None = auto-gate (ops/ctc.py)

    if label_smoothing > 0:
        per_seq = ctc_loss(log_probs, out_lens, y, y_lens, reduction="none",
                           use_kernel=ck)
        ctc = jnp.mean(per_seq)
        # KL(log_probs || uniform) over ALL frames incl. padding — the
        # reference's kl_div(reduction='batchmean') on [T', B, K] divides by
        # its FIRST dim, i.e. the frame count T', not the batch (:238-240).
        uni = -math.log(n_classes)
        kl = jnp.sum((1.0 / n_classes) * (uni - log_probs)) / log_probs.shape[1]
        main_loss = (1 - label_smoothing) * ctc + label_smoothing * kl
        metrics["train/ctc_loss"] = ctc
        metrics["train/kl_loss"] = kl
    else:
        main_loss = ctc_loss(log_probs, out_lens, y, y_lens, reduction="mean",
                             use_kernel=ck)

    if inter_log_probs is not None:
        # With label smoothing off, the reference's loss_ctc already reduced
        # to a length-normalized batch mean, making its torch.sum a no-op
        # (:139-141,231-232) — so both branches are means, differing only in
        # whether per-seq losses are length-normalized first.
        if label_smoothing > 0:
            inter = jnp.mean(
                ctc_loss(inter_log_probs, out_lens, y, y_lens,
                         reduction="none", use_kernel=ck)
            )
        else:
            inter = ctc_loss(
                inter_log_probs, out_lens, y, y_lens, reduction="mean",
                use_kernel=ck,
            )
        w = args.get("interctc_weight", 0.3)
        loss = (1.0 - w) * main_loss + w * inter
        metrics["train/inter_ctc_loss"] = inter
        metrics["train/main_loss"] = main_loss
    else:
        loss = main_loss
    # Tokens-constant bucketing (tokensPerBatch) trains with per-bucket
    # batch sizes B_k; with plain mean reduction a trial's per-step gradient
    # weight would be 1/B_k — long-sequence trials (small B_k) would get
    # 2-3x more total gradient weight than short ones. Rescaling the loss
    # by B_k/batchSize makes every batch an (effective) sum/batchSize, so
    # per-trial gradient weight stays uniform across buckets exactly as in
    # fixed-B training. Disable with tokensLossScale: false to reproduce
    # the unscaled round-4 behavior.
    if args.get("tokensPerBatch", 0) and args.get("tokensLossScale", True):
        loss = loss * (x.shape[0] / int(args.get("batchSize", x.shape[0])))
    metrics["train/loss"] = loss
    return loss, metrics


def _path_name(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)


def _tree_norms(tree, prefix: str) -> dict:
    """Per-leaf L2 norms keyed by pytree path (e.g.
    ``train/grad_norm/gru/layers/0/w_hh``)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {
        f"{prefix}/" + "/".join(_path_name(k) for k in path): jnp.sqrt(
            jnp.sum(jnp.square(leaf.astype(jnp.float32)))
        )
        for path, leaf in flat
    }


WATCH_PREFIXES = ("train/grad_norm/", "train/param_norm/")


def make_train_step(args: dict, model: ModelAPI, tx, schedule=None) -> Callable:
    log_grad_norm = args.get("model_type", "gru_baseline") == "transformer_ctc"
    # Per-layer grad/param norms — the reference's wandb.watch(log="all",
    # log_freq=100) observability (neural_decoder_trainer.py:122). Computed
    # on-device every step (a few hundred cheap reductions); the trainer
    # only materializes them on the watch interval.
    watch = int(args.get("watch_log_freq", 100)) > 0

    # Optional fused single-pass Adam(+L2) for the GRU recipe
    # (ops/pallas/adam_kernel.py). Measured-no-gain on v5e — XLA already
    # runs the optax chain at the elementwise HBM ceiling and the
    # per-leaf Pallas launches cost more than they save (see the kernel
    # module docstring + BASELINE.md) — so this is opt-in
    # (fused_optimizer: true); the math is oracle-tested either way
    # (test_fused_adam.py).
    fused_cfg = None
    if (
        args.get("optimizer", "adam") != "adamw"
        and args.get("model_type", "gru_baseline") != "transformer_ctc"
        and bool(args.get("fused_optimizer", False))
    ):
        if schedule is None:  # standalone callers (benches) omit it
            _, schedule = make_optimizer(args)
        fused_schedule = schedule
        fused_cfg = {
            "b1": 0.9,
            "b2": 0.999,
            "eps": 0.1,
            "l2": float(args.get("l2_decay", 0.0)),
        }

    def _apply_optimizer(grads, opt_state, params):
        if fused_cfg is not None:
            adam_idx = next(
                (
                    i
                    for i, s in enumerate(opt_state)
                    if isinstance(s, optax.ScaleByAdamState)
                ),
                None,
            )
            if adam_idx is not None:
                from ..ops.pallas.adam_kernel import fused_adam_update

                adam_st = opt_state[adam_idx]
                lr = fused_schedule(adam_st.count)
                params, mu, nu = fused_adam_update(
                    grads, params, adam_st.mu, adam_st.nu, adam_st.count,
                    lr, **fused_cfg,
                )
                new_states = []
                for i, s in enumerate(opt_state):
                    if i == adam_idx:
                        new_states.append(
                            optax.ScaleByAdamState(
                                count=adam_st.count + 1, mu=mu, nu=nu
                            )
                        )
                    elif "count" in getattr(s, "_fields", ()):
                        new_states.append(s._replace(count=s.count + 1))
                    else:
                        new_states.append(s)
                return params, tuple(new_states)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    @partial(jax.jit, donate_argnums=0)
    def train_step(state, x, y, x_lens, y_lens, days, key):
        def loss_fn(p):
            return _loss_and_metrics(
                args, model, p, (x, y, x_lens, y_lens, days), key
            )

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state["params"])
        if log_grad_norm:
            # torch clip_grad_norm_ returns the pre-clip norm (:257,270).
            metrics["train/grad_norm"] = optax.global_norm(grads)
        if watch:
            metrics.update(_tree_norms(grads, "train/grad_norm"))
            metrics.update(_tree_norms(state["params"], "train/param_norm"))
        params, opt_state = _apply_optimizer(
            grads, state["opt_state"], state["params"]
        )
        new_state = {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        return new_state, metrics

    return train_step


def make_eval_step(model: ModelAPI, args: dict | None = None) -> Callable:
    # honor the same ctc_use_kernel override the training loss respects —
    # a user who disabled (or forced) the Pallas CTC kernel must get that
    # code path at BOTH ctc_loss call sites, not just the train step
    use_kernel = (args or {}).get("ctc_use_kernel")

    @jax.jit
    def eval_step(params, x, y, x_lens, y_lens, days):
        log_probs, out_lens, _ = model.forward(
            params, x, days, x_lens, train=False, key=None
        )
        per_seq = ctc_loss(
            log_probs, out_lens, y, y_lens, reduction="none",
            use_kernel=use_kernel,
        )
        tokens, dec_lens = greedy_decode(log_probs, out_lens)
        return per_seq, tokens, dec_lens

    return eval_step


def run_eval(
    eval_step,
    params,
    test_ds: PackedDataset,
    batch_size: int,
    t_max: int,
    u_max: int,
    *,
    torch_mean_semantics: bool,
    device_put: Callable[[Batch], tuple],
    buckets: list[int] | None = None,
    materialize_x: bool = True,
) -> tuple[float, float, int, int]:
    """Full test pass. Returns (avg_day_loss, per, edit_dist, seq_len).

    ``avg_day_loss`` follows the reference: per-batch scalar (mean over rows
    for the GRU/no-smoothing path, sum for the label-smoothing path), then
    averaged over batches (``neural_decoder_trainer.py:303-310,332``).

    ``buckets`` enables length-ordered bucketed eval batches: PER and
    edit-distance totals are exactly invariant (masked, order-independent);
    ``avg_day_loss`` can shift at the last decimal because the reference's
    mean-of-batch-means depends on which trials share the partial batch.
    """
    # Multi-host: eval outputs are batch-sharded across processes;
    # np.asarray on a non-addressable global array raises. Gather to every
    # host first (all hosts compute the same metrics — keeps the
    # primary-only logging decision downstream).
    if jax.process_count() > 1:
        from jax.experimental.multihost_utils import process_allgather

        def to_host(a):
            return np.asarray(process_allgather(a, tiled=True))
    else:
        to_host = np.asarray

    batch_scalars = []
    total_dist = 0
    total_len = 0
    for batch in eval_batches(test_ds, batch_size, t_max, u_max,
                              buckets=buckets, materialize_x=materialize_x):
        arrays = device_put(batch)
        per_seq, tokens, dec_lens = eval_step(params, *arrays)
        per_seq = to_host(per_seq)
        w = batch.weight
        if torch_mean_semantics:
            norm = per_seq / np.maximum(batch.y_lens, 1)
            scalar = float((norm * w).sum() / max(w.sum(), 1))
        else:
            scalar = float((per_seq * w).sum())
        batch_scalars.append(scalar)
        real = w > 0
        d, l = batch_per(
            to_host(tokens)[real],
            to_host(dec_lens)[real],
            batch.y[real],
            batch.y_lens[real],
        )
        total_dist += d
        total_len += l
    avg_day_loss = float(np.sum(batch_scalars) / max(len(batch_scalars), 1))
    per = total_dist / max(total_len, 1)
    return avg_day_loss, per, total_dist, total_len


def train_model(args: dict) -> dict:
    """Train per the reference contract; returns a summary dict.

    Preemption-safe: SIGTERM/SIGUSR1 trigger a checkpoint-and-clean-exit
    at the next step boundary (the reference's SLURM wrapper asks for a
    USR1 warning 120 s before kill — ``eval_competition.sh:13`` — but
    nothing catches it and an interrupted run restarts from scratch; TPU
    VMs likewise get SIGTERM on maintenance events). ``resume: true``
    then continues exactly (same sampler RNG, same metric history).
    Handlers are installed before any slow setup/compile work and restored
    on ALL exits, including exceptions.
    """
    preempt_requested = threading.Event()

    def _request_stop(signum, frame):
        print(f"signal {signum} received — will checkpoint and exit")
        preempt_requested.set()

    prev_handlers: dict[int, Any] = {}
    if (
        bool(args.get("preempt_signals", True))
        and threading.current_thread() is threading.main_thread()
    ):
        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                prev_handlers[sig] = signal.signal(sig, _request_stop)
            except (ValueError, OSError):  # pragma: no cover
                pass
    from ..parallel.kernel_mesh import get_kernel_mesh, restore_kernel_mesh

    # _train_model_impl registers its mesh as the ambient kernel mesh;
    # restore whatever registration the caller had (e.g. an open
    # kernel_mesh() context) rather than clearing outright.
    prev_km = get_kernel_mesh()
    try:
        return _train_model_impl(args, preempt_requested)
    finally:
        restore_kernel_mesh(prev_km)
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)


def _train_model_impl(args: dict, preempt_requested) -> dict:
    output_dir = args["outputDir"]
    seed = int(args.get("seed", 0))
    np_rng = np.random.default_rng(seed)
    # rbg: the TPU's hardware RNG — ~3 ms/step cheaper than threefry for
    # the [B,T,C] noise draws at reference scale; statistically ample for
    # augmentation. Set rng_impl: threefry2x32 for strict reproducibility
    # across backends.
    base_key = jax.random.key(seed, impl=args.get("rng_impl", "rbg"))

    logger = MetricLogger(
        output_dir,
        project=args.get("wandb_project", "neural-speech-decoder"),
        run_name=args.get("wandb_run_name"),
        config={k: v for k, v in args.items() if k != "dataset"},
        mode=args.get("wandb_mode", "offline"),
    )

    raw = args.get("dataset") or load_pickle_dataset(args["datasetPath"])
    train_ds = pack_days(raw["train"])
    test_ds = pack_days(raw["test"])
    n_days = len(raw["train"])
    # Persist the resolved day count so load_model rebuilds correctly (the
    # reference hardcodes nDays=24 in its loader — trainer.py:390-410).
    # Multi-host: only the primary writes artifacts — N processes sharing
    # one outputDir would interleave truncate/write on the same pickle
    # (parallel/multihost.py::is_primary; replicated-DP state is fully
    # addressable on every host, so one writer suffices).
    from ..parallel.multihost import is_primary

    primary = is_primary()
    if primary:
        save_args(
            output_dir,
            {**{k: v for k, v in args.items() if k != "dataset"},
             "nDays": n_days},
        )

    batch_size = int(args["batchSize"])
    t_max, u_max = choose_envelope(
        train_ds,
        test_ds,
        time_multiple=int(args.get("time_multiple", 128)),
        max_time=args.get("maxTimeSeriesLen"),
    )

    model = build_model(args, n_days)
    params = model.init(base_key)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"Model has {n_params:,} parameters ({n_params:,} trainable)")
    logger.log(
        {"model/total_parameters": n_params, "model/trainable_parameters": n_params},
        step=0,
    )

    tx, schedule = make_optimizer(args)
    state = {"params": params, "opt_state": tx.init(params), "step": jnp.array(0)}

    # Parallelism: data-parallel over all devices by default; optional
    # tensor parallelism via n_model_devices (Megatron-style weight sharding
    # from parallel/shardings.py; collectives inserted by XLA GSPMD).
    devices = jax.devices()
    # `or 1`: tolerate an explicit YAML null (`n_model_devices:`), like
    # build_model and the n_data_devices line below do for the same knobs
    n_model = int(args.get("n_model_devices") or 1)
    if n_model > len(devices):
        raise ValueError(
            f"n_model_devices={n_model} exceeds the {len(devices)} "
            f"available device(s)"
        )
    avail = len(devices) // n_model
    n_data = min(int(args.get("n_data_devices") or avail), avail)
    # Every per-step batch must shard evenly over the data axis. With
    # tokensPerBatch the step batch is some B_k — a multiple of
    # batchMultiple only — so constrain n_data to divisors of
    # batchMultiple instead of batchSize (else device_put fails mid-run
    # on the first bucket whose B_k the mesh doesn't divide).
    divisor_target = (
        int(args.get("batchMultiple", 64))
        if int(args.get("tokensPerBatch", 0)) > 0
        else batch_size
    )
    n_data = max(d for d in range(1, n_data + 1) if divisor_target % d == 0)
    mesh = make_mesh(n_data=n_data, n_model=n_model,
                     devices=devices[: n_data * n_model])
    # Register the mesh so the Pallas fast paths stay live multi-device:
    # the kernel call sites (models/, ops/ctc.py) shard_map over it instead
    # of falling back to the XLA twins (parallel/kernel_mesh.py).
    # train_model restores the caller's previous registration on exit.
    from ..parallel.kernel_mesh import set_kernel_mesh

    set_kernel_mesh(mesh)
    b_shard = batch_sharding(mesh)
    r_shard = replicated_sharding(mesh)
    if n_model > 1:
        from ..parallel.shardings import shard_params

        params = shard_params(
            state["params"], mesh, args.get("model_type", "gru_baseline"),
            num_heads=args.get("transformer_n_heads", 8),
        )
        state = {
            "params": params,
            "opt_state": jax.jit(tx.init)(params),
            "step": jax.device_put(state["step"], r_shard),
        }
    else:
        state = jax.device_put(state, r_shard)

    # Multi-host: every process samples the identical global batch (same
    # seeded RNG — preserves single-process bit-parity and exact resume),
    # keeps its contiguous row shard, and stages it into the global array
    # via make_array_from_process_local_data. Single-host: plain sharded
    # device_put. Force the staging path with multihost_staging: true.
    multihost = bool(
        args.get("multihost_staging", jax.process_count() > 1)
    )
    if multihost:
        from ..parallel.multihost import local_rows, stage_local_batch

        def device_put_batch(batch: Batch):
            rows = local_rows(batch.x.shape[0])
            return stage_local_batch(
                b_shard,
                tuple(
                    a[rows]
                    for a in (batch.x, batch.y, batch.x_lens, batch.y_lens,
                              batch.days)
                ),
            )
    else:

        def device_put_batch(batch: Batch):
            return tuple(
                jax.device_put(a, b_shard)
                for a in (batch.x, batch.y, batch.x_lens, batch.y_lens,
                          batch.days)
            )

    # Device-resident data: stage the packed [ΣT, C] feature arrays in HBM
    # once and assemble each batch on-device from host-sampled indices —
    # the host path's per-step O(B·T·C) h2d copy becomes O(B) scalars,
    # with identical RNG stream / batch composition (data/device_data.py).
    # Multi-host keeps the process-local staging path (each host owns its
    # batch shard rows).
    device_data = bool(args.get("deviceResidentData", False)) and not multihost
    eval_device_put = device_put_batch
    if device_data:
        from ..data.device_data import DeviceData

        train_dd = DeviceData(train_ds, r_shard)
        test_dd = DeviceData(test_ds, r_shard)

        def device_put_batch(batch: Batch):  # noqa: F811
            return train_dd.assemble(batch, batch_sharding=b_shard)

        def eval_device_put(batch: Batch):  # noqa: F811
            return test_dd.assemble(batch, batch_sharding=b_shard)

    train_step = make_train_step(args, model, tx, schedule)
    eval_step = make_eval_step(model, args)
    torch_mean = args.get("label_smoothing", 0.0) == 0

    n_batch = int(args["nBatch"])
    eval_every = int(args.get("evalEvery", 100))
    ckpt_every = int(args.get("checkpointEvery", 0))
    ckpt = CheckpointManager(output_dir)
    compat_skip_first = bool(args.get("compat_skip_first_eval_save", False))

    test_loss: list[float] = []
    test_cer: list[float] = []
    start_step = 0
    # Resume: full train state + sampler RNG + metric history (the reference
    # has no resume path at all — SURVEY.md §5 checkpoint/resume).
    if args.get("resume") and ckpt.exists("lastState"):
        if n_model > 1:
            # Preserve the TP layout on resume: a blanket replicated
            # device_put would silently drop the Megatron shardings
            # installed above (weights replicated -> HBM blow-up and no
            # TP compute). Re-install per-leaf shardings from the live
            # (already-sharded) state; leaves without a mesh sharding
            # (e.g. the optimizer step counter, an uncommitted constant
            # in the fresh path that the checkpoint round-trip would pin
            # to one device) go to the mesh-replicated sharding.
            from jax.sharding import NamedSharding

            restored = ckpt.restore("lastState", state)
            state = jax.tree.map(
                lambda leaf, like: jax.device_put(
                    leaf,
                    like.sharding
                    if isinstance(like.sharding, NamedSharding)
                    else r_shard,
                ),
                restored, state,
            )
        else:
            state = jax.device_put(ckpt.restore("lastState", state), r_shard)
        side = ckpt.load_sidecar()
        start_step = int(side["step"])
        test_loss = list(side["testLoss"])
        test_cer = list(side["testCER"])
        np_rng.bit_generator.state = side["np_rng_state"]
        print(f"Resumed from step {start_step}")

    def save_last(step):
        if not primary:
            return
        ckpt.save("lastState", state)
        ckpt.save_sidecar(
            {
                "step": step + 1,
                "testLoss": test_loss,
                "testCER": test_cer,
                "np_rng_state": np_rng.bit_generator.state,
            }
        )

    # Optional jax.profiler trace over a step window (SURVEY.md §5: the
    # reference only has wall-clock timing; this exposes real TPU traces).
    profile_start, profile_stop = args.get("profile_steps", (None, None))


    # Length bucketing: pad each batch to the smallest quantile bucket that
    # covers it (few compiles, short batches stop paying for the global
    # envelope — closer to the reference's per-batch dynamic padding).
    n_buckets = int(args.get("lengthBuckets", 1))
    buckets = (
        length_buckets(train_ds, n_buckets, t_max,
                       time_multiple=int(args.get("time_multiple", 128)))
        if n_buckets > 1
        else None
    )
    # Tokens-constant bucketing (``tokensPerBatch``): size each bucket's
    # batch by a token budget (B_k = budget / T_k) so short-envelope steps
    # stop under-filling the chip. Measured +3% effective throughput for
    # both families over fixed-B bucketing (BASELINE.md "tokens-constant
    # bucketing"); the sampler keeps the uniform per-trial marginal by
    # drawing buckets ∝ n_k / B_k. Opt-in; one extra compile per distinct
    # B_k at most.
    token_budget = int(args.get("tokensPerBatch", 0))
    # Batch-size granularity: the GRU's recurrent matmuls have M = 2·B
    # rows, so B must be a multiple of 64 to fill the 128-row MXU tile
    # (measured: B=104 −22%, B=128 +9%); the Conformer measured identical
    # effective rates at multiple 8 and 64, so 64 is the default for both
    # (see bucket_batch_sizes / BASELINE.md "tokens-constant bucketing").
    bucket_sizes = (
        bucket_batch_sizes(buckets, token_budget, t_max,
                           max_batch=int(args.get("maxBatchSize", 256)),
                           multiple=int(args.get("batchMultiple", 64)))
        if buckets is not None and token_budget > 0
        else None
    )

    watch_freq = int(args.get("watch_log_freq", 100))

    def flush_metrics(pending):
        if pending is None:
            return
        held, at_step = pending
        # Per-layer watch norms only materialize on the watch interval (one
        # host transfer); core scalars flush every step.
        if not (watch_freq and at_step % watch_freq == 0):
            held = {
                k: v for k, v in held.items()
                if not k.startswith(WATCH_PREFIXES)
            }
        log_dict = {k: float(v) for k, v in jax.device_get(held).items()}
        log_dict["train/learning_rate"] = float(schedule(at_step))
        log_dict["train/batch"] = at_step
        logger.log(log_dict, step=at_step)

    start_time = time.time()
    pending = None  # (metrics, step) held from the previous iteration
    preempted_at: int | None = None
    for step in range(start_step, n_batch):
        if preempt_requested.is_set():
            preempted_at = step
            break
        if step == profile_start:
            jax.profiler.start_trace(os.path.join(output_dir, "profile"))
        batch = sample_batch(
            train_ds, np_rng, batch_size, t_max, u_max, buckets=buckets,
            bucket_sizes=bucket_sizes, materialize_x=not device_data,
        )
        key = jax.random.fold_in(base_key, step)
        state, metrics = train_step(state, *device_put_batch(batch), key)
        if step == profile_stop:
            jax.device_get(metrics)  # host transfer: block_until_ready is a no-op through the axon tunnel
            jax.profiler.stop_trace()

        # Pipelined logging: materializing metrics synchronizes with the
        # device, so flush step t-1's values only after dispatching step t —
        # host batch prep + h2d for the next step overlap the device step.
        flush_metrics(pending)
        pending = (metrics, step)

        if step % eval_every == 0:
            flush_metrics(pending)
            pending = None
            avg_loss, cer, edit_dist, seq_len = run_eval(
                eval_step,
                state["params"],
                test_ds,
                batch_size,
                t_max,
                u_max,
                torch_mean_semantics=torch_mean,
                device_put=eval_device_put,
                buckets=buckets,
                materialize_x=not device_data,
            )
            time_per_batch = (time.time() - start_time) / eval_every
            print(
                f"batch {step}, ctc loss: {avg_loss:>7f}, cer: {cer:>7f}, "
                f"time/batch: {time_per_batch:>7.3f}"
            )
            start_time = time.time()
            logger.log(
                {
                    "eval/loss": avg_loss,
                    "eval/cer": cer,
                    "eval/time_per_batch": time_per_batch,
                    "eval/edit_distance": edit_dist,
                    "eval/sequence_length": seq_len,
                },
                step=step,
            )
            # Best-on-CER checkpoint (reference :352-358; first-eval fixed).
            prev_best = np.min(test_cer) if test_cer else np.inf
            should_save = cer < prev_best and not (compat_skip_first and not test_cer)
            if should_save:
                if primary:
                    # Params only — the reference's modelWeights semantics
                    # (state_dict, no optimizer). The full state lives in
                    # the periodic lastState; saving it here too would
                    # triple the d2h volume on every new best (measured
                    # +56 s/save through the tunnel at reference scale).
                    ckpt.save("modelState", {"params": state["params"]})
                logger.log({"eval/best_cer": cer}, step=step)
                print(f"  → New best model saved! CER: {cer:.6f}")
            test_loss.append(avg_loss)
            test_cer.append(cer)
            if primary:
                save_training_stats(output_dir, test_loss, test_cer)

        if ckpt_every and (step + 1) % ckpt_every == 0:
            save_last(step)

    if preempted_at is not None:
        # ``step`` batches [0, preempted_at) are consumed; save_last records
        # sidecar step = preempted_at, so resume continues exactly there.
        flush_metrics(pending)
        save_last(preempted_at - 1)
        logger.finish()
        print(
            f"Preempted: checkpointed at step {preempted_at - 1}; "
            f"rerun with resume: true to continue from step {preempted_at}"
        )
        # Include best CER so far so sweep drivers (parallel/sweep.py) can
        # rank/record a preempted trial instead of crashing on a missing key.
        return {
            "summary/preempted_at": preempted_at,
            "summary/best_cer": float(np.min(test_cer)) if test_cer else float("inf"),
        }

    flush_metrics(pending)
    save_last(n_batch - 1)
    final_cer = test_cer[-1] if test_cer else float("inf")
    best_cer = float(np.min(test_cer)) if test_cer else float("inf")
    summary = {
        "summary/final_cer": final_cer,
        "summary/best_cer": best_cer,
        "summary/final_loss": test_loss[-1] if test_loss else float("inf"),
        "summary/best_loss": float(np.min(test_loss)) if test_loss else float("inf"),
    }
    logger.log(summary)
    logger.finish()
    print(f"\n{'=' * 60}")
    print("Training completed!")
    print(f"Final CER: {final_cer:.6f}")
    print(f"Best CER: {best_cer:.6f}")
    print(f"{'=' * 60}\n")
    return summary


def load_model(model_dir: str, n_input_layers: int | None = None):
    """Rebuild a trained model from a run directory.

    Equivalent of ``loadModel`` (``neural_decoder_trainer.py:390-410``) but
    supports both model families (the reference loader only rebuilds the
    GRU) and restores from the best-CER Orbax checkpoint. ``n_input_layers``
    overrides the day count like the reference's ``nInputLayers`` arg.
    """
    from .checkpoints import load_args

    args = load_args(model_dir)
    n_days = n_input_layers or args.get("nDays", 24)
    model = build_model(args, n_days)
    params = model.init(jax.random.key(int(args.get("seed", 0))))
    ckpt = CheckpointManager(model_dir)
    name = "modelState" if ckpt.exists("modelState") else "lastState"
    if name == "modelState":
        try:  # round-5 format: params only (reference modelWeights parity)
            return (
                ckpt.restore("modelState", {"params": params})["params"],
                model,
                args,
            )
        except Exception:  # pre-round-5 best checkpoints hold full state
            pass
    tx, _ = make_optimizer(args)
    template = {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.array(0),
    }
    state = ckpt.restore(name, template)
    return state["params"], model, args
