"""Ahead-of-time inference export via ``jax.export`` (StableHLO).

The reference deploys by unpickling ``args`` + a torch state dict back
into the full training codebase (``neural_decoder_trainer.py:390-410``),
so serving a model drags the whole framework (and torch) along. Here the
jitted eval forward is exported once as a serialized StableHLO artifact:
a serving process needs only jax + the artifact — no model code, no
checkpoint machinery — and the function is version-stable under
``jax.export``'s compatibility guarantees.

Artifact layout (``<out_dir>/``):

- ``model.shlo`` — the serialized exported function
  ``(weights, x, days, x_lens) -> (log_probs [B,T',K], out_lens [B])``
  where ``weights`` is a flat tuple of parameter arrays;
- ``weights.npz`` — the parameter leaves ``w000…`` in flatten order
  (bfloat16 leaves stored as float32, true dtype recorded in meta);
- ``meta.json`` — model family, input shapes/dtypes, lowering
  platform(s), jax version.

Platform note: the kernel auto-gates (``models/gru.py``,
``models/conformer.py``) pick Pallas-vs-XLA-twin paths at TRACE time
from ``jax.default_backend()``, so export on the platform you will serve
on: a TPU-host export embeds the Pallas fast paths (Mosaic custom calls
— a TPU-only artifact), a CPU export embeds the portable XLA twins.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

_BLOB = "model.shlo"
_WEIGHTS = "weights.npz"
_META = "meta.json"


def _save_weights(out_dir: str, leaves) -> list[str]:
    """Write parameter leaves (flatten order) to ``weights.npz``; returns
    the true dtype per leaf (bfloat16 is stored as float32 — npz has no
    native bf16 encoding)."""
    arrs, dtypes = {}, []
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        dtypes.append(str(a.dtype))
        if a.dtype == jnp.bfloat16:
            a = a.astype(np.float32)
        arrs[f"w{i:03d}"] = a
    np.savez(os.path.join(out_dir, _WEIGHTS), **arrs)
    return dtypes


def export_inference(
    model_dir: str,
    out_dir: str,
    *,
    batch_size: int | None = None,
    t_max: int | None = None,
) -> str:
    """Export the eval forward of a trained run directory as an AOT
    artifact. Shapes are static (XLA): one artifact serves one padded
    ``(batch_size, t_max)`` envelope — export several for several
    envelopes. Defaults come from the run's ``args`` (``batchSize``;
    ``maxTimeSeriesLen`` rounded up to ``time_multiple``).
    """
    from ..training.trainer import load_model

    params, model, args = load_model(model_dir)
    b = int(batch_size or args.get("batchSize", 8))
    # Same default multiple as the trainer's eval envelope
    # (trainer.py choose_envelope call, time_multiple default 128), so a
    # default export accepts batches padded by the run's own pipeline —
    # and ExportedModel.pad_batch pads raw trials to any envelope.
    tm = int(args.get("time_multiple", 128) or 1)
    t = int(t_max or args.get("maxTimeSeriesLen", 1200))
    t = ((t + tm - 1) // tm) * tm
    n_ch = int(args["nInputFeatures"])

    leaves, treedef = jax.tree.flatten(params)

    def infer(weights, x, days, x_lens):
        p = jax.tree.unflatten(treedef, list(weights))
        log_probs, out_lens, _ = model.forward(
            p, x, days, x_lens, train=False, key=None
        )
        return log_probs, out_lens

    sds = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
    exported = jax_export.export(jax.jit(infer))(
        tuple(sds(leaf) for leaf in leaves),
        jax.ShapeDtypeStruct((b, t, n_ch), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _BLOB), "wb") as f:
        f.write(exported.serialize())

    dtypes = _save_weights(out_dir, leaves)

    meta = {
        "model_type": model.name,
        "batch_size": b,
        "t_max": t,
        "n_channels": n_ch,
        "n_leaves": len(leaves),
        "leaf_dtypes": dtypes,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "outputs": "log_probs [B, T', K] (log-softmax), out_lens [B]",
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


class ExportedModel:
    """A loaded AOT artifact: ``model(x, days, x_lens)`` with weights
    bound from ``weights.npz``. Needs only jax — no model code."""

    def __init__(self, art_dir: str):
        with open(os.path.join(art_dir, _META)) as f:
            self.meta = json.load(f)
        with open(os.path.join(art_dir, _BLOB), "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        npz = np.load(os.path.join(art_dir, _WEIGHTS))
        leaves = []
        for i, dt in enumerate(self.meta["leaf_dtypes"]):
            a = npz[f"w{i:03d}"]
            if dt == "bfloat16":
                a = a.astype(jnp.bfloat16)
            # commit to device ONCE — numpy leaves would re-transfer the
            # whole parameter set on every call (seconds through a remote
            # TPU tunnel, milliseconds over PCIe — either way per-call)
            leaves.append(jax.device_put(a))
        self._weights = tuple(leaves)
        # jit over Exported.call caches the executable across invocations
        self._call = jax.jit(self._exported.call)

    def __call__(self, x, days, x_lens):
        """``x [B,T,C] f32``, ``days [B] i32``, ``x_lens [B] i32`` →
        ``(log_probs [B,T',K], out_lens [B])``. Shapes must match the
        exported envelope exactly (meta['batch_size'], meta['t_max']) —
        use :meth:`pad_batch` to fit raw trials to it."""
        return self._call(self._weights, x, days, x_lens)

    def pad_batch(self, trials, days=None):
        """Pad up to ``batch_size`` variable-length trials to the
        artifact envelope.

        ``trials``: sequence of ``[T_i, C]`` arrays (``T_i <= t_max``);
        ``days``: per-trial day indices (default 0). Returns
        ``(x [B, t_max, C], days [B], x_lens [B])`` ready for
        ``__call__`` — unused rows are zero with length 0, so their
        ``out_lens`` come back 0 and decode empty."""
        m = self.meta
        b, t, c = m["batch_size"], m["t_max"], m["n_channels"]
        if len(trials) > b:
            raise ValueError(
                f"{len(trials)} trials > artifact batch_size {b}"
            )
        x = np.zeros((b, t, c), np.float32)
        lens = np.zeros((b,), np.int32)
        day_arr = np.zeros((b,), np.int32)
        for i, tr in enumerate(trials):
            tr = np.asarray(tr, np.float32)
            if tr.shape[0] > t or tr.shape[1] != c:
                raise ValueError(
                    f"trial {i} shape {tr.shape} exceeds the artifact "
                    f"envelope (t_max={t}, n_channels={c}); re-export "
                    f"with a larger --t-max"
                )
            x[i, : tr.shape[0]] = tr
            lens[i] = tr.shape[0]
            if days is not None:
                day_arr[i] = int(days[i])
        return x, day_arr, lens


def load_exported(art_dir: str) -> ExportedModel:
    return ExportedModel(art_dir)


# -- streaming export --------------------------------------------------------

_STREAM_PRIME = "stream_prime.shlo"
_STREAM_STEP = "stream_step.shlo"
_STREAM_TAIL = "stream_tail.shlo"
_STREAM_META = "stream_meta.json"
_BEAM_INIT = "beam_init.shlo"
_BEAM_STEP = "beam_step.shlo"
_BEAM_FINAL = "beam_final.shlo"
_BEAM_META = "beam_meta.json"


def export_streaming(
    model_dir: str,
    out_dir: str,
    *,
    day_idx: int = 0,
    batch: int = 1,
    frames_per_chunk: int = 1,
    causal: bool = False,
) -> str:
    """Export the GRU streaming path as an AOT artifact.

    Two functions are serialized, both traced from the SAME bodies the
    live ``GRUStreamer`` runs (``streaming/engine.py``) so parity is by
    construction:

    - ``stream_prime.shlo``: ``(weights, raw0 [B, W, C]) ->
      (raw_ctx, bin_ctx, h, logits [B, F, K])`` — consumes the first
      ``W`` raw bins (left smoothing pad applied inside) and leaves the
      stream in its steady state, emitting the first ``F`` frames;
    - ``stream_step.shlo``: ``(weights, raw_ctx, bin_ctx, h, new
      [B, n, C]) -> (raw_ctx', bin_ctx', h', logits [B, F, K])`` — the
      single-dispatch steady-state chunk step (``n = stride * F`` raw
      bins per call).

    ``serving/streaming.py::ExportedStreamer`` drives these with only
    numpy + jax at serving time (buffering, flush padding, and the
    reference CTC-length truncation ``(T - kernel) // stride`` live
    there). One artifact serves one ``(batch, frames_per_chunk,
    day_idx)`` configuration.

    Conformer checkpoints (``model_type=transformer_ctc``, which must be
    ``causal=True``) export the analogous pair via
    ``export_streaming_conformer_params``; their step additionally
    carries KV/conv caches, the positional-encoding offset, and a
    real-bin mask (flush padding must be zero in the day-affined domain
    — see ``streaming/conformer.py::reset``).
    """
    from ..training.trainer import load_model

    params, model, _args = load_model(model_dir)
    if model.name == "transformer_ctc":
        return export_streaming_conformer_params(
            params, model.config, out_dir, day_idx=day_idx, batch=batch,
            frames_per_chunk=frames_per_chunk,
        )
    return export_streaming_params(
        params, model.config, out_dir, day_idx=day_idx, batch=batch,
        frames_per_chunk=frames_per_chunk, causal=causal,
    )


def export_streaming_params(
    params,
    cfg,
    out_dir: str,
    *,
    day_idx: int = 0,
    batch: int = 1,
    frames_per_chunk: int = 1,
    causal: bool = False,
) -> str:
    """``export_streaming`` from an in-memory ``(params, GRUConfig)``
    pair (the live ``GRUStreamer`` constructor's inputs)."""
    from ..streaming.engine import GRUStreamer

    st = GRUStreamer(
        params, cfg, day_idx, batch=batch,
        frames_per_chunk=frames_per_chunk, causal=causal,
    )
    k, s, n_f = cfg.kernel_len, cfg.stride_len, frames_per_chunk
    ks = int(np.asarray(st._taps).shape[0])
    pad_l = st.pad_left
    c = cfg.neural_dim
    n = s * n_f
    # W raw bins leave exactly residual k smoothed bins after the first
    # F frames: smoothed = pad_l + W - (ks-1) must equal k + n*1.
    w_prime = k + n + (ks - 1) - pad_l
    smooth_body = st._smooth_calibrate_body
    gru_frames = st._gru_frames_fn
    taps_pad_l = pad_l  # left zero seed, exactly GRUStreamer.reset()

    leaves, treedef = jax.tree.flatten(params)

    def _day(p):
        return p["day"]["weight"][day_idx], p["day"]["bias"][day_idx]

    def prime(weights, raw0):
        p = jax.tree.unflatten(treedef, list(weights))
        w_day, b_day = _day(p)
        window = jnp.concatenate(
            [jnp.zeros((batch, taps_pad_l, c), raw0.dtype), raw0], axis=1
        )
        cal = smooth_body(window, w_day, b_day)  # [B, k + n, C]
        h0 = jnp.zeros(
            (cfg.num_layers, batch, cfg.hidden_dim), cfg.compute_dtype
        )
        logits, h = gru_frames(p, cal[:, : k + (n_f - 1) * s], h0)
        raw_ctx = window[:, window.shape[1] - (ks - 1):]
        return raw_ctx, cal[:, n:], h, logits

    def step(weights, raw_ctx, bin_ctx, h, new):
        p = jax.tree.unflatten(treedef, list(weights))
        w_day, b_day = _day(p)
        window = jnp.concatenate([raw_ctx, new], axis=1)
        cal = smooth_body(window, w_day, b_day)
        bins = jnp.concatenate([bin_ctx, cal], axis=1)
        logits, h = gru_frames(p, bins[:, : k + (n_f - 1) * s], h)
        return (
            window[:, window.shape[1] - (ks - 1):],
            bins[:, n:],
            h,
            logits,
        )

    sds = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
    w_sds = tuple(sds(leaf) for leaf in leaves)
    f32 = jnp.float32
    prime_exp = jax_export.export(jax.jit(prime))(
        w_sds, jax.ShapeDtypeStruct((batch, w_prime, c), f32)
    )
    hdt = jnp.dtype(cfg.compute_dtype)
    step_exp = jax_export.export(jax.jit(step))(
        w_sds,
        jax.ShapeDtypeStruct((batch, ks - 1, c), f32),
        jax.ShapeDtypeStruct((batch, k, c), f32),
        jax.ShapeDtypeStruct((cfg.num_layers, batch, cfg.hidden_dim), hdt),
        jax.ShapeDtypeStruct((batch, n, c), f32),
    )

    os.makedirs(out_dir, exist_ok=True)
    for name, exp in ((_STREAM_PRIME, prime_exp), (_STREAM_STEP, step_exp)):
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())

    dtypes = _save_weights(out_dir, leaves)

    meta = {
        "kind": "gru_stream",
        "batch": batch,
        "frames_per_chunk": n_f,
        "chunk_bins": n,
        "prime_bins": w_prime,
        "kernel_len": k,
        "stride_len": s,
        "smooth_taps": ks,
        "n_channels": c,
        "n_classes": cfg.n_out,
        "day_idx": day_idx,
        "causal": causal,
        "outputs": "logits [B, F, K] (pre-softmax)",
        "n_leaves": len(leaves),
        "leaf_dtypes": dtypes,
        "platforms": list(step_exp.platforms),
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, _STREAM_META), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


def export_streaming_conformer_params(
    params,
    cfg,
    out_dir: str,
    *,
    day_idx: int = 0,
    batch: int = 1,
    frames_per_chunk: int = 1,
) -> str:
    """``export_streaming`` for the causal Conformer: prime/step pair
    traced from the live ``ConformerStreamer`` bodies.

    ``stream_prime.shlo``: ``(weights, raw0 [B,W,C], mask0 [W]) ->
    (raw_ctx, bin_ctx, kv_k, kv_v, conv_ctx, log_probs [B,F,K])``;
    ``stream_step.shlo``: ``(weights, raw_ctx, bin_ctx, kv_k, kv_v,
    conv_ctx, offset i32, new [B,n,C], mask [n]) -> same``.

    ``mask`` marks which of the raw bins are real (1.0) vs flush padding
    (0.0): the offline forward zero-pads AFTER the day affine, so padded
    bins must enter the smoother as affined-domain zeros — masking the
    affined values reproduces that without a separate padded entry point
    (``streaming/conformer.py::reset`` documents the domain).
    """
    from ..streaming.conformer import ConformerStreamer

    st = ConformerStreamer(
        params, cfg, day_idx, batch=batch, frames_per_chunk=frames_per_chunk
    )
    k, s, n_f = cfg.temporal_kernel, cfg.temporal_stride, frames_per_chunk
    ks = st.k_smooth
    pad_l = st.pad_left
    c = cfg.n_channels
    d = cfg.latent_dim
    nl, nh = cfg.num_layers, cfg.num_heads
    dh = d // nh
    lc = cfg.attn_left_context
    kc = cfg.conv_kernel
    cdt = jnp.dtype(cfg.compute_dtype)
    n = s * n_f
    w_prime = k + n + (ks - 1) - pad_l

    affine_body = st._affine_body
    smooth_body = st._smooth_body
    body = st._make_body(n_f)
    body1 = st._make_body(1) if n_f > 1 else None

    leaves, treedef = jax.tree.flatten(params)

    def _day(p):
        return p["day"]["weight"][day_idx], p["day"]["bias"][day_idx]

    def _zero_caches():
        return (
            jnp.zeros((nl, batch, nh, lc, dh), cdt),
            jnp.zeros((nl, batch, nh, lc, dh), cdt),
            jnp.zeros((nl, batch, kc - 1, d), cdt),
        )

    def prime(weights, raw0, mask0):
        p = jax.tree.unflatten(treedef, list(weights))
        w_day, b_day = _day(p)
        aff = affine_body(raw0, w_day, b_day) * mask0[None, :, None].astype(
            cdt
        )
        window = jnp.concatenate(
            [jnp.zeros((batch, pad_l, c), cdt), aff], axis=1
        )
        sm = smooth_body(window)  # [B, k + n, C]
        logp, caches = body(p, sm[:, : k + (n_f - 1) * s], _zero_caches(), 0)
        raw_ctx = window[:, window.shape[1] - (ks - 1):]
        return (raw_ctx, sm[:, n:]) + caches + (logp,)

    def step(weights, raw_ctx, bin_ctx, kv_k, kv_v, conv_ctx, offset, new,
             mask):
        p = jax.tree.unflatten(treedef, list(weights))
        w_day, b_day = _day(p)
        aff = affine_body(new, w_day, b_day) * mask[None, :, None].astype(cdt)
        window = jnp.concatenate([raw_ctx, aff], axis=1)
        sm = smooth_body(window)
        bins = jnp.concatenate([bin_ctx, sm], axis=1)
        logp, caches = body(
            p, bins[:, : k + (n_f - 1) * s], (kv_k, kv_v, conv_ctx), offset
        )
        raw_ctx = window[:, window.shape[1] - (ks - 1):]
        return (raw_ctx, bins[:, n:]) + caches + (logp,)

    def tail(weights, raw_ctx, bin_ctx, kv_k, kv_v, conv_ctx, offset, new,
             mask):
        """1-frame step for the flush tail (mirrors
        ``streaming/conformer.py::_drain``'s one-frame holdback so the
        stream realizes exactly the reference CTC length)."""
        p = jax.tree.unflatten(treedef, list(weights))
        w_day, b_day = _day(p)
        aff = affine_body(new, w_day, b_day) * mask[None, :, None].astype(cdt)
        window = jnp.concatenate([raw_ctx, aff], axis=1)
        sm = smooth_body(window)
        bins = jnp.concatenate([bin_ctx, sm], axis=1)
        logp, caches = body1(p, bins[:, :k], (kv_k, kv_v, conv_ctx), offset)
        raw_ctx = window[:, window.shape[1] - (ks - 1):]
        return (raw_ctx, bins[:, s:]) + caches + (logp,)

    sds = jax.ShapeDtypeStruct
    w_sds = tuple(sds(leaf.shape, leaf.dtype) for leaf in leaves)
    f32 = jnp.float32
    prime_exp = jax_export.export(jax.jit(prime))(
        w_sds, sds((batch, w_prime, c), f32), sds((w_prime,), f32)
    )
    state_sds = (
        sds((batch, ks - 1, c), cdt),
        sds((batch, k, c), cdt),
        sds((nl, batch, nh, lc, dh), cdt),
        sds((nl, batch, nh, lc, dh), cdt),
        sds((nl, batch, kc - 1, d), cdt),
        sds((), jnp.int32),
    )
    step_exp = jax_export.export(jax.jit(step))(
        w_sds, *state_sds, sds((batch, n, c), f32), sds((n,), f32)
    )

    os.makedirs(out_dir, exist_ok=True)
    blobs = [(_STREAM_PRIME, prime_exp), (_STREAM_STEP, step_exp)]
    if body1 is not None:
        tail_exp = jax_export.export(jax.jit(tail))(
            w_sds, *state_sds, sds((batch, s, c), f32), sds((s,), f32)
        )
        blobs.append((_STREAM_TAIL, tail_exp))
    for name, exp in blobs:
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
    dtypes = _save_weights(out_dir, leaves)

    meta = {
        "kind": "conformer_stream",
        "batch": batch,
        "frames_per_chunk": n_f,
        "chunk_bins": n,
        "prime_bins": w_prime,
        "kernel_len": k,
        "stride_len": s,
        "smooth_taps": ks,
        "n_channels": c,
        "n_classes": cfg.n_classes + 1,
        "max_pos_len": cfg.max_pos_len,
        # round-5 artifacts compute streaming PE on the fly
        # (sinusoidal_pos_rows) — no session-length cap; the driver keeps
        # the max_pos_len budget check only for pre-round-5 artifacts.
        "pe_unbounded": True,
        "day_idx": day_idx,
        "has_tail": body1 is not None,
        "outputs": "log_probs [B, F, K] (log-softmax)",
        "n_leaves": len(leaves),
        "leaf_dtypes": dtypes,
        "platforms": list(step_exp.platforms),
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, _STREAM_META), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


# -- on-device n-best beam export --------------------------------------------


def export_beam(
    out_dir: str,
    *,
    batch: int,
    n_classes: int,
    beam_width: int = 8,
    top_k_tokens: int = 8,
    max_len: int = 512,
) -> str:
    """Export the on-device CTC prefix beam search
    (``decoding/ondevice_beam.py``) as three blobs alongside a streaming
    (or batch) artifact:

    - ``beam_init.shlo``: ``() -> state`` (one live empty prefix per
      stream);
    - ``beam_step.shlo``: ``(state..., logits [B,1,K]) -> state`` — one
      frame's beam update; ``log_softmax`` is applied inside (idempotent,
      so raw-logit GRU artifacts and log-prob Conformer artifacts both
      feed it verbatim);
    - ``beam_final.shlo``: ``state -> (prefixes [B,W,L], lens, scores)``
      sorted best-first.

    Carrying the state across per-frame calls is exactly
    chunk-boundary-invariant (``streaming/engine.py::decode_beam``
    contract). ``state`` is the flattened 5-array ``BeamState``.
    """
    from ..decoding.ondevice_beam import (
        BeamState,
        beam_extend,
        beam_finalize,
        beam_init,
    )

    def init():
        return tuple(beam_init(batch, beam_width, max_len))

    def step(prefixes, lens, last, p_b, p_nb, logits):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        st = beam_extend(
            BeamState(prefixes, lens, last, p_b, p_nb), lp,
            top_k_tokens=top_k_tokens,
        )
        return tuple(st)

    def final(prefixes, lens, last, p_b, p_nb):
        return beam_finalize(BeamState(prefixes, lens, last, p_b, p_nb))

    sds = jax.ShapeDtypeStruct
    i32, f32 = jnp.int32, jnp.float32
    state_sds = (
        sds((batch, beam_width, max_len), i32),
        sds((batch, beam_width), i32),
        sds((batch, beam_width), i32),
        sds((batch, beam_width), f32),
        sds((batch, beam_width), f32),
    )
    init_exp = jax_export.export(jax.jit(init))()
    step_exp = jax_export.export(jax.jit(step))(
        *state_sds, sds((batch, 1, n_classes), f32)
    )
    final_exp = jax_export.export(jax.jit(final))(*state_sds)

    os.makedirs(out_dir, exist_ok=True)
    for name, exp in (
        (_BEAM_INIT, init_exp),
        (_BEAM_STEP, step_exp),
        (_BEAM_FINAL, final_exp),
    ):
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
    meta = {
        "batch": batch,
        "n_classes": n_classes,
        "beam_width": beam_width,
        "top_k_tokens": top_k_tokens,
        "max_len": max_len,
        "platforms": list(step_exp.platforms),
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, _BEAM_META), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir
