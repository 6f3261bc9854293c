"""Streaming (chunked) inference with carried recurrent state.

Real-time BCI decoding requires emitting phonemes while neural data arrives.
The reference has no streaming path; its unidirectional GRU mode
(``model.py:20,76-81,104-117``) is causal except for the Gaussian smoother's
"same" padding, which looks ``k - 1 - (k-1)//2`` bins into the future (10
bins at the default 20 taps — SURVEY.md §5 long-context notes).

``GRUStreamer`` reproduces the offline unidirectional forward **exactly**,
chunk-boundary-invariantly, by:
  * buffering raw bins until each smoothed bin's full receptive field has
    arrived (structural lookahead latency: 10 bins = 200 ms at 50 Hz; a
    ``causal=True`` mode trades parity for zero lookahead);
  * carrying the depthwise-smoothed + day-calibrated bin context needed by
    the overlapping unfold (kernel 32 / stride 4 ⇒ 28 bins);
  * carrying per-layer GRU hidden states across chunks (exact: the GRU
    recurrence has no horizon);
  * running one fixed-shape jitted step per emitted frame group, so the
    compiled path never re-traces regardless of how audio arrives.

``flush()`` applies the offline right-zero-padding semantics to the tail so
a fully streamed utterance bit-matches the offline forward over the frames
it emits. The stream realizes exactly the reference CTC length
``(T - k) // s`` (``ops/unfold.py::ctc_input_lengths``) via a one-frame
holdback in ``_drain`` — one frame fewer than the unfold produces — so
streamed decodes match the trainer's eval decode rather than over-decoding
a final frame the reference pipeline ignores.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gru import GRUConfig
from ..ops.gaussian import gaussian_kernel, same_padding


class GRUStreamer:
    """Chunked streaming decoder for the unidirectional GRU model.

    Args:
      params: GRU parameter pytree (``init_gru_params`` layout).
      cfg: model config; ``bidirectional`` must be False.
      day_idx: recording-day index for the session being streamed.
      batch: number of parallel streams.
      frames_per_chunk: frames emitted per jitted step (chunk size in bins =
        ``frames_per_chunk * stride``).
      causal: if True, skip the smoother's future taps (zero lookahead, no
        offline parity); if False (default), buffer 10 bins of lookahead and
        match the offline forward exactly.
    """

    def __init__(
        self,
        params,
        cfg: GRUConfig,
        day_idx: int,
        *,
        batch: int = 1,
        frames_per_chunk: int = 1,
        causal: bool = False,
    ):
        if cfg.bidirectional:
            raise ValueError(
                "streaming requires the unidirectional GRU mode "
                "(bidirectional back-states depend on future input)"
            )
        self.cfg = cfg
        self.batch = batch
        self.frames_per_chunk = frames_per_chunk
        self.causal = causal
        if cfg.gaussian_smooth_width <= 0:
            # offline gaussian_smooth is a no-op for sigma<=0; building the
            # Gaussian taps would divide by zero and emit all-NaN logits
            self.k_smooth = 1
            pad_l = pad_r = 0
            taps = np.ones((1,), np.float32)
        else:
            self.k_smooth = cfg.gaussian_kernel_size
            pad_l, pad_r = same_padding(self.k_smooth)
            taps = gaussian_kernel(self.k_smooth, cfg.gaussian_smooth_width)
            if causal:
                taps = taps[: pad_l + 1] / taps[: pad_l + 1].sum()
        self.lookahead = 0 if causal else pad_r
        self.pad_left = pad_l
        self._taps = jnp.asarray(taps)

        # Bake the day calibration into a single affine.
        self._w_day = params["day"]["weight"][day_idx]
        self._b_day = params["day"]["bias"][day_idx]
        self._params = jax.device_put(params)
        smooth, gru_step, gru_frames = self._build_step()
        self._step = (smooth, gru_step)
        self._gru_frames_fn = gru_frames
        self._fused_cache: dict = {}  # steady bin-residual width -> jit step
        self.reset()

    # -- state ------------------------------------------------------------
    def reset(self) -> None:
        c = self.cfg.neural_dim
        # Raw bins not yet smoothed-and-consumed. Seeded with the left zero
        # padding so smooth[0] sees the same window as the offline conv.
        self._raw = np.zeros((self.batch, self.pad_left, c), np.float32)
        # Smoothed+calibrated bins awaiting unfold consumption.
        self._bins = np.zeros((self.batch, 0, c), np.float32)
        self._h = jnp.zeros(
            (self.cfg.num_layers, self.batch, self.cfg.hidden_dim),
            self.cfg.compute_dtype,
        )
        self._flushed = False
        self._fast_state = None  # on-device (raw_ctx, bin_ctx, h) once steady
        self._decode_prev = np.full((self.batch,), -1, np.int64)
        self._beam_state = None  # carried on-device n-best beam state

    # -- jitted pieces ------------------------------------------------------
    def _build_step(self):
        cfg = self.cfg
        k, s = cfg.kernel_len, cfg.stride_len
        n_f = self.frames_per_chunk
        taps = self._taps

        def smooth_calibrate_body(raw_window, w_day, b_day):
            """raw_window: [B, n + k_smooth - 1, C] -> [B, n, C] smoothed,
            day-affined, softsigned bins (VALID conv — context explicit).
            Shared by the drain path and the fused fast path — one copy of
            the preprocessing semantics."""
            c = raw_window.shape[-1]
            kernel = jnp.tile(taps[:, None, None], (1, 1, c)).astype(
                raw_window.dtype
            )
            sm = jax.lax.conv_general_dilated(
                raw_window, kernel, (1,), [(0, 0)],
                dimension_numbers=("NTC", "TIO", "NTC"), feature_group_count=c,
            )
            y = jnp.einsum("btd,dk->btk", sm, w_day) + b_day
            return jax.nn.soft_sign(y)

        self._smooth_calibrate_body = smooth_calibrate_body
        smooth_calibrate = jax.jit(smooth_calibrate_body)

        def gru_frames(params, frame_bins, h):
            """frame_bins: [B, k + (n_f-1)*s, C] bins covering n_f frames.
            Returns (logits [B, n_f, K], h'). ``params`` is a jit ARGUMENT
            (closure-captured weights embed as HLO constants — megabytes
            of program per compiled variant, and an oversized remote-
            compile request through the axon tunnel)."""
            b = frame_bins.shape[0]
            x = frame_bins.astype(cfg.compute_dtype)
            # unfold into n_f frames, torch layout (c*k + j)
            idx = jnp.arange(n_f)[:, None] * s + jnp.arange(k)[None, :]
            win = x[:, idx, :]  # [B, n_f, k, C]
            feats = jnp.transpose(win, (0, 1, 3, 2)).reshape(b, n_f, -1)
            out = feats
            for li, lp in enumerate(params["gru"]["layers"]):
                xp = (
                    jnp.einsum(
                        "bnf,fk->bnk", out, lp["w_ih"][0].astype(out.dtype),
                        preferred_element_type=jnp.float32,
                    )
                    + lp["b_ih"][0]
                ).astype(cfg.compute_dtype)

                def scan_fn(hh, xp_t, w=lp["w_hh"][0], bb=lp["b_hh"][0]):
                    hp = jnp.einsum(
                        "bh,hk->bk", hh, w.astype(hh.dtype),
                        preferred_element_type=jnp.float32,
                    ) + bb.astype(jnp.float32)
                    hd = cfg.hidden_dim
                    xt = xp_t.astype(jnp.float32)
                    r = jax.nn.sigmoid(xt[:, :hd] + hp[:, :hd])
                    z = jax.nn.sigmoid(xt[:, hd:2*hd] + hp[:, hd:2*hd])
                    n = jnp.tanh(xt[:, 2*hd:] + r * hp[:, 2*hd:])
                    hn = ((1 - z) * n + z * hh.astype(jnp.float32)).astype(
                        cfg.compute_dtype
                    )
                    return hn, hn

                h_li, ys = jax.lax.scan(
                    scan_fn, h[li], jnp.transpose(xp, (1, 0, 2))
                )
                h = h.at[li].set(h_li)
                out = jnp.transpose(ys, (1, 0, 2))
            logits = (
                jnp.einsum(
                    "bnh,hk->bnk", out, params["fc"]["weight"].astype(out.dtype),
                    preferred_element_type=jnp.float32,
                )
                + params["fc"]["bias"]
            )
            return logits, h

        gru_step = partial(jax.jit, donate_argnums=(2,))(gru_frames)
        return smooth_calibrate, gru_step, gru_frames

    def _build_fused_step(self, residual: int):
        """Single-dispatch steady-state step with on-device carried state.

        Once the stream is warm, every host round trip costs a full tunnel/
        PCIe RT (~31 ms through the remote axon tunnel, ~0.1 ms locally), so
        the whole smooth→calibrate→unfold→GRU→head chunk path runs as ONE
        donated jit call over (raw_ctx, bin_ctx, h).

        ``residual`` is the steady bin-buffer width between chunks (a
        stream-phase constant in ``[k-s, k+(F-1)s)``); the compiled step is
        cached per width.
        """
        cfg = self.cfg
        k, s = cfg.kernel_len, cfg.stride_len
        n_f = self.frames_per_chunk
        ks = int(np.asarray(self._taps).shape[0])
        smooth_calibrate_body = self._smooth_calibrate_body
        gru_frames = self._gru_frames_fn

        @partial(jax.jit, donate_argnums=(3,))
        def fused(params, w_day, b_day, state, new):
            raw_ctx, bin_ctx, h = state
            window = jnp.concatenate([raw_ctx, new], axis=1)
            cal = smooth_calibrate_body(window, w_day, b_day)
            bins = jnp.concatenate([bin_ctx, cal], axis=1)
            # Frames consume bins[0 : k+(n_f-1)s]; residual bins carry over.
            logits, h = gru_frames(params, bins[:, : k + (n_f - 1) * s], h)
            # positive-index slice: -(ks-1) would keep the WHOLE window
            # when ks == 1 (1-tap smoothing) and grow state every chunk
            new_state = (
                window[:, window.shape[1] - (ks - 1):],
                bins[:, s * n_f:],
                h,
            )
            return logits, new_state

        del residual  # static via bin_ctx shape; kept for cache keying
        return fused

    # -- public API --------------------------------------------------------
    def process(self, new_bins: np.ndarray) -> np.ndarray:
        """Feed ``[B, n, C]`` new raw bins; returns ``[B, m, K]`` logits for
        every frame that became fully determined (m may be 0)."""
        return np.asarray(self.process_async(new_bins))

    def process_async(self, new_bins) -> jax.Array | np.ndarray:
        """Like ``process`` but, on the steady-state fast path, returns the
        device array without blocking — pipelined consumers (decoders) can
        chain further device work before any host sync."""
        assert not self._flushed, "stream already flushed; call reset()"
        fast_n = self.cfg.stride_len * self.frames_per_chunk
        if self._fast_state is not None:
            if new_bins.shape[1] == fast_n:
                w0 = self._fast_state[1].shape[1]
                fused = self._fused_cache.get(w0)
                if fused is None:  # NOTE: setdefault would rebuild (and
                    # recompile) the jit wrapper on every call
                    fused = self._fused_cache[w0] = self._build_fused_step(w0)
                logits, self._fast_state = fused(
                    self._params, self._w_day, self._b_day,
                    self._fast_state, jnp.asarray(new_bins, jnp.float32),
                )
                return logits
            self._demote()
        self._raw = np.concatenate(
            [self._raw, np.asarray(new_bins, np.float32)], axis=1
        )
        out = self._drain()
        self._maybe_promote()
        return out

    def _maybe_promote(self) -> None:
        ks = int(np.asarray(self._taps).shape[0])
        k, s = self.cfg.kernel_len, self.cfg.stride_len
        n_f = self.frames_per_chunk
        w0 = self._bins.shape[1]
        # steady residual sits in [k, k + n_f*s) under the one-frame
        # holdback (see _drain) — the fused body is residual-agnostic
        if (
            self._raw.shape[1] == ks - 1
            and k <= w0 < k + n_f * s
        ):
            self._fast_state = (
                jnp.asarray(self._raw),
                jnp.asarray(self._bins),
                self._h,
            )

    def _demote(self) -> None:
        raw_ctx, bin_ctx, h = self._fast_state
        self._raw = np.asarray(raw_ctx)
        self._bins = np.asarray(bin_ctx)
        self._h = h
        self._fast_state = None

    def flush(self) -> np.ndarray:
        """Apply offline right-padding semantics to the tail and emit the
        remaining frames."""
        assert not self._flushed
        if self._fast_state is not None:
            self._demote()
        self._flushed = True
        if self.lookahead > 0:
            pad = np.zeros(
                (self.batch, self.lookahead, self.cfg.neural_dim), np.float32
            )
            self._raw = np.concatenate([self._raw, pad], axis=1)
        return self._drain(final=True)

    def _drain(self, final: bool = False) -> np.ndarray:
        smooth_calibrate, gru_step = self._step
        ks = len(np.asarray(self._taps))
        # 1. Smooth every raw bin whose full window is present.
        n_smoothable = self._raw.shape[1] - (ks - 1)
        if n_smoothable > 0:
            window = jnp.asarray(self._raw[:, : n_smoothable + ks - 1])
            sm = np.asarray(
                smooth_calibrate(window, self._w_day, self._b_day)
            )
            self._bins = np.concatenate([self._bins, sm], axis=1)
            self._raw = self._raw[:, n_smoothable:]
        # 2. Consume bins into frames (k per frame, advancing by s).
        k, s = self.cfg.kernel_len, self.cfg.stride_len
        n_f = self.frames_per_chunk
        out = []
        need = k + (n_f - 1) * s
        # One-frame holdback: a frame is emitted only once a FURTHER frame
        # is known to exist (its window plus one more stride of bins), and
        # the flush tail stops at `k + s`, never emitting the final
        # fitting frame — so the stream realizes exactly the reference CTC
        # length (len - k) // s (ops/unfold.py::ctc_input_lengths), one
        # frame fewer than the unfold produces, matching the trainer's
        # eval decode instead of over-decoding a frame the reference
        # pipeline ignores.
        while self._bins.shape[1] >= need + s:
            chunk = jnp.asarray(self._bins[:, :need])
            logits, self._h = gru_step(self._params, chunk, self._h)
            out.append(np.asarray(logits))
            self._bins = self._bins[:, n_f * s :]
        if final and self._bins.shape[1] >= k + s:
            # Tail frames, one at a time (fewer than frames_per_chunk left).
            while self._bins.shape[1] >= k + s:
                chunk = jnp.asarray(self._bins[:, :k])
                logits, self._h = self._single_frame(chunk)
                out.append(np.asarray(logits))
                self._bins = self._bins[:, s:]
        if out:
            return np.concatenate(out, axis=1)
        return np.zeros(
            (self.batch, 0, self.cfg.n_out), np.float32
        )

    def decode_greedy(self, logits: np.ndarray) -> list[list[int]]:
        """Incrementally greedy-decode newly emitted logits.

        Maintains the CTC collapse state (previous argmax token) across
        calls, so feeding chunk outputs one by one yields exactly the
        phoneme stream an offline argmax → collapse-repeats → drop-blank
        pass would produce. ``reset()`` clears the collapse state along with
        the stream buffers (pinned by ``test_reset_decode_state``).
        Returns newly emitted label IDs per stream.
        """
        from ..utils.greedy import incremental_greedy

        return incremental_greedy(logits, self._decode_prev)

    def decode_beam(
        self,
        logits,
        *,
        beam_width: int = 8,
        top_k_tokens: int = 8,
        max_len: int = 512,
    ):
        """Incrementally prefix-beam-decode newly emitted logits on device.

        Carries the full n-best ``BeamState`` across calls, so feeding
        chunk outputs one by one is exactly chunk-boundary-invariant: after
        the last chunk the n-best equals an offline
        ``prefix_beam_search`` over the concatenated logits (same widths).
        Accepts the device array from ``process_async`` directly — the
        beam update chains on device without a host sync.

        Returns ``(prefixes [B, W, max_len], lens [B, W], scores [B, W])``
        sorted best-first (the current n-best; cheap to call per chunk).
        """
        from ..decoding.ondevice_beam import (
            beam_extend,
            beam_finalize,
            beam_init,
        )

        if self._beam_state is None:
            self._beam_state = beam_init(self.batch, beam_width, max_len)
        elif self._beam_state.prefixes.shape[1:] != (beam_width, max_len):
            raise ValueError(
                "decode_beam width/max_len changed mid-stream "
                f"(carried state is W={self._beam_state.prefixes.shape[1]}, "
                f"max_len={self._beam_state.prefixes.shape[2]}); call "
                "reset() to start a new search"
            )
        if logits.shape[1]:
            log_probs = jax.nn.log_softmax(
                jnp.asarray(logits, jnp.float32), axis=-1
            )
            self._beam_state = beam_extend(
                self._beam_state, log_probs, top_k_tokens=top_k_tokens
            )
        return beam_finalize(self._beam_state)

    def _single_frame(self, chunk):
        if not hasattr(self, "_step1"):
            saved = self.frames_per_chunk
            self.frames_per_chunk = 1
            try:
                self._step1 = self._build_step()[1]
            finally:
                self.frames_per_chunk = saved
        return self._step1(self._params, chunk, self._h)
