"""Chunked streaming inference for the causal Conformer.

The reference Conformer (``transformer_ctc.py:333-501``) is bidirectional
(full self-attention) and cannot stream, exactly like the reference GRU's
bidirectional default (SURVEY.md §5). ``ConformerConfig(causal=True)``
defines the streaming-compatible variant — banded self-attention with a
finite left context and causal depthwise convs — and this module runs its
offline forward **incrementally**, chunk-boundary-invariantly:

  * raw bins buffer until each smoothed bin's full 9-tap receptive field
    has arrived (same structural-lookahead policy as ``GRUStreamer``);
  * the strided frontend conv carries its ``k - s`` bin overlap;
  * every ConformerBlock carries a fixed-size K/V cache of the last
    ``attn_left_context`` frames (the attention window) and the
    ``conv_kernel - 1`` GLU frames its causal depthwise conv needs;
  * the sinusoidal positional encoding is computed on the fly from the
    absolute frame offset (``sinusoidal_pos_rows``) — sessions have NO
    length cap (the offline ``max_pos_len`` table bound is offline-only);
  * one fixed-shape jitted step per chunk (state donated — the caches
    update in place on device).

``flush()`` applies the offline right-padding semantics so a fully
streamed utterance matches ``conformer_forward`` on the same causal
config to fp32 round-off (pinned by ``tests/test_conformer_streaming.py``)
over the frames it emits. The stream realizes exactly the reference CTC
length ``(T - k) // s`` (``conformer_output_lengths``) via a one-frame
holdback in ``_drain``, so streamed decodes match the trainer's eval
decode rather than over-decoding a final frame the reference ignores.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.conformer import (
    ConformerConfig,
    _layer_norm,
    _linear,
    sinusoidal_pos_rows,
)
from ..ops.gaussian import gaussian_kernel


class ConformerStreamer:
    """Chunked streaming decoder for the causal Conformer.

    Args:
      params: Conformer parameter pytree (``init_conformer_params``).
      cfg: model config; ``causal`` must be True (``bidirectional``
        attention cannot stream), ``qkv_interleaved`` must be False.
      day_idx: recording-day index for the session being streamed.
      batch: number of parallel streams.
      frames_per_chunk: encoder frames emitted per jitted step (chunk size
        in bins = ``frames_per_chunk * temporal_stride``).
    """

    def __init__(
        self,
        params,
        cfg: ConformerConfig,
        day_idx: int,
        *,
        batch: int = 1,
        frames_per_chunk: int = 1,
    ):
        if not cfg.causal:
            raise ValueError(
                "streaming requires ConformerConfig(causal=True) — full "
                "self-attention depends on future frames"
            )
        if cfg.qkv_interleaved:
            raise ValueError("streaming uses the canonical qkv layout")
        self.cfg = cfg
        self.batch = batch
        self.frames_per_chunk = frames_per_chunk

        from ..ops.gaussian import conformer_kernel_size

        self.k_smooth = (
            conformer_kernel_size(cfg.gaussian_smooth_width)
            if cfg.gaussian_smooth_width > 0 else 1
        )
        if self.k_smooth % 2 == 0:
            # offline conformer_frontend pads (ks//2, ks//2) = ks total for
            # even kernels and emits T+1 smoothed bins — a one-bin-per-bin
            # streamer cannot reproduce that; fail loudly rather than
            # silently diverge (sigma values where int(4*sigma) is odd).
            raise ValueError(
                f"gaussian_smooth_width={cfg.gaussian_smooth_width} gives "
                f"an even smoothing kernel ({self.k_smooth} taps), whose "
                f"offline padding emits T+1 bins — unsupported for "
                f"streaming; pick a width with odd int(4*width)+1"
            )
        pad_l, pad_r = self.k_smooth // 2, self.k_smooth - 1 - self.k_smooth // 2
        self.pad_left, self.lookahead = pad_l, pad_r
        taps = (
            gaussian_kernel(self.k_smooth, cfg.gaussian_smooth_width)
            if self.k_smooth > 1 else np.ones((1,), np.float32)
        )
        self._taps = jnp.asarray(taps)
        self._w_day = params["day"]["weight"][day_idx]
        self._b_day = params["day"]["bias"][day_idx]
        # Params are a jit ARGUMENT (not a closure capture): closed-over
        # arrays embed as HLO constants, which at 8-block scale makes the
        # program megabytes large (and overflows the remote-compile
        # request through the axon tunnel).
        self._params = jax.device_put(params)
        self._affine, self._prep = self._build_prep()
        self._steps: dict[int, callable] = {}
        # steady bin-residual width -> jitted single-dispatch step. Lives
        # in __init__ (like GRUStreamer's, engine.py:94) so the compiled
        # fast path survives per-utterance reset() calls — recompiling it
        # every utterance would cost a full re-trace per stream restart.
        self._fused_cache: dict = {}
        self.reset()

    # -- state ------------------------------------------------------------
    def reset(self) -> None:
        cfg = self.cfg
        c, b = cfg.n_channels, self.batch
        nl, nh = cfg.num_layers, cfg.num_heads
        dh = cfg.latent_dim // nh
        lc = cfg.attn_left_context
        kc = cfg.conv_kernel
        cdt = cfg.compute_dtype
        # _raw holds DAY-AFFINED bins: the offline forward zero-pads the
        # smoother AFTER the day affine (conformer_frontend), so the
        # streamer's left-seed / flush padding must be zeros in the
        # affined domain — raw-domain zeros would smooth in affine(0) =
        # the day bias at utterance edges (nonzero for trained models).
        self._raw = np.zeros((b, self.pad_left, c), np.float32)
        self._bins = np.zeros((b, 0, c), np.float32)
        self._offset = 0  # frames emitted so far
        self._caches = (
            jnp.zeros((nl, b, nh, lc, dh), cdt),   # K cache
            jnp.zeros((nl, b, nh, lc, dh), cdt),   # V cache
            jnp.zeros((nl, b, kc - 1, cfg.latent_dim), cdt),  # conv ctx
        )
        self._flushed = False
        self._decode_prev = np.full((b,), -1, np.int64)
        # single-dispatch fast path (engaged once the stream is steady):
        # (raw_ctx, bin_ctx, caches, offset) carried on device
        self._fast_state = None
        self._beam_state = None

    # -- jitted pieces ------------------------------------------------------
    def _build_prep(self):
        """Two jitted stages mirroring the offline op order (affine, THEN
        zero-padded smooth): ``affine`` maps incoming real raw bins into
        the day-calibrated domain; ``prep`` VALID-smooths an affined
        window. The smooth body is shared with the fused fast path via
        ``self._smooth_body``."""
        taps = self._taps
        cdt = self.cfg.compute_dtype

        def affine_body(raw, w_day, b_day):
            x = raw.astype(cdt)
            return (
                jnp.einsum("btd,dk->btk", x, w_day.astype(cdt),
                           preferred_element_type=jnp.float32)
                + b_day.astype(jnp.float32)
            ).astype(cdt)

        def smooth_body(y):
            c = y.shape[-1]
            kernel = jnp.tile(taps[:, None, None], (1, 1, c)).astype(y.dtype)
            return jax.lax.conv_general_dilated(
                y, kernel, (1,), [(0, 0)],
                dimension_numbers=("NTC", "TIO", "NTC"),
                feature_group_count=c,
            )

        self._affine_body = affine_body
        self._smooth_body = smooth_body

        @jax.jit
        def affine(raw, w_day, b_day):
            return affine_body(raw, w_day, b_day)

        @jax.jit
        def prep(affined_window):
            return smooth_body(affined_window.astype(cdt))

        return affine, prep

    def _step_for(self, n_f: int):
        fn = self._steps.get(n_f)
        if fn is None:
            fn = self._steps[n_f] = jax.jit(
                self._make_body(n_f), donate_argnums=(2,)
            )
        return fn

    def _make_body(self, n_f: int):
        """The un-jitted frames body: shared by the 2-dispatch drain path
        (prep + step) and the fused single-dispatch fast path."""
        cfg = self.cfg
        k, s = cfg.temporal_kernel, cfg.temporal_stride
        nh = cfg.num_heads
        d = cfg.latent_dim
        dh = d // nh
        # lc is both the KV-cache width AND the banded-mask horizon — the
        # cache/mask invariant (cached keys cover exactly the attendable
        # band) only holds because they are the same value
        lc = cfg.attn_left_context
        kc = cfg.conv_kernel
        cdt = cfg.compute_dtype

        def ff(p, z):
            h = _linear(p["lin1"], _layer_norm(p["ln"], z))
            return _linear(p["lin2"], jax.nn.silu(h))

        def step(params, bins, caches, offset):
            """bins: [B, k+(n_f-1)s, C] smoothed+affined bins covering n_f
            frames; caches: (kv_k, kv_v, conv_ctx); offset: frames already
            emitted. Returns (log_probs [B, n_f, K], new_caches)."""
            kv_k, kv_v, conv_ctx = caches
            b = bins.shape[0]
            x = bins.astype(cdt)
            # frontend: depthwise strided conv (VALID) -> proj -> LN
            kernel = params["frontend"]["tconv_w"][:, None, :]
            z = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), window_strides=(s,),
                padding=[(0, 0)],
                dimension_numbers=("NTC", "TIO", "NTC"),
                feature_group_count=x.shape[-1],
            )  # [B, n_f, C]
            z = _linear(params["frontend"]["proj"], z)
            z = _layer_norm(params["frontend"]["ln"], z)
            z = _linear(
                params["bottleneck"]["lin2"],
                jax.nn.relu(_linear(params["bottleneck"]["lin1"], z)),
            )
            # On-the-fly sinusoidal PE rows: streams have NO length cap
            # (the offline table bound applies to offline batches only).
            z = z + sinusoidal_pos_rows(offset, n_f, d, cdt)[None, :, :]

            qpos = offset + jnp.arange(n_f)[:, None]           # [n_f, 1]
            kpos = offset - lc + jnp.arange(lc + n_f)[None, :]  # [1, lc+n_f]
            ok = (kpos >= 0) & (kpos <= qpos) & (qpos - kpos <= lc)

            new_k, new_v, new_cc = [], [], []
            for li, bp in enumerate(params["blocks"]):
                z = z + 0.5 * ff(bp["ff1"], z)
                # banded attention over cached + new keys
                xn = _layer_norm(bp["attn"]["ln"], z)
                qkv = (
                    jnp.einsum("bnd,dk->bnk", xn,
                               bp["attn"]["in_proj_w"].astype(z.dtype),
                               preferred_element_type=jnp.float32)
                    + bp["attn"]["in_proj_b"].astype(jnp.float32)
                ).astype(z.dtype)
                q, kn, vn = jnp.split(qkv, 3, axis=-1)

                def heads(a):
                    return a.reshape(b, n_f, nh, dh).transpose(0, 2, 1, 3)

                q, kn, vn = heads(q), heads(kn), heads(vn)
                keys = jnp.concatenate([kv_k[li], kn], axis=2)
                vals = jnp.concatenate([kv_v[li], vn], axis=2)
                scores = jnp.einsum(
                    "bhqd,bhkd->bhqk", q, keys,
                    preferred_element_type=jnp.float32,
                ) / math.sqrt(dh)
                scores = jnp.where(ok[None, None, :, :], scores, -1e9)
                probs = jax.nn.softmax(scores, axis=-1).astype(z.dtype)
                att = jnp.einsum(
                    "bhqk,bhkd->bhqd", probs, vals,
                    preferred_element_type=jnp.float32,
                ).astype(z.dtype)
                att = att.transpose(0, 2, 1, 3).reshape(b, n_f, d)
                z = z + _linear(bp["attn"]["out"], att)
                # positive-index slice: -lc: would keep the WHOLE buffer
                # when lc == 0 (frame-local attention) and grow the cache
                # every chunk (cf. the conv-context slice below)
                new_k.append(keys[:, :, keys.shape[2] - lc:])
                new_v.append(vals[:, :, vals.shape[2] - lc:])
                # causal conv module with carried GLU context
                h = _linear(bp["conv"]["pw1"],
                            _layer_norm(bp["conv"]["ln"], z))
                a_h, g = jnp.split(h, 2, axis=-1)
                h = a_h * jax.nn.sigmoid(g)
                full = jnp.concatenate([conv_ctx[li], h], axis=1)
                dw = bp["conv"]["dw_w"][:, None, :]
                hc = (
                    jax.lax.conv_general_dilated(
                        full, dw.astype(full.dtype), (1,), [(0, 0)],
                        dimension_numbers=("NTC", "TIO", "NTC"),
                        feature_group_count=full.shape[-1],
                    ).astype(jnp.float32)
                    + bp["conv"]["dw_b"].astype(jnp.float32)
                ).astype(full.dtype)
                hc = _layer_norm(bp["conv"]["ln_conv"], hc)
                hc = _linear(bp["conv"]["pw2"], jax.nn.silu(hc))
                z = z + hc
                new_cc.append(full[:, full.shape[1] - (kc - 1):])
                z = z + 0.5 * ff(bp["ff2"], z)
                z = _layer_norm(bp["ln_final"], z)

            h = _linear(params["head"]["lin1"], z)
            h = jax.nn.gelu(_layer_norm(params["head"]["ln"], h),
                            approximate=False)
            logits = _linear(params["head"]["lin2"], h).astype(jnp.float32)
            new_caches = (
                jnp.stack(new_k), jnp.stack(new_v), jnp.stack(new_cc)
            )
            return jax.nn.log_softmax(logits, axis=-1), new_caches

        return step

    def _build_fused_step(self, w0: int):
        """Single-dispatch steady-state step: affine+smooth the new bins,
        run the frames body, and roll all carried state — ONE donated jit
        call per chunk (one tunnel/PCIe round trip instead of two).
        ``w0`` is the steady bin-residual width (compiled per width)."""
        cfg = self.cfg
        k, s = cfg.temporal_kernel, cfg.temporal_stride
        n_f = self.frames_per_chunk
        taps = self._taps
        ks = int(np.asarray(taps).shape[0])
        cdt = cfg.compute_dtype
        body = self._make_body(n_f)

        affine_body = self._affine_body
        smooth_body = self._smooth_body

        @partial(jax.jit, donate_argnums=(3,))
        def fused(params, w_day, b_day, state, new):
            # raw_ctx is already day-affined (offline op order: affine,
            # then zero-padded smooth); only the NEW real bins get affined.
            raw_ctx, bin_ctx, caches, offset = state
            window = jnp.concatenate(
                [raw_ctx.astype(cdt), affine_body(new, w_day, b_day)],
                axis=1,
            )
            sm = smooth_body(window)
            bins = jnp.concatenate([bin_ctx.astype(sm.dtype), sm], axis=1)
            logp, new_caches = body(
                params, bins[:, : k + (n_f - 1) * s], caches, offset
            )
            new_state = (
                window[:, window.shape[1] - (ks - 1):],
                bins[:, n_f * s:],
                new_caches,
                offset + n_f,
            )
            return logp, new_state

        del w0  # static via bin_ctx shape; kept for cache keying
        return fused

    def _maybe_promote(self) -> None:
        ks = self.k_smooth
        k, s = self.cfg.temporal_kernel, self.cfg.temporal_stride
        n_f = self.frames_per_chunk
        w0 = self._bins.shape[1]
        # steady residual sits in [k, k + n_f*s) under the one-frame
        # holdback (see _drain) — the fused body is residual-agnostic
        if self._raw.shape[1] == ks - 1 and k <= w0 < k + n_f * s:
            self._fast_state = (
                jnp.asarray(self._raw),
                jnp.asarray(self._bins, self.cfg.compute_dtype),
                self._caches,
                jnp.asarray(self._offset, jnp.int32),
            )

    def _demote(self) -> None:
        raw_ctx, bin_ctx, caches, offset = self._fast_state
        self._raw = np.asarray(raw_ctx, np.float32)
        self._bins = np.asarray(bin_ctx, np.float32)
        self._caches = caches
        self._offset = int(offset)
        self._fast_state = None

    # -- public API --------------------------------------------------------
    def process(self, new_bins: np.ndarray) -> np.ndarray:
        """Feed ``[B, n, C]`` new raw bins; returns ``[B, m, K]`` log-probs
        for every encoder frame that became fully determined (m may be 0)."""
        return np.asarray(self.process_async(new_bins))

    def process_async(self, new_bins) -> jax.Array | np.ndarray:
        """Like ``process`` but, on the steady-state fast path, returns the
        device array without blocking — a chained consumer (e.g.
        ``decode_beam``) can keep the work on device."""
        assert not self._flushed, "stream already flushed; call reset()"
        fast_n = self.cfg.temporal_stride * self.frames_per_chunk
        if self._fast_state is not None:
            if new_bins.shape[1] == fast_n:
                w0 = self._fast_state[1].shape[1]
                fused = self._fused_cache.get(w0)
                if fused is None:  # NOTE: setdefault would rebuild (and
                    # recompile) the jit wrapper on every call
                    fused = self._fused_cache[w0] = self._build_fused_step(w0)
                logp, self._fast_state = fused(
                    self._params, self._w_day, self._b_day,
                    self._fast_state, jnp.asarray(new_bins, jnp.float32),
                )
                self._offset += self.frames_per_chunk  # host mirror
                return logp
            self._demote()
        affined = np.asarray(
            self._affine(
                jnp.asarray(new_bins, jnp.float32), self._w_day, self._b_day
            ),
            np.float32,
        )
        self._raw = np.concatenate([self._raw, affined], axis=1)
        out = self._drain()
        self._maybe_promote()
        return out

    def flush(self) -> np.ndarray:
        """Apply the offline right-padding semantics to the tail and emit
        the remaining frames."""
        assert not self._flushed
        if self._fast_state is not None:
            self._demote()
        self._flushed = True
        if self.lookahead > 0:
            pad = np.zeros(
                (self.batch, self.lookahead, self.cfg.n_channels), np.float32
            )
            self._raw = np.concatenate([self._raw, pad], axis=1)
        return self._drain(final=True)

    def _drain(self, final: bool = False) -> np.ndarray:
        ks = self.k_smooth
        n_smoothable = self._raw.shape[1] - (ks - 1)
        if n_smoothable > 0:
            window = jnp.asarray(self._raw[:, : n_smoothable + ks - 1])
            sm = np.asarray(self._prep(window), np.float32)
            self._bins = np.concatenate([self._bins, sm], axis=1)
            self._raw = self._raw[:, n_smoothable:]
        k, s = self.cfg.temporal_kernel, self.cfg.temporal_stride
        n_f = self.frames_per_chunk
        out = []

        def emit(nf):
            need = k + (nf - 1) * s
            chunk = jnp.asarray(self._bins[:, :need])
            logp, self._caches = self._step_for(nf)(
                self._params, chunk, self._caches, self._offset
            )
            self._offset += nf
            out.append(np.asarray(logp))
            self._bins = self._bins[:, nf * s:]

        # One-frame holdback: a frame is emitted only once a FURTHER frame
        # is known to exist (its window plus one more stride of bins), and
        # the flush tail stops at `k + s`, never emitting the final
        # fitting frame — so the stream realizes exactly the reference
        # CTC length (len - k) // s (conformer_output_lengths), one frame
        # fewer than the unfold produces, matching the trainer's eval
        # decode instead of over-decoding a frame the reference ignores.
        while self._bins.shape[1] >= k + n_f * s:
            emit(n_f)
        if final:
            while self._bins.shape[1] >= k + s:
                emit(1)
        if out:
            return np.concatenate(out, axis=1)
        return np.zeros((self.batch, 0, self.cfg.n_classes + 1), np.float32)

    def decode_beam(
        self,
        log_probs,
        *,
        beam_width: int = 8,
        top_k_tokens: int = 8,
        max_len: int = 512,
    ):
        """Incrementally prefix-beam-decode newly emitted log-probs on
        device, carrying the n-best ``BeamState`` across chunks (same
        contract as ``GRUStreamer.decode_beam``; chains directly on the
        device array from ``process_async``)."""
        from ..decoding.ondevice_beam import (
            beam_extend,
            beam_finalize,
            beam_init,
        )

        if self._beam_state is None:
            self._beam_state = beam_init(self.batch, beam_width, max_len)
        elif self._beam_state.prefixes.shape[1:] != (beam_width, max_len):
            raise ValueError(
                "decode_beam width/max_len changed mid-stream; call "
                "reset() to start a new search"
            )
        if log_probs.shape[1]:
            self._beam_state = beam_extend(
                self._beam_state,
                jnp.asarray(log_probs, jnp.float32),
                top_k_tokens=top_k_tokens,
            )
        return beam_finalize(self._beam_state)

    def decode_greedy(self, log_probs: np.ndarray) -> list[list[int]]:
        """Incremental greedy CTC decode (argmax → collapse → drop blank),
        carrying the collapse state across chunks."""
        from ..utils.greedy import incremental_greedy

        return incremental_greedy(log_probs, self._decode_prev)
