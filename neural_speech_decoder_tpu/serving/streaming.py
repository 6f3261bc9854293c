"""Serving-side driver for exported streaming artifacts (GRU and causal
Conformer — ``stream_meta.json``'s ``kind`` selects the protocol).

Loads the blobs ``export_streaming*`` write (``stream_prime.shlo``,
``stream_step.shlo``, plus ``stream_tail.shlo`` for Conformer artifacts
with ``frames_per_chunk > 1``) and drives them with only numpy + jax:
host-side bin buffering, fixed-chunk dispatch, flush zero-padding, the
reference CTC-length truncation ``(T - kernel) // stride`` (the live
streamers' one-frame holdback realizes the same count —
``streaming/engine.py::_drain``), and incremental greedy CTC decoding.
No model/training modules are imported at serving time.

Output scale differs by kind (recorded in ``meta['outputs']``): GRU
artifacts emit raw logits, Conformer artifacts emit log-softmax
probabilities — argmax decoding is identical, external scorers must
check the field.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
from jax import export as jax_export

from ..utils.greedy import incremental_greedy
from .export import (
    _BEAM_FINAL,
    _BEAM_INIT,
    _BEAM_META,
    _BEAM_STEP,
    _STREAM_META,
    _STREAM_PRIME,
    _STREAM_STEP,
    _STREAM_TAIL,
    _WEIGHTS,
)


class ExportedStreamer:
    """Fixed-configuration streaming inference from an AOT artifact.

    ``feed(raw_bins)`` accepts any number of new ``[B, n, C]`` raw bins
    and returns the logits ``[B, m, K]`` for every frame that became
    fully determined; ``flush()`` realizes the remaining frames with
    offline zero-padding semantics and truncates the stream to the
    reference CTC length. Exactness vs the offline forward is pinned by
    ``tests/test_serving_export.py``.
    """

    def __init__(self, art_dir: str):
        with open(os.path.join(art_dir, _STREAM_META)) as f:
            self.meta = json.load(f)
        if self.meta.get("kind") not in ("gru_stream", "conformer_stream"):
            raise ValueError(f"not a streaming artifact: {art_dir}")
        self._conformer = self.meta["kind"] == "conformer_stream"

        def load_blob(name):
            with open(os.path.join(art_dir, name), "rb") as f:
                return jax.jit(jax_export.deserialize(f.read()).call)

        self._prime = load_blob(_STREAM_PRIME)
        self._step = load_blob(_STREAM_STEP)
        self._tail = (
            load_blob(_STREAM_TAIL) if self.meta.get("has_tail") else None
        )
        self._art_dir = art_dir
        self._beam = None  # (init, step, final) blobs, loaded on demand
        self.beam_meta = None
        if os.path.exists(os.path.join(art_dir, _BEAM_META)):
            with open(os.path.join(art_dir, _BEAM_META)) as f:
                self.beam_meta = json.load(f)
            self._beam = (
                load_blob(_BEAM_INIT),
                load_blob(_BEAM_STEP),
                load_blob(_BEAM_FINAL),
            )
        npz = np.load(os.path.join(art_dir, _WEIGHTS))
        leaves = []
        for i, dt in enumerate(self.meta["leaf_dtypes"]):
            a = npz[f"w{i:03d}"]
            if dt == "bfloat16":
                import jax.numpy as jnp

                a = a.astype(jnp.bfloat16)
            # commit to device ONCE (numpy leaves re-transfer per call)
            leaves.append(jax.device_put(a))
        self._weights = tuple(leaves)
        self.reset()

    def reset(self) -> None:
        m = self.meta
        self._buf = np.zeros((m["batch"], 0, m["n_channels"]), np.float32)
        self._state = None  # carried device state after priming
        self._t_real = 0  # real raw bins fed so far
        self._pos = 0  # global index of the first buffered bin
        self._offset = 0  # encoder frames emitted (conformer PE offset)
        self._emitted = 0  # frames returned to the caller so far
        self._flushed = False
        self._decode_prev = np.full((m["batch"],), -1, np.int64)
        self._beam_state = None  # carried on-device n-best beam state

    # -- streaming ---------------------------------------------------------
    def _dispatch_one(self, tail: bool = False):
        """Run one prime/step/tail call if the buffer holds a full
        window; returns the device logits or None. All state updates
        happen only after a successful call — a raised PE-budget error
        leaves the driver consistent."""
        m = self.meta
        priming = self._state is None
        if tail:
            need, frames = m["stride_len"], 1
        else:
            need = m["prime_bins"] if priming else m["chunk_bins"]
            frames = m["frames_per_chunk"]
        if self._buf.shape[1] < need:
            return None
        if self._conformer:
            # Compat mode for pre-round-5 artifacts only: their exported
            # graphs slice a PE TABLE, which past max_pos_len would
            # silently clamp (wrong log-probs forever) — fail loudly
            # instead. Round-5+ artifacts (meta pe_unbounded) compute PE
            # on the fly and stream without any session-length cap.
            max_pos = m["max_pos_len"]
            if not m.get("pe_unbounded") and self._offset + frames > max_pos:
                raise RuntimeError(
                    f"stream needs {self._offset + frames} encoder "
                    f"frames, past the positional-encoding table "
                    f"(max_pos_len={max_pos}); reset() the stream, or "
                    f"re-export with this framework version (unbounded PE)"
                )
            mask = (
                (self._pos + np.arange(need)) < self._t_real
            ).astype(np.float32)
            if priming:
                res = self._prime(self._weights, self._buf[:, :need], mask)
            else:
                fn = self._tail if tail else self._step
                res = fn(
                    self._weights, *self._state,
                    np.int32(self._offset), self._buf[:, :need], mask,
                )
            self._offset += frames
        elif priming:
            res = self._prime(self._weights, self._buf[:, :need])
        else:
            res = self._step(self._weights, *self._state, self._buf[:, :need])
        self._buf = self._buf[:, need:]
        self._pos += need
        *state, logits = res
        self._state = tuple(state)
        return logits

    def feed(self, raw_bins: np.ndarray) -> np.ndarray:
        """Feed ``[B, n, C]`` new raw bins; returns ``[B, m, K]`` logits
        (m may be 0)."""
        chunks = self.feed_async(raw_bins)
        if not chunks:
            return np.zeros(
                (self.meta["batch"], 0, self.meta["n_classes"]), np.float32
            )
        return np.concatenate([np.asarray(c) for c in chunks], axis=1)

    def feed_async(self, raw_bins: np.ndarray) -> list:
        """Like ``feed`` but returns the per-dispatch device arrays
        without a host sync — a pipelined consumer can chain device-side
        decode work before paying the readback (the exported step runs
        ~0.5-1 ms/chunk device-side; one host readback costs a full
        PCIe/tunnel round trip, ~30 ms through the remote axon tunnel)."""
        assert not self._flushed, "stream flushed; call reset()"
        raw_bins = np.asarray(raw_bins, np.float32)
        self._t_real += raw_bins.shape[1]
        self._buf = np.concatenate([self._buf, raw_bins], axis=1)
        chunks = []
        while (logits := self._dispatch_one()) is not None:
            chunks.append(logits)
        # Live emissions never exceed the realizable count (every frame's
        # raw window, smoothing lookahead included, has arrived), so no
        # truncation is needed here — only flush pads with zeros.
        for c in chunks:
            self._emitted += c.shape[1]
        return chunks

    def flush(self) -> np.ndarray:
        """Zero-pad (offline right-padding semantics) until the reference
        CTC length ``(T - kernel) // stride`` is realized; returns the
        remaining valid frames. Conformer artifacts switch to the
        exported 1-frame tail step for the final partial chunk — fewer
        wasted frames (the live streamer's ``emit(1)`` tail loop); for
        pre-round-5 artifacts the tail also avoids clamping the PE-table
        slice near its end."""
        assert not self._flushed
        self._flushed = True
        m = self.meta
        n_f = m["frames_per_chunk"]
        target = max(0, (self._t_real - m["kernel_len"]) // m["stride_len"])
        out = []
        while self._emitted < target:
            priming = self._state is None
            use_tail = (
                self._tail is not None
                and not priming
                and (
                    target - self._emitted < n_f
                    or (
                        self._conformer
                        and not m.get("pe_unbounded")
                        and self._offset + n_f > m["max_pos_len"]
                    )
                )
            )
            if use_tail:
                need = m["stride_len"]
            else:
                need = m["prime_bins"] if priming else m["chunk_bins"]
            short = need - self._buf.shape[1]
            if short > 0:
                self._buf = np.concatenate(
                    [
                        self._buf,
                        np.zeros((m["batch"], short, m["n_channels"]),
                                 np.float32),
                    ],
                    axis=1,
                )
            logits = self._dispatch_one(tail=use_tail)
            keep = min(logits.shape[1], target - self._emitted)
            if keep > 0:
                out.append(np.asarray(logits)[:, :keep])
                self._emitted += keep
        if out:
            return np.concatenate(out, axis=1)
        return np.zeros((m["batch"], 0, m["n_classes"]), np.float32)

    # -- decoding ----------------------------------------------------------
    def decode_greedy(self, logits: np.ndarray) -> list[list[int]]:
        """Incremental CTC greedy decode (argmax → collapse repeats →
        drop blanks) with collapse state carried across calls."""
        return incremental_greedy(logits, self._decode_prev)

    def decode_beam(self, logits):
        """Incremental on-device n-best prefix beam search from the
        exported beam blobs (present when the artifact was built with
        ``--beam`` / ``export_beam``). Accepts a ``[B, m, K]`` chunk
        (numpy or the device arrays from ``feed_async``), carries the
        ``BeamState`` across calls — exactly chunk-boundary-invariant —
        and returns the current ``(prefixes [B, W, max_len], lens,
        scores)`` sorted best-first. ``reset()`` clears the search."""
        if self._beam is None:
            raise RuntimeError(
                "artifact has no beam blobs; export with "
                "export_beam(art_dir, ...) or nsd-export --beam"
            )
        binit, bstep, bfinal = self._beam
        if self._beam_state is None:
            self._beam_state = binit()
        if logits.shape[1]:
            # per-frame device slices: the exported step is one frame
            # wide so any chunk length (incl. the 1-frame flush tail)
            # drives the same blob
            for i in range(logits.shape[1]):
                self._beam_state = bstep(
                    *self._beam_state, logits[:, i : i + 1]
                )
        return tuple(np.asarray(a) for a in bfinal(*self._beam_state))


def load_exported_streamer(art_dir: str) -> ExportedStreamer:
    return ExportedStreamer(art_dir)
