"""Serving-side driver for exported GRU streaming artifacts.

Loads the two blobs ``export_streaming`` writes (``stream_prime.shlo``,
``stream_step.shlo``) and drives them with only numpy + jax: host-side
bin buffering, fixed-chunk dispatch, flush zero-padding, the reference
CTC-length truncation ``(T - kernel) // stride`` (the live streamer's
one-frame holdback realizes the same count —
``streaming/engine.py::_drain``), and incremental greedy CTC decoding.
No framework modules are imported at serving time.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
from jax import export as jax_export

from .export import _STREAM_META, _STREAM_PRIME, _STREAM_STEP, _WEIGHTS


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
        with open(os.path.join(art_dir, _STREAM_PRIME), "rb") as f:
            self._prime = jax.jit(jax_export.deserialize(f.read()).call)
        with open(os.path.join(art_dir, _STREAM_STEP), "rb") as f:
            self._step = jax.jit(jax_export.deserialize(f.read()).call)
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

    # -- streaming ---------------------------------------------------------
    def _dispatch(self) -> list:
        """Run prime/step calls for every full window in the buffer.
        Returns raw per-call logits (device arrays, NOT yet truncated)."""
        m = self.meta
        n_f = m["frames_per_chunk"]
        out = []
        while True:
            priming = self._state is None
            need = m["prime_bins"] if priming else m["chunk_bins"]
            if self._buf.shape[1] < need:
                break
            chunk, self._buf = self._buf[:, :need], self._buf[:, need:]
            if self._conformer:
                # Flush padding must be zero in the day-affined domain:
                # mask marks real bins, padding is zeroed post-affine
                # inside the exported function.
                mask = (
                    (self._pos + np.arange(need)) < self._t_real
                ).astype(np.float32)
                max_pos = self.meta["max_pos_len"]
                if self._offset + n_f > max_pos:
                    # mirrors the live streamer's loud PE-budget failure
                    raise RuntimeError(
                        f"stream reached {self._offset + n_f} encoder "
                        f"frames, past the positional-encoding table "
                        f"(max_pos_len={max_pos}); reset() the stream"
                    )
                if priming:
                    res = self._prime(self._weights, chunk, mask)
                else:
                    res = self._step(
                        self._weights, *self._state,
                        np.int32(self._offset), chunk, mask,
                    )
                self._offset += n_f
            elif priming:
                res = self._prime(self._weights, chunk)
            else:
                res = self._step(self._weights, *self._state, chunk)
            self._pos += need
            *state, logits = res
            self._state = tuple(state)
            out.append(logits)  # device array — callers sync when needed
        return out

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
        ~0.5 ms/chunk device-side; one host readback costs a full
        PCIe/tunnel round trip, ~30 ms through the remote axon tunnel)."""
        assert not self._flushed, "stream flushed; call reset()"
        raw_bins = np.asarray(raw_bins, np.float32)
        self._t_real += raw_bins.shape[1]
        self._buf = np.concatenate([self._buf, raw_bins], axis=1)
        chunks = self._dispatch()
        # Live emissions never exceed the realizable count (every frame's
        # raw window, smoothing lookahead included, has arrived), so no
        # truncation is needed here — only flush pads with zeros.
        for c in chunks:
            self._emitted += c.shape[1]
        return chunks

    def flush(self) -> np.ndarray:
        """Zero-pad (offline right-padding semantics) until the reference
        CTC length ``(T - kernel) // stride`` is realized; returns the
        remaining valid frames."""
        assert not self._flushed
        self._flushed = True
        m = self.meta
        target = max(0, (self._t_real - m["kernel_len"]) // m["stride_len"])
        out = []
        while self._emitted < target:
            need = (
                m["prime_bins"] if self._state is None else m["chunk_bins"]
            )
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
            for logits in self._dispatch():
                keep = min(logits.shape[1], target - self._emitted)
                if keep > 0:
                    out.append(logits[:, :keep])
                    self._emitted += keep
        if out:
            return np.concatenate(out, axis=1)
        return np.zeros((m["batch"], 0, m["n_classes"]), np.float32)

    # -- decoding ----------------------------------------------------------
    def decode_greedy(self, logits: np.ndarray) -> list[list[int]]:
        """Incremental CTC greedy decode (argmax → collapse repeats →
        drop blanks) with collapse state carried across calls."""
        b = self.meta["batch"]
        out: list[list[int]] = [[] for _ in range(b)]
        if logits.shape[1] == 0:
            return out
        ids = np.argmax(np.asarray(logits), axis=-1)
        for bi in range(b):
            prev = self._decode_prev[bi]
            for tok in ids[bi]:
                if tok != prev and tok != 0:
                    out[bi].append(int(tok))
                prev = tok
            self._decode_prev[bi] = prev
        return out


def load_exported_streamer(art_dir: str) -> ExportedStreamer:
    return ExportedStreamer(art_dir)
