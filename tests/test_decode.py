"""Greedy CTC decode + PER metric semantics (argmax → collapse → drop blank)."""

import numpy as np

import jax.numpy as jnp

from neural_speech_decoder_tpu.ops.decode import (
    batch_per,
    edit_distance,
    greedy_decode,
)


def _one_hot_seq(ids, k):
    t = len(ids)
    x = np.full((t, k), -5.0, dtype=np.float32)
    for i, c in enumerate(ids):
        x[i, c] = 5.0
    return x


def test_greedy_decode_collapse_and_blank_rules():
    k = 5
    # frames:      1 1 0 1 2 2 0 0 3
    # collapse  -> 1 0 1 2 0 3 ; drop blanks -> 1 1 2 3
    frames = [1, 1, 0, 1, 2, 2, 0, 0, 3]
    x = _one_hot_seq(frames, k)[None]
    toks, lens = greedy_decode(jnp.asarray(x), jnp.asarray([len(frames)]))
    assert int(lens[0]) == 4
    np.testing.assert_array_equal(np.asarray(toks[0, :4]), [1, 1, 2, 3])
    # padding after decode must be zeroed
    assert np.all(np.asarray(toks[0, 4:]) == 0)


def test_greedy_decode_respects_input_lens():
    k = 4
    frames = [1, 2, 3, 3, 3, 3]
    x = _one_hot_seq(frames, k)[None]
    toks, lens = greedy_decode(jnp.asarray(x), jnp.asarray([3]))
    assert int(lens[0]) == 3
    np.testing.assert_array_equal(np.asarray(toks[0, :3]), [1, 2, 3])


def test_greedy_decode_all_blank():
    k = 3
    x = _one_hot_seq([0, 0, 0, 0], k)[None]
    toks, lens = greedy_decode(jnp.asarray(x), jnp.asarray([4]))
    assert int(lens[0]) == 0
    assert np.all(np.asarray(toks) == 0)


def test_greedy_matches_reference_numpy_pipeline():
    # Cross-check the vectorized decode against a literal transcription of the
    # reference host pipeline (neural_decoder_trainer.py:313-320).
    rng = np.random.default_rng(0)
    b, t, k = 5, 30, 9
    x = rng.standard_normal((b, t, k)).astype(np.float32)
    lens = rng.integers(5, t + 1, size=b).astype(np.int32)
    toks, out_lens = greedy_decode(jnp.asarray(x), jnp.asarray(lens))
    for i in range(b):
        ids = np.argmax(x[i, : lens[i]], axis=-1)
        collapsed = [ids[0]] + [c for p, c in zip(ids, ids[1:]) if c != p]
        ref = [c for c in collapsed if c != 0]
        assert int(out_lens[i]) == len(ref)
        np.testing.assert_array_equal(np.asarray(toks[i, : len(ref)]), ref)


def test_edit_distance_and_per():
    assert edit_distance(np.array([1, 2, 3]), np.array([1, 2, 3])) == 0
    assert edit_distance(np.array([1, 2, 3]), np.array([1, 3])) == 1
    assert edit_distance(np.array([]), np.array([1, 2])) == 2
    assert edit_distance(np.array([1, 2, 4]), np.array([2, 2, 3])) == 2

    decoded = np.array([[1, 2, 0, 0], [3, 0, 0, 0]])
    dec_lens = np.array([2, 1])
    targets = np.array([[1, 2, 3, 0], [3, 0, 0, 0]])
    tgt_lens = np.array([3, 1])
    dist, length = batch_per(decoded, dec_lens, targets, tgt_lens)
    assert dist == 1 and length == 4
