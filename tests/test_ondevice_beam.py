"""On-device prefix beam search vs greedy and the host oracle."""

import numpy as np

import jax.numpy as jnp

from neural_speech_decoder_tpu.decoding.beam import beam_search
from neural_speech_decoder_tpu.decoding.ondevice_beam import prefix_beam_search
from neural_speech_decoder_tpu.ops.decode import greedy_decode


def peaked(ids, k=10, peak=6.0):
    seq = []
    for i in ids:
        seq += [i, 0]
    x = np.full((len(seq), k), -peak, np.float32)
    for j, c in enumerate(seq):
        x[j, c] = peak
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def test_top1_matches_greedy_on_peaked_inputs():
    ids = [3, 1, 1, 4]
    lp = peaked(ids)[None]
    lens = jnp.asarray([lp.shape[1]])
    prefixes, out_lens, scores = prefix_beam_search(
        jnp.asarray(lp), lens, beam_width=4
    )
    g_toks, g_lens = greedy_decode(jnp.asarray(lp), lens)
    n = int(out_lens[0, 0])
    assert n == int(g_lens[0])
    np.testing.assert_array_equal(
        np.asarray(prefixes[0, 0, :n]), np.asarray(g_toks[0, :n])
    )
    # scores sorted best-first
    s = np.asarray(scores[0])
    assert (np.diff(s) <= 1e-5).all()


def test_matches_host_oracle_exactly_at_equal_width():
    """With matched beam capacity the on-device search is EXACT: top-1
    prefixes and total scores equal the host oracle's."""
    rng = np.random.default_rng(0)
    for trial in range(6):
        x = rng.standard_normal((18, 8)).astype(np.float32) * 2.0
        lp = x - np.log(np.exp(x).sum(-1, keepdims=True))
        hyps = beam_search(lp, acoustic_scale=1.0, nbest=4, beam=50.0,
                           max_active=64, top_k_tokens=8)
        prefixes, lens, scores = prefix_beam_search(
            jnp.asarray(lp)[None], jnp.asarray([18]),
            beam_width=64, top_k_tokens=8,
        )
        n = int(lens[0, 0])
        dev_top1 = list(np.asarray(prefixes[0, 0, :n]))
        assert dev_top1 == hyps[0].phones, trial
        assert abs(float(scores[0, 0]) - hyps[0].score) < 1e-3, trial


def test_respects_input_lens_and_batch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 12, 6)).astype(np.float32)
    lp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    p_full, l_full, _ = prefix_beam_search(
        jnp.asarray(lp), jnp.asarray([12, 5]), beam_width=4
    )
    # row 1 truncated at 5 frames == decoding only the first 5 frames
    p_cut, l_cut, _ = prefix_beam_search(
        jnp.asarray(lp[1:2, :5]), jnp.asarray([5]), beam_width=4
    )
    n = int(l_cut[0, 0])
    assert int(l_full[1, 0]) == n
    np.testing.assert_array_equal(
        np.asarray(p_full[1, 0, :n]), np.asarray(p_cut[0, 0, :n])
    )
