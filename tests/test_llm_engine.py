"""Reference-scale LLM engine: streamed loading, int8, TP sharding.

The reference's rescorer is OPT-6.7B in 8-bit (eval_competition.py:84-86).
These tests pin the scale-path mechanisms at tiny dims:
  * stream_load_hf == jax_lm.load_causal_lm (tensor-streamed bf16 loading
    produces the same numbers as the whole-model torch loader);
  * engine forward == jax_lm forward (head-major qkv layout is a pure
    re-layout);
  * int8 weight-only quantization stays close in logprob and preserves
    n-best ranking on well-separated hypotheses;
  * TP-sharded forward over the 8-virtual-device CPU mesh == single-device
    (GSPMD collectives inserted by XLA, not hand-written).
"""

import json

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from neural_speech_decoder_tpu.decoding import jax_lm, llm_engine


def _tiny_tokenizer(d):
    from transformers import GPT2TokenizerFast

    vocab = {chr(c): i for i, c in enumerate(range(ord("a"), ord("z") + 1))}
    vocab.update({" ": 26, "<|endoftext|>": 27, "Ġ": 28})
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    return GPT2TokenizerFast(
        vocab_file=str(d / "vocab.json"),
        merges_file=str(d / "merges.txt"),
        unk_token="<|endoftext|>",
        pad_token="<|endoftext|>",
        bos_token="<|endoftext|>",
        eos_token="<|endoftext|>",
    ), len(vocab)


def _make_opt(d, *, word_embed_proj_dim=None, safetensors=True):
    import torch
    from transformers import OPTConfig, OPTForCausalLM

    tok, vocab_size = _tiny_tokenizer(d)
    torch.manual_seed(3)
    hidden = 32
    model = OPTForCausalLM(
        OPTConfig(
            vocab_size=vocab_size, hidden_size=hidden, num_hidden_layers=3,
            num_attention_heads=2, ffn_dim=64, max_position_embeddings=64,
            word_embed_proj_dim=word_embed_proj_dim or hidden,
            do_layer_norm_before=True,
            pad_token_id=27, bos_token_id=27, eos_token_id=27,
        )
    )
    model.save_pretrained(str(d), safe_serialization=safetensors)
    tok.save_pretrained(str(d))
    return str(d)


@pytest.fixture(scope="module")
def tiny_opt_dir(tmp_path_factory):
    return _make_opt(tmp_path_factory.mktemp("opt_st"))


@pytest.fixture(scope="module")
def tiny_opt_bin_dir(tmp_path_factory):
    return _make_opt(tmp_path_factory.mktemp("opt_bin"), safetensors=False)


SENTENCES = ["the cat sat", "a", "hello world again and again", "dog ran"]


def _tokenize(path, sentences):
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(path)
    if tok.pad_token is None:
        tok.pad_token = tok.eos_token
    enc = tok(sentences, padding=True)
    return (
        np.asarray(enc["input_ids"], np.int32),
        np.asarray(enc["attention_mask"], np.int32),
    )


def test_stream_load_matches_torch_loader(tiny_opt_dir):
    """Tensor-streamed bf16 loading == whole-model fp32 loader (cast)."""
    ref_params, ref_spec, _ = jax_lm.load_causal_lm(tiny_opt_dir)
    eng_ref, eng_spec = llm_engine.from_jax_lm(ref_params, ref_spec)
    streamed, spec2 = llm_engine.stream_load_hf(tiny_opt_dir, "float32")
    assert spec2.n_layer == eng_spec.n_layer
    assert spec2.n_head == eng_spec.n_head
    for k in eng_ref["blocks"]:
        np.testing.assert_allclose(
            np.asarray(streamed["blocks"][k], np.float32),
            np.asarray(eng_ref["blocks"][k], np.float32),
            rtol=0, atol=0, err_msg=k,
        )
    for k in ("wte", "wpe", "lnf_g", "lnf_b"):
        np.testing.assert_allclose(
            np.asarray(streamed[k], np.float32),
            np.asarray(eng_ref[k], np.float32), err_msg=k,
        )


def test_stream_load_torch_bin(tiny_opt_bin_dir):
    """The torch-.bin fallback path produces identical tensors too."""
    ref_params, ref_spec, _ = jax_lm.load_causal_lm(tiny_opt_bin_dir)
    eng_ref, _ = llm_engine.from_jax_lm(ref_params, ref_spec)
    streamed, _ = llm_engine.stream_load_hf(tiny_opt_bin_dir, "float32")
    np.testing.assert_allclose(
        np.asarray(streamed["blocks"]["wqkv"], np.float32),
        np.asarray(eng_ref["blocks"]["wqkv"], np.float32),
    )
    np.testing.assert_allclose(
        np.asarray(streamed["wte"], np.float32),
        np.asarray(eng_ref["wte"], np.float32),
    )


def test_stream_load_sharded_checkpoint(tmp_path):
    """Multi-file (index.json) checkpoints load identically — real
    6.7B-class checkpoints ship sharded."""
    d = tmp_path / "opt_sharded"
    d.mkdir()
    path = _make_opt(d)
    ref, _ = llm_engine.stream_load_hf(path, "float32")
    # re-save sharded with a tiny max shard size
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(path)
    d2 = tmp_path / "opt_sharded2"
    model.save_pretrained(str(d2), max_shard_size="50KB",
                          safe_serialization=True)
    import os

    assert os.path.exists(d2 / "model.safetensors.index.json")
    got, _ = llm_engine.stream_load_hf(str(d2), "float32")
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree.flatten_with_path(ref)[0], key=lambda kv: str(kv[0])),
        sorted(jax.tree.flatten_with_path(got)[0], key=lambda kv: str(kv[0])),
    ):
        assert str(ka) == str(kb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(ka))


def test_stream_load_decoder_prefix_variant(tmp_path, tiny_opt_dir):
    """'decoder.*'-prefixed checkpoints (OPTModel saves) load identically;
    unrecognized naming raises instead of returning np.empty garbage."""
    import shutil

    from safetensors import safe_open
    from safetensors.numpy import save_file

    ref, _ = llm_engine.stream_load_hf(tiny_opt_dir, "float32")
    d = tmp_path / "opt_decoder_prefix"
    d.mkdir()
    shutil.copy(f"{tiny_opt_dir}/config.json", d / "config.json")
    tensors = {}
    with safe_open(f"{tiny_opt_dir}/model.safetensors", framework="np") as f:
        for name in f.keys():
            new = name.removeprefix("model.")  # model.decoder.* -> decoder.*
            tensors[new] = f.get_tensor(name)
    save_file(tensors, str(d / "model.safetensors"))
    got, _ = llm_engine.stream_load_hf(str(d), "float32")
    np.testing.assert_array_equal(
        np.asarray(got["blocks"]["wqkv"], np.float32),
        np.asarray(ref["blocks"]["wqkv"], np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(got["wte"], np.float32),
        np.asarray(ref["wte"], np.float32),
    )

    # bogus naming -> loud failure (completeness check)
    d2 = tmp_path / "opt_bogus"
    d2.mkdir()
    shutil.copy(f"{tiny_opt_dir}/config.json", d2 / "config.json")
    save_file({"something.weird": np.zeros((2, 2), np.float32)},
              str(d2 / "model.safetensors"))
    with pytest.raises(ValueError, match="filled"):
        llm_engine.stream_load_hf(str(d2), "float32")


def test_engine_scorer_with_mesh(tiny_opt_dir):
    """engine_scorer composes with a TP mesh (sharded params, same
    scores)."""
    from jax.sharding import Mesh

    ref = llm_engine.engine_scorer(
        tiny_opt_dir, compute_dtype="float32", param_dtype="float32"
    )
    devices = np.array(jax.devices()[:2]).reshape(1, 2)
    mesh = Mesh(devices, ("data", "model"))
    sharded = llm_engine.engine_scorer(
        tiny_opt_dir, compute_dtype="float32", param_dtype="float32",
        mesh=mesh,
    )
    np.testing.assert_allclose(
        sharded(SENTENCES), ref(SENTENCES), rtol=1e-5, atol=1e-4
    )


def test_engine_forward_matches_jax_lm(tiny_opt_dir):
    """Head-major layout is a pure re-layout: identical fp32 logprobs."""
    params, spec, tok = jax_lm.load_causal_lm(tiny_opt_dir)
    ids, mask = _tokenize(tiny_opt_dir, SENTENCES)
    ref = np.asarray(
        jax_lm.sentence_logprobs(
            jax.tree.map(jnp.asarray, params), spec, ids, mask,
            compute_dtype=jnp.float32,
        )
    )
    eng_params, eng_spec = llm_engine.from_jax_lm(params, spec)
    got = np.asarray(
        llm_engine.engine_sentence_logprobs(
            jax.tree.map(jnp.asarray, eng_params), eng_spec, ids, mask,
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_engine_scorer_matches_jax_scorer(tiny_opt_dir):
    """End-to-end scorer contract: streamed engine == jax_lm scorer."""
    ref = jax_lm.jax_causal_scorer(tiny_opt_dir, compute_dtype="float32")
    eng = llm_engine.engine_scorer(
        tiny_opt_dir, compute_dtype="float32", param_dtype="float32"
    )
    np.testing.assert_allclose(
        eng(SENTENCES), ref(SENTENCES), rtol=1e-5, atol=1e-4
    )


def test_int8_quantization_close_and_rank_preserving(tiny_opt_dir):
    params, spec, _ = jax_lm.load_causal_lm(tiny_opt_dir)
    eng_params, eng_spec = llm_engine.from_jax_lm(params, spec)
    ids, mask = _tokenize(tiny_opt_dir, SENTENCES)
    fp = np.asarray(
        llm_engine.engine_sentence_logprobs(
            jax.tree.map(jnp.asarray, eng_params), eng_spec, ids, mask,
            compute_dtype=jnp.float32,
        )
    )
    q_params = llm_engine.quantize_int8(eng_params)
    q = np.asarray(
        llm_engine.engine_sentence_logprobs(
            jax.tree.map(jnp.asarray, q_params), eng_spec, ids, mask,
            compute_dtype=jnp.float32,
        )
    )
    # int8 weight-only: small absolute drift, same ordering
    np.testing.assert_allclose(q, fp, rtol=0.05, atol=0.5)
    assert list(np.argsort(q)) == list(np.argsort(fp))


def test_quantize_int8_is_pure(tiny_opt_dir):
    """quantize_int8 must not mutate the caller's tree (regression: the
    chunked in-place fp32 path once quantized straight into a VIEW of
    already-fp32 leaves) and must accept read-only arrays."""
    params, spec, _ = jax_lm.load_causal_lm(tiny_opt_dir)
    eng_params, _ = llm_engine.from_jax_lm(params, spec)
    # fp32 leaves: np.asarray(w[i:i+step], np.float32) is a no-copy view
    fp32_blocks = {
        k: np.asarray(v, np.float32) for k, v in eng_params["blocks"].items()
    }
    before = {k: v.copy() for k, v in fp32_blocks.items()}
    llm_engine.quantize_int8({**eng_params, "blocks": fp32_blocks})
    for k in fp32_blocks:
        np.testing.assert_array_equal(fp32_blocks[k], before[k]), k
    # read-only leaves (np.asarray of a device array is non-writable)
    ro_blocks = {}
    for k, v in fp32_blocks.items():
        arr = v.copy()
        arr.setflags(write=False)
        ro_blocks[k] = arr
    llm_engine.quantize_int8({**eng_params, "blocks": ro_blocks})


@pytest.mark.parametrize("mesh_shape", [(1, 2), (2, 2), (1, 8)])
def test_tensor_parallel_logprob_parity(tiny_opt_dir, mesh_shape):
    """TP-sharded forward on the virtual CPU mesh == single-device.

    The tiny model has 2 heads; mesh 'model' axes of 2 exercise real
    head-parallel sharding, the (1, 8) case degenerates to DP-only over
    'data' with a 1-wide model axis... so flip: mesh axes are
    (data, model) and we require model ∈ {1, 2}.
    """
    from jax.sharding import Mesh

    data_n, model_n = mesh_shape
    if model_n > 2:
        model_n = 2  # only 2 heads at tiny scale
        data_n = 4
    devices = np.array(jax.devices()[: data_n * model_n]).reshape(
        data_n, model_n
    )
    mesh = Mesh(devices, ("data", "model"))

    params, spec, _ = jax_lm.load_causal_lm(tiny_opt_dir)
    eng_params, eng_spec = llm_engine.from_jax_lm(params, spec)
    ids, mask = _tokenize(tiny_opt_dir, SENTENCES)
    ref = np.asarray(
        llm_engine.engine_sentence_logprobs(
            jax.tree.map(jnp.asarray, eng_params), eng_spec, ids, mask,
            compute_dtype=jnp.float32,
        )
    )
    sharded, named = llm_engine.shard_params(eng_params, eng_spec, mesh)
    fn = jax.jit(
        lambda p, i, m: llm_engine.engine_sentence_logprobs(
            p, eng_spec, i, m, compute_dtype=jnp.float32
        ),
    )
    got = np.asarray(fn(sharded, ids, mask))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_tensor_parallel_int8(tiny_opt_dir):
    """int8 weights compose with TP sharding (quantize-then-shard)."""
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:2]).reshape(1, 2)
    mesh = Mesh(devices, ("data", "model"))
    params, spec, _ = jax_lm.load_causal_lm(tiny_opt_dir)
    eng_params, eng_spec = llm_engine.from_jax_lm(params, spec)
    q_params = llm_engine.quantize_int8(eng_params)
    ids, mask = _tokenize(tiny_opt_dir, SENTENCES)
    ref = np.asarray(
        llm_engine.engine_sentence_logprobs(
            jax.tree.map(jnp.asarray, q_params), eng_spec, ids, mask,
            compute_dtype=jnp.float32,
        )
    )
    sharded, _ = llm_engine.shard_params(q_params, eng_spec, mesh)
    got = np.asarray(
        jax.jit(
            lambda p, i, m: llm_engine.engine_sentence_logprobs(
                p, eng_spec, i, m, compute_dtype=jnp.float32
            )
        )(sharded, ids, mask)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_shardings_reject_indivisible_heads(tiny_opt_dir):
    """Head-parallel TP requires n_head % mesh['model'] == 0."""
    from jax.sharding import Mesh

    params, spec, _ = jax_lm.load_causal_lm(tiny_opt_dir)
    eng_params, eng_spec = llm_engine.from_jax_lm(params, spec)
    assert eng_spec.n_head == 2
    devices = np.array(jax.devices()[:3]).reshape(1, 3)
    mesh = Mesh(devices, ("data", "model"))
    with pytest.raises(ValueError, match="divisible"):
        llm_engine.llm_shardings(eng_spec, mesh)


def test_opt_spec_reference_scale():
    """The 6.7b row matches the published OPT dims the reference loads."""
    spec = llm_engine.opt_spec("6.7b")
    assert (spec.n_layer, spec.d_model, spec.ffn_dim, spec.n_head) == (
        32, 4096, 16384, 32,
    )
    assert 6.5e9 < spec.n_params < 7.0e9
    # bf16 fits a 16 GB v5e; int8 leaves ample headroom
    assert spec.n_params * 2 < 14e9
    assert llm_engine.opt_spec("13b").n_params * 1 < 14e9


def test_synth_params_on_device_tiny():
    spec = llm_engine.EngineSpec(
        n_layer=2, d_model=32, ffn_dim=64, n_head=2, vocab=64,
        n_positions=32,
    )
    params = llm_engine.synth_params_on_device(spec, seed=0,
                                               dtype=jnp.float32)
    ids = np.zeros((2, 8), np.int32)
    mask = np.ones((2, 8), np.int32)
    lp = llm_engine.engine_sentence_logprobs(
        params, spec, ids, mask, compute_dtype=jnp.float32
    )
    assert np.all(np.isfinite(np.asarray(lp)))


def test_word_dim_split_checkpoint(tmp_path):
    """OPT-350m-style word/hidden split loads and scores identically."""
    d = tmp_path / "opt_proj"
    d.mkdir()
    path = _make_opt(d, word_embed_proj_dim=16)
    params, spec, _ = jax_lm.load_causal_lm(path)
    eng_ref, eng_spec = llm_engine.from_jax_lm(params, spec)
    streamed, spec2 = llm_engine.stream_load_hf(path, "float32")
    assert spec2.word_dim == 16
    np.testing.assert_allclose(
        np.asarray(streamed["win"], np.float32),
        np.asarray(eng_ref["win"], np.float32),
    )
    ids, mask = _tokenize(path, SENTENCES)
    ref = np.asarray(
        llm_engine.engine_sentence_logprobs(
            jax.tree.map(jnp.asarray, eng_ref), eng_spec, ids, mask,
            compute_dtype=jnp.float32,
        )
    )
    got = np.asarray(
        llm_engine.engine_sentence_logprobs(
            jax.tree.map(jnp.asarray, streamed), spec2, ids, mask,
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)
