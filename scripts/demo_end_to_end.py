"""End-to-end demo: dataset -> train -> decode -> streaming -> export.

Runs the complete framework story on a small synthetic word-structured
dataset in a few minutes on CPU (pass --tpu to use the chip):

  1. writes a reference-format dataset pickle + lexicon + ARPA LM,
  2. trains a GRU decoder via the YAML/override CLI,
  3. runs the competition pipeline (native beam decoder + LM + rescoring),
  4. reloads the best checkpoint and streams an utterance chunk-by-chunk
     with incremental phoneme + live word decoding,
  5. exports the streaming model as an AOT serving artifact and replays
     the stream from it (must match the live streamer).

    python scripts/demo_end_to_end.py --workdir /tmp/nsd_demo
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workdir", default="/tmp/nsd_demo")
    parser.add_argument("--tpu", action="store_true",
                        help="run on the TPU instead of CPU")
    parser.add_argument("--steps", type=int, default=250)
    cli = parser.parse_args()

    import jax

    if not cli.tpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
    )
    from test_eval_pipeline import ARPA_TEXT, LEXICON_TEXT, word_dataset

    from neural_speech_decoder_tpu.data.phonemes import id_to_phone
    from neural_speech_decoder_tpu.decoding.eval_competition import (
        collect_model_outputs,
        run_pipeline,
    )
    from neural_speech_decoder_tpu.streaming import GRUStreamer
    from neural_speech_decoder_tpu.training.cli import main as train_cli
    from neural_speech_decoder_tpu.training.trainer import load_model

    wd = os.path.abspath(cli.workdir)
    os.makedirs(wd, exist_ok=True)
    run_dir = os.path.join(wd, "model")

    print("== 1/5 dataset ==")
    data = word_dataset(np.random.default_rng(0), n_days=2, trials=20,
                        n_channels=24, scale=4.0)
    ds_path = os.path.join(wd, "dataset.pkl")
    with open(ds_path, "wb") as f:
        pickle.dump(data, f)
    lex_path = os.path.join(wd, "lexicon.txt")
    open(lex_path, "w").write(LEXICON_TEXT)
    arpa_path = os.path.join(wd, "lm.arpa")
    open(arpa_path, "w").write(ARPA_TEXT)
    n_train = sum(len(d["transcriptions"]) for d in data["train"])
    print(f"   {n_train} train trials over {len(data['train'])} days -> {ds_path}")

    print("== 2/5 train (YAML CLI) ==")
    import yaml

    cfg = {
        "datasetPath": ds_path, "batchSize": 8, "lrStart": 0.01,
        "lrEnd": 0.005, "l2_decay": 1e-5, "nBatch": cli.steps,
        "evalEvery": max(cli.steps // 5, 1), "whiteNoiseSD": 0.2,
        "constantOffsetSD": 0.0, "gaussianSmoothWidth": 2.0, "nUnits": 64,
        "nLayers": 2, "nInputFeatures": 24, "nClasses": 40, "dropout": 0.0,
        "strideLen": 2, "kernelLen": 4, "bidirectional": True, "seed": 0,
        "wandb_mode": "offline", "time_multiple": 16, "checkpointEvery": 100,
    }
    cfg_path = os.path.join(wd, "config.yaml")
    open(cfg_path, "w").write(yaml.safe_dump(cfg))
    train_cli(["--config", cfg_path, f"outputDir={run_dir}"])

    print("== 3/5 competition pipeline ==")
    outputs = collect_model_outputs(run_dir, dataset=data,
                                    partition="competition", batch_size=4)
    result = run_pipeline(
        outputs, lexicon_path=lex_path, arpa_path=arpa_path,
        nbest=10, beam=25.0, verbose=True,
    )
    print(f"   PER={result['per']:.3f}  WER={result['wer']:.3f}  "
          f"CER={result['cer']:.3f}")
    for ref, hyp in list(
        zip(outputs["transcriptions"], result["decoded_transcripts"])
    )[:3]:
        print(f"   ref: {ref!r:24} hyp: {hyp!r}")

    print("== 4/5 streaming (unidirectional variant) ==")
    # Train a small causal model for streaming (bidirectional can't stream).
    stream_dir = os.path.join(wd, "stream_model")
    cfg2 = dict(cfg, bidirectional=False)
    cfg2_path = os.path.join(wd, "config_stream.yaml")
    open(cfg2_path, "w").write(yaml.safe_dump(cfg2))
    train_cli(["--config", cfg2_path, f"outputDir={stream_dir}"])
    params, model, margs = load_model(stream_dir)
    streamer = GRUStreamer(params, model.config, day_idx=0,
                           frames_per_chunk=1)
    x = data["test"][0]["sentenceDat"][0][None].astype(np.float32)
    emitted = []
    for t in range(0, x.shape[1] - x.shape[1] % 2, 2):
        out = streamer.process(x[:, t : t + 2])
        emitted += streamer.decode_greedy(out)[0]
    emitted += streamer.decode_greedy(streamer.flush())[0]
    truth = [
        id_to_phone(int(i))
        for i in data["test"][0]["phonemes"][0][: data["test"][0]["phoneLens"][0]]
    ]
    print(f"   streamed phonemes: {[id_to_phone(i) for i in emitted]}")
    print(f"   ground truth:      {truth}")

    # Live word-level decoding: the native lexicon+LM engine consumes the
    # streamed logits incrementally and surfaces partial n-best words
    # mid-utterance (same code path as the offline competition decode).
    from neural_speech_decoder_tpu.decoding.lm_decoder import (
        build_lm_decoder,
        native_available,
        open_stream,
    )

    if native_available():
        import math

        import jax.nn

        lm_dec = build_lm_decoder(lex_path, arpa_path, acoustic_scale=0.5,
                                  nbest=5, beam=25.0, max_active=200)
        streamer.reset()
        with open_stream(lm_dec) as lm_stream:
            partials = []
            for t in range(0, x.shape[1] - x.shape[1] % 2, 2):
                out = streamer.process(x[:, t : t + 2])
                if out.shape[1]:
                    lp = np.asarray(jax.nn.log_softmax(out[0], axis=-1))
                    lm_stream.feed(lp, blank_penalty=math.log(2))
                    # mid-word peeks can legitimately have no finalizable
                    # hypothesis yet (every beam is inside a word)
                    hyps = lm_stream.nbest()
                    partials.append(
                        " ".join(hyps[0].words)
                        if hyps and hyps[0].words else "·"
                    )
            out = streamer.flush()
            if out.shape[1]:
                lp = np.asarray(jax.nn.log_softmax(out[0], axis=-1))
                lm_stream.feed(lp, blank_penalty=math.log(2))
            hyps = lm_stream.nbest()
            final_words = hyps[0].words if hyps else []
        print(f"   live partial words: {partials}")
        print(f"   final words:        {final_words}")
        print(f"   spoken:             "
              f"{data['test'][0]['transcriptions'][0].split()}")

    print("== 5/5 deployment export (AOT serving artifact) ==")
    from neural_speech_decoder_tpu.serving import (
        export_streaming,
        load_exported_streamer,
    )

    art_dir = os.path.join(wd, "serving_artifact")
    export_streaming(stream_dir, art_dir, day_idx=0, frames_per_chunk=1)
    served = load_exported_streamer(art_dir)
    emitted_art = []
    for t in range(0, x.shape[1] - x.shape[1] % 2, 2):
        emitted_art += served.decode_greedy(served.feed(x[:, t : t + 2]))[0]
    emitted_art += served.decode_greedy(served.flush())[0]
    match = "==" if emitted_art == emitted else "!="
    print(f"   artifact phonemes:  {[id_to_phone(i) for i in emitted_art]} "
          f"({match} live streamer)")
    print("demo complete:", wd)


if __name__ == "__main__":
    main()
