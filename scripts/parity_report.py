"""One-command real-data parity rehearsal vs the reference implementation.

Takes a ``formatCompetitionData``-layout directory (or an already-formatted
pickle) plus a reference ``modelWeights`` torch state dict and emits the
full parity report:

  format (.mat -> pickle, notebook cells 0-6 semantics)
    -> torch checkpoint import (models/torch_import.py)
    -> fp32 logit diff vs the reference forward (when its source is given)
    -> greedy-decode PER on the test partition
          (reference measurement point: neural_decoder_trainer.py:313-333)
    -> competition WER via beam+LM decode [+ optional LLM rescore]
          (reference measurement point: eval_competition.py:141)

Usage (the whole docs/REAL_DATA.md recipe in one command):

    python scripts/parity_report.py \
        --checkpoint /runs/ref/modelWeights \
        --data-dir /data/competitionData           # or --dataset PICKLE
        [--args-pickle /runs/ref/args]             # reference run config
        [--reference-src /path/to/reference/src]   # enables logit diff
        [--lexicon lex.txt --lm lm.arpa [--llm HF_DIR]]  # enables WER
        [--out report.json]

Model hyperparameters are inferred from the state-dict shapes (hidden
size, layers, directions, day count, channels, kernel length) and only
non-inferable knobs (stride, smoothing width) come from the args pickle /
defaults, so a bare ``modelWeights`` file is enough.

The full chain (synthetic .mat sessions + synthetic torch checkpoint +
logit diff against /root/reference) is CI-tested in
``tests/test_parity_report.py``.
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def infer_gru_args(sd: dict, base_args: dict) -> dict:
    """Fill model hyperparameters from reference state-dict shapes."""
    args = dict(base_args)
    n_days, n_ch = np.asarray(sd["dayWeights"]).shape[:2]
    w_ih0 = np.asarray(sd["gru_decoder.weight_ih_l0"])  # [3H, C*k]
    hidden = w_ih0.shape[0] // 3
    n_layers = len(
        [k for k in sd if k.startswith("gru_decoder.weight_ih_l")
         and not k.endswith("_reverse")]
    )
    bidir = "gru_decoder.weight_ih_l0_reverse" in sd
    kernel = w_ih0.shape[1] // n_ch
    n_classes = np.asarray(sd["fc_decoder_out.weight"]).shape[0] - 1
    args.update(
        nInputFeatures=n_ch,
        nUnits=hidden,
        nLayers=n_layers,
        bidirectional=bidir,
        kernelLen=kernel,
        nClasses=n_classes,
        nDays=n_days,
    )
    args.setdefault("strideLen", 4)
    args.setdefault("gaussianSmoothWidth", 2.0)
    args.setdefault("dropout", 0.0)
    args.setdefault("model_type", "gru_baseline")
    return args


def logit_diff_vs_reference(reference_src, sd, params, model, dataset,
                            n_trials=8):
    """Max |fp32 logit diff| on real test trials, ours vs the reference
    torch forward (reference mounted read-only as a numerical oracle)."""
    if reference_src not in sys.path:
        sys.path.insert(0, reference_src)
    import torch

    import neural_decoder.model as ref_model

    import jax.numpy as jnp

    cfg = model.config
    torch_model = ref_model.GRUDecoder(
        neural_dim=cfg.neural_dim,
        n_classes=cfg.n_classes,
        hidden_dim=cfg.hidden_dim,
        layer_dim=cfg.num_layers,
        nDays=cfg.n_days,
        dropout=0.0,
        device="cpu",
        strideLen=cfg.stride_len,
        kernelLen=cfg.kernel_len,
        gaussianSmoothWidth=cfg.gaussian_smooth_width,
        bidirectional=cfg.bidirectional,
    )
    torch_model.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()},
        strict=False,  # the reference has dead inpLayer params we skip
    )
    torch_model.eval()

    max_diff, n_done = 0.0, 0
    for day_idx, day in enumerate(dataset["test"]):
        for t_i in range(len(day["sentenceDat"])):
            if n_done >= n_trials:
                break
            x = np.asarray(day["sentenceDat"][t_i], np.float32)[None]
            with torch.no_grad():
                ref_logits = torch_model(
                    torch.from_numpy(x), torch.tensor([day_idx])
                ).numpy()[0]
            ours, _, _ = model.forward(
                params, jnp.asarray(x), jnp.asarray([day_idx]),
                jnp.asarray([x.shape[1]]), train=False, key=None,
            )
            # our forward returns log-softmax; compare in that domain
            ref_ls = ref_logits - np.log(
                np.exp(ref_logits).sum(-1, keepdims=True)
            )
            t_cmp = min(ref_ls.shape[0], ours.shape[1])
            d = np.max(np.abs(np.asarray(ours)[0, :t_cmp] - ref_ls[:t_cmp]))
            max_diff = max(max_diff, float(d))
            n_done += 1
        if n_done >= n_trials:
            break
    return max_diff, n_done


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="reference modelWeights state-dict (torch.save)")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--data-dir",
                     help="raw formatCompetitionData layout (train/ test/ "
                          "[competitionHoldOut/] session .mat files)")
    src.add_argument("--dataset", help="already-formatted pickle")
    ap.add_argument("--args-pickle", default=None,
                    help="reference run's 'args' pickle (defaults to "
                         "<checkpoint_dir>/args when present)")
    ap.add_argument("--reference-src", default=None,
                    help="reference repo src/ for the fp32 logit-diff leg")
    ap.add_argument("--lexicon", default=None)
    ap.add_argument("--lm", default=None, help="ARPA LM (enables WER leg)")
    ap.add_argument("--llm", default=None,
                    help="local HF causal-LM dir for rescoring")
    ap.add_argument("--partition", default=None,
                    help="WER partition (default: competition if present, "
                         "else test)")
    ap.add_argument("--out", default=None, help="write report JSON here")
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args(argv)

    report: dict = {}

    # ---- 1. dataset -------------------------------------------------------
    if args.dataset:
        with open(args.dataset, "rb") as f:
            dataset = pickle.load(f)
        report["dataset"] = args.dataset
    else:
        from neural_speech_decoder_tpu.data import formatter

        names = sorted(
            os.path.splitext(n)[0]
            for n in os.listdir(os.path.join(args.data_dir, "train"))
            if n.endswith(".mat")
        )
        out_pickle = os.path.join(args.data_dir, "ptDecoder_ctc")
        dataset = formatter.format_competition_data(
            args.data_dir, out_pickle, session_names=names
        )
        report["dataset"] = out_pickle
        report["formatted_sessions"] = len(names)

    # ---- 2. checkpoint import --------------------------------------------
    import torch

    sd = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    sd = {k: np.asarray(v) for k, v in sd.items()}

    args_pickle = args.args_pickle or os.path.join(
        os.path.dirname(os.path.abspath(args.checkpoint)), "args"
    )
    base_args: dict = {}
    if os.path.exists(args_pickle):
        with open(args_pickle, "rb") as f:
            base_args = dict(pickle.load(f))
        report["args_pickle"] = args_pickle
    margs = infer_gru_args(sd, base_args)
    report["model_args"] = {
        k: margs[k]
        for k in ("nInputFeatures", "nUnits", "nLayers", "bidirectional",
                  "kernelLen", "strideLen", "nClasses", "nDays")
    }

    from neural_speech_decoder_tpu.models.torch_import import (
        import_gru_state_dict,
    )
    from neural_speech_decoder_tpu.training.trainer import build_model

    model = build_model(margs, n_days=margs["nDays"])
    params = import_gru_state_dict(sd, model.config)

    # ---- 3. logit diff (optional) ----------------------------------------
    if args.reference_src:
        diff, n_done = logit_diff_vs_reference(
            args.reference_src, sd, params, model, dataset
        )
        report["logit_max_abs_diff"] = diff
        report["logit_trials_compared"] = n_done
        print(f"fp32 logit max|diff| vs reference forward: {diff:.2e} "
              f"({n_done} trials)")

    # ---- 4. greedy PER on the test partition -----------------------------
    import jax.numpy as jnp

    from neural_speech_decoder_tpu.data.batching import choose_envelope
    from neural_speech_decoder_tpu.data.dataset import pack_days
    from neural_speech_decoder_tpu.training.trainer import (
        make_eval_step,
        run_eval,
    )

    test_ds = pack_days(dataset["test"])
    t_max, u_max = choose_envelope(test_ds, time_multiple=128)
    dp = lambda b: tuple(  # noqa: E731
        jnp.asarray(a) for a in (b.x, b.y, b.x_lens, b.y_lens, b.days)
    )
    loss, per, edit, seq = run_eval(
        make_eval_step(model), params, test_ds, args.batch_size, t_max,
        u_max, torch_mean_semantics=False, device_put=dp,
    )
    report["test_per"] = float(per)
    report["test_ctc_loss"] = float(loss)
    print(f"greedy test PER: {per:.4f} (ctc loss {loss:.3f}) "
          f"[reference point: neural_decoder_trainer.py:333]")

    # ---- 5. competition WER (optional) -----------------------------------
    if args.lm and not args.lexicon:
        # a lexicon-free decoder emits no words; the WER would read 1.0
        # and masquerade as a measured parity number
        raise SystemExit(
            "--lm requires --lexicon: word-level WER needs the "
            "lexicon-constrained decoder"
        )
    if args.lm or args.lexicon:
        from neural_speech_decoder_tpu.decoding.eval_competition import (
            collect_model_outputs,
            run_pipeline,
        )

        partition = args.partition or (
            "competition" if dataset.get("competition") else "test"
        )
        outputs = collect_model_outputs(
            None, dataset=dataset, partition=partition,
            batch_size=args.batch_size, model_bundle=(params, model),
        )
        llm_scorer = None
        if args.llm:
            from neural_speech_decoder_tpu.decoding.eval_competition import (
                _is_large_opt,
            )

            if _is_large_opt(args.llm):
                # reference-scale: streamed engine (never fp32-materialized)
                from neural_speech_decoder_tpu.decoding.llm_engine import (
                    engine_scorer,
                )

                llm_scorer = engine_scorer(args.llm)
            else:
                from neural_speech_decoder_tpu.decoding.jax_lm import (
                    jax_causal_scorer,
                )

                llm_scorer = jax_causal_scorer(args.llm)
        result = run_pipeline(
            outputs,
            lexicon_path=args.lexicon,
            arpa_path=args.lm,
            llm_scorer=llm_scorer,
        )
        report["wer_partition"] = partition
        report["wer"] = float(result["wer"])
        report["cer"] = float(result["cer"])
        report["beam_per"] = float(result["per"])
        print(f"competition WER: {result['wer']:.4f}  CER: "
              f"{result['cer']:.4f}  [{partition}; reference point: "
              f"eval_competition.py:141]")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2, default=str)
        print(f"report written to {args.out}")
    return report


if __name__ == "__main__":
    main()
