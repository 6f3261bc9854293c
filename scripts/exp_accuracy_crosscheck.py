"""Trained-accuracy cross-check: reference torch vs ours on identical data.

All accuracy evidence so far is either logit-level parity (same weights,
same input => same output: tests/test_gru_parity.py) or single-framework
training drives. This experiment closes the remaining gap that can be
closed without the real competition pickle: train BOTH implementations —
the actual reference torch code at /root/reference (imported read-only as
an oracle) and our framework — on the SAME synthetic dataset at the same
tiny recipe, and compare the greedy-decode phoneme error rate they reach.

The torch leg replicates the reference training loop exactly
(``neural_decoder_trainer.py:181-350``: fresh shuffled batch per step,
white-noise augmentation, CTC blank=0 mean zero_infinity, Adam(eps 0.1) +
linear LR, greedy decode argmax -> unique_consecutive -> drop blanks, CER
as summed edit distance / summed length). The JAX leg is a plain
``train_model(args)`` call on the same dataset object. RNG streams differ
across frameworks by construction, so the gate is statistical: both PERs
must fall from chance (~1.0+) to the same small-error regime.

Both model families are covered: ``--family gru`` (default) replicates the
Adam/LinearLR branch, ``--family conformer`` replicates the AdamW +
warmup-cosine + label-smoothing-KL + InterCTC + grad-clip branch
(``neural_decoder_trainer.py:144-161,221-260``) at a tiny 6-layer config
so InterCTC engages.

Usage:  python scripts/exp_accuracy_crosscheck.py [--steps 600]
Prints one JSON line:
  {"torch_final_per": ..., "jax_final_per": ..., ...}
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

# The verify-skill recipe: known-learnable in ~600 steps on one CPU core.
DATA_KW = dict(seed=1, n_days=2, trials_per_day=32, n_channels=32,
               min_t=60, max_t=100, min_u=3, max_u=5, signal_scale=4.0)
RECIPE = dict(batch=8, n_units=64, n_layers=2, stride=4, kernel=8,
              lr_start=0.005, lr_end=0.001, l2=1e-5, noise_sd=0.1,
              smooth_width=2.0)

# Tiny Conformer that still exercises every loss term: 6 layers so the
# InterCTC tap engages (transformer_ctc.py:411-415), label smoothing 0.1,
# AdamW + warmup-cosine, grad clip 1.0 (neural_decoder_trainer.py:144-161).
CONF_RECIPE = dict(batch=8, frontend_dim=32, latent_dim=32, ae_hidden=24,
                   n_layers=6, n_heads=2, ff_dim=64, dropout=0.1,
                   kernel=8, stride=4, conv_kernel=5, drop_path=0.1,
                   lr_start=4e-4, weight_decay=1e-3, warmup=100,
                   label_smoothing=0.1, interctc=0.3, noise_sd=0.1,
                   smooth_width=2.0, spec_freq=6, spec_time=4)


def _levenshtein(a, b):
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def _flatten(days):
    """Reference SpeechDataset semantics (dataset.py:5-40): flatten trials."""
    out = []
    for day_idx, day in enumerate(days):
        for i, x in enumerate(day["sentenceDat"]):
            u = int(day["phoneLens"][i])
            out.append((x, day["phonemes"][i][:u].astype(np.int64), day_idx))
    return out


def bench_torch(dataset, steps, eval_every, seed=0):
    sys.path.insert(0, "/root/reference/src")
    import torch
    from neural_decoder.model import GRUDecoder

    r = RECIPE
    torch.manual_seed(seed)
    np_rng = np.random.default_rng(seed)
    n_days = len(dataset["train"])
    model = GRUDecoder(
        neural_dim=DATA_KW["n_channels"], n_classes=40,
        hidden_dim=r["n_units"], layer_dim=r["n_layers"], nDays=n_days,
        dropout=0.0, device="cpu", strideLen=r["stride"],
        kernelLen=r["kernel"], gaussianSmoothWidth=r["smooth_width"],
        bidirectional=True,
    )
    loss_ctc = torch.nn.CTCLoss(blank=0, reduction="mean", zero_infinity=True)
    opt = torch.optim.Adam(model.parameters(), lr=r["lr_start"],
                           betas=(0.9, 0.999), eps=0.1,
                           weight_decay=r["l2"])
    sched = torch.optim.lr_scheduler.LinearLR(
        opt, start_factor=1.0, end_factor=r["lr_end"] / r["lr_start"],
        total_iters=steps,
    )

    train = _flatten(dataset["train"])
    test = _flatten(dataset["test"])

    def make_batch(trials):
        tmax = max(x.shape[0] for x, _, _ in trials)
        umax = max(len(y) for _, y, _ in trials)
        b = len(trials)
        x = torch.zeros(b, tmax, DATA_KW["n_channels"])
        y = torch.zeros(b, umax, dtype=torch.int64)
        xl = torch.zeros(b, dtype=torch.int64)
        yl = torch.zeros(b, dtype=torch.int64)
        dd = torch.zeros(b, dtype=torch.int64)
        for i, (xi, yi, di) in enumerate(trials):
            x[i, : xi.shape[0]] = torch.from_numpy(xi)
            y[i, : len(yi)] = torch.from_numpy(yi)
            xl[i], yl[i], dd[i] = xi.shape[0], len(yi), di
        return x, y, xl, yl, dd

    def eval_per():
        model.eval()
        dist = tot = 0
        with torch.no_grad():
            for i in range(0, len(test), r["batch"]):
                x, y, xl, yl, dd = make_batch(test[i : i + r["batch"]])
                pred = model(x, dd)
                out_lens = ((xl - r["kernel"]) / r["stride"]).to(torch.int32)
                for bi in range(x.shape[0]):
                    ids = torch.argmax(pred[bi, : out_lens[bi]], -1)
                    ids = torch.unique_consecutive(ids)
                    ids = ids[ids != 0].tolist()
                    true = y[bi, : yl[bi]].tolist()
                    dist += _levenshtein(ids, true)
                    tot += len(true)
        model.train()
        return dist / max(tot, 1)

    pers = []
    for step in range(steps):
        idx = np_rng.choice(len(train), size=r["batch"], replace=False)
        x, y, xl, yl, dd = make_batch([train[i] for i in idx])
        x = x + torch.randn_like(x) * r["noise_sd"]
        pred = model(x, dd)
        out_lens = ((xl - r["kernel"]) / r["stride"]).to(torch.int32)
        ls = torch.permute(pred.log_softmax(2), [1, 0, 2])
        loss = loss_ctc(ls, y, out_lens, yl)
        loss.backward()
        opt.step()
        sched.step()
        opt.zero_grad()
        if (step + 1) % eval_every == 0:
            pers.append(eval_per())
            print(f"  torch step {step + 1}: PER {pers[-1]:.3f}",
                  file=sys.stderr)
    return pers


def bench_torch_conformer(dataset, steps, eval_every, seed=0):
    """Reference Conformer branch (neural_decoder_trainer.py:84-105,
    144-161, 205-260): AdamW(eps 1e-6) + warmup-cosine, CTC(reduction
    none) -> (1-ls)*mean + ls*KL(batchmean to uniform), InterCTC 0.3
    (mean under label smoothing), grad clip 1.0."""
    import math

    sys.path.insert(0, "/root/reference/src")
    import torch
    from neural_decoder.transformer_ctc import NeuralTransformerCTCModel

    r = CONF_RECIPE
    torch.manual_seed(seed)
    np_rng = np.random.default_rng(seed)
    n_days = len(dataset["train"])
    n_classes = 41
    model = NeuralTransformerCTCModel(
        n_channels=DATA_KW["n_channels"], n_classes=n_classes,
        n_days=n_days, frontend_dim=r["frontend_dim"],
        latent_dim=r["latent_dim"], autoencoder_hidden_dim=r["ae_hidden"],
        transformer_layers=r["n_layers"], transformer_heads=r["n_heads"],
        transformer_ff_dim=r["ff_dim"], transformer_dropout=r["dropout"],
        temporal_kernel=r["kernel"], temporal_stride=r["stride"],
        gaussian_smooth_width=r["smooth_width"],
        conformer_conv_kernel=r["conv_kernel"], use_spec_augment=True,
        spec_augment_freq_mask=r["spec_freq"],
        spec_augment_time_mask=r["spec_time"],
        drop_path_prob=r["drop_path"], device="cpu",
    )
    loss_ctc = torch.nn.CTCLoss(blank=0, reduction="none",
                                zero_infinity=True)
    opt = torch.optim.AdamW(model.parameters(), lr=r["lr_start"],
                            betas=(0.9, 0.999), eps=1e-6,
                            weight_decay=r["weight_decay"])

    def lr_lambda(step):
        if step < r["warmup"]:
            return float(step + 1) / float(max(1, r["warmup"]))
        progress = (step - r["warmup"]) / float(max(1, steps - r["warmup"]))
        return 0.5 * (1.0 + math.cos(math.pi * progress))

    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lr_lambda)

    train = _flatten(dataset["train"])
    test = _flatten(dataset["test"])

    def make_batch(trials):
        tmax = max(x.shape[0] for x, _, _ in trials)
        umax = max(len(y) for _, y, _ in trials)
        b = len(trials)
        x = torch.zeros(b, tmax, DATA_KW["n_channels"])
        y = torch.zeros(b, umax, dtype=torch.int64)
        xl = torch.zeros(b, dtype=torch.int64)
        yl = torch.zeros(b, dtype=torch.int64)
        dd = torch.zeros(b, dtype=torch.int64)
        for i, (xi, yi, di) in enumerate(trials):
            x[i, : xi.shape[0]] = torch.from_numpy(xi)
            y[i, : len(yi)] = torch.from_numpy(yi)
            xl[i], yl[i], dd[i] = xi.shape[0], len(yi), di
        return x, y, xl, yl, dd

    def eval_per():
        model.eval()
        dist = tot = 0
        with torch.no_grad():
            for i in range(0, len(test), r["batch"]):
                x, y, xl, yl, dd = make_batch(test[i : i + r["batch"]])
                pred, adj, _ = model(x, dd, xl)  # [T',B,C]
                for bi in range(x.shape[0]):
                    ids = torch.argmax(pred[: adj[bi], bi], -1)
                    ids = torch.unique_consecutive(ids)
                    ids = ids[ids != 0].tolist()
                    true = y[bi, : yl[bi]].tolist()
                    dist += _levenshtein(ids, true)
                    tot += len(true)
        model.train()
        return dist / max(tot, 1)

    ls, icw = r["label_smoothing"], r["interctc"]
    pers = []
    for step in range(steps):
        idx = np_rng.choice(len(train), size=r["batch"], replace=False)
        x, y, xl, yl, dd = make_batch([train[i] for i in idx])
        x = x + torch.randn_like(x) * r["noise_sd"]
        log_probs, out_lens, inter_log_probs = model(x, dd, xl)
        loss = loss_ctc(log_probs, y, out_lens, yl)
        ctc_loss = torch.mean(loss)
        uniform = torch.full_like(log_probs, -math.log(n_classes))
        kl = torch.nn.functional.kl_div(log_probs, uniform,
                                        reduction="batchmean",
                                        log_target=True)
        main = (1 - ls) * ctc_loss + ls * kl
        if inter_log_probs is not None:
            inter = torch.mean(loss_ctc(inter_log_probs, y, out_lens, yl))
            total = (1.0 - icw) * main + icw * inter
        else:
            total = main
        opt.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm=1.0)
        opt.step()
        sched.step()
        if (step + 1) % eval_every == 0:
            pers.append(eval_per())
            print(f"  torch step {step + 1}: PER {pers[-1]:.3f}",
                  file=sys.stderr)
    return pers


def bench_jax_conformer(dataset, steps, eval_every, outdir, seed=0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from neural_speech_decoder_tpu.training import train_model

    r = CONF_RECIPE
    args = {
        "outputDir": outdir, "dataset": dataset, "batchSize": r["batch"],
        "nBatch": steps + 1, "evalEvery": eval_every, "seed": seed,
        "model_type": "transformer_ctc",
        "nInputFeatures": DATA_KW["n_channels"], "nClasses": 40,
        "temporal_kernel": r["kernel"], "temporal_stride": r["stride"],
        "gaussian_smooth_width": r["smooth_width"],
        "whiteNoiseSD": r["noise_sd"], "constantOffsetSD": 0.0,
        "frontend_dim": r["frontend_dim"], "latent_dim": r["latent_dim"],
        "autoencoder_hidden_dim": r["ae_hidden"],
        "transformer_num_layers": r["n_layers"],
        "transformer_n_heads": r["n_heads"],
        "transformer_dim_ff": r["ff_dim"],
        "transformer_dropout": r["dropout"],
        "conformer_conv_kernel": r["conv_kernel"],
        "drop_path_prob": r["drop_path"], "optimizer": "adamw",
        "lrStart": r["lr_start"], "lrEnd": 1e-5,
        "weight_decay": r["weight_decay"], "warmup_steps": r["warmup"],
        "label_smoothing": r["label_smoothing"],
        "use_spec_augment": True,
        "spec_augment_freq_mask": r["spec_freq"],
        "spec_augment_time_mask": r["spec_time"],
        "interctc_weight": r["interctc"],
        "wandb_mode": "disabled", "time_multiple": 32,
    }
    return train_model(args)


def bench_jax(dataset, steps, eval_every, outdir, seed=0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from neural_speech_decoder_tpu.training import train_model

    r = RECIPE
    args = {
        "outputDir": outdir, "dataset": dataset, "batchSize": r["batch"],
        "lrStart": r["lr_start"], "lrEnd": r["lr_end"], "l2_decay": r["l2"],
        "nBatch": steps + 1, "evalEvery": eval_every,
        "whiteNoiseSD": r["noise_sd"], "constantOffsetSD": 0.0,
        "gaussianSmoothWidth": r["smooth_width"], "nUnits": r["n_units"],
        "nLayers": r["n_layers"], "nInputFeatures": DATA_KW["n_channels"],
        "nClasses": 40, "dropout": 0.0, "strideLen": r["stride"],
        "kernelLen": r["kernel"], "bidirectional": True, "seed": seed,
        "wandb_mode": "disabled", "time_multiple": 32,
    }
    summary = train_model(args)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--outdir", default="/tmp/acc_crosscheck")
    ap.add_argument("--seeds", default="0",
                    help="comma list of train seeds; both legs run per seed "
                         "so the cross-framework gap can be read against "
                         "the within-framework seed spread")
    ap.add_argument("--family", default="gru", choices=["gru", "conformer"])
    a = ap.parse_args()
    seeds = [int(s) for s in a.seeds.split(",")]
    torch_leg = bench_torch if a.family == "gru" else bench_torch_conformer
    jax_leg = bench_jax if a.family == "gru" else bench_jax_conformer

    from neural_speech_decoder_tpu.data.synthetic import synthetic_dataset

    dataset = synthetic_dataset(**DATA_KW)

    torch_finals, torch_bests, jax_finals, jax_bests = [], [], [], []
    torch_s = jax_s = 0.0
    for seed in seeds:
        t0 = time.perf_counter()
        torch_pers = torch_leg(dataset, a.steps, a.eval_every, seed=seed)
        torch_s += time.perf_counter() - t0
        torch_finals.append(torch_pers[-1])
        torch_bests.append(min(torch_pers))
        print(f"torch seed {seed}: PER curve {torch_pers}", file=sys.stderr)

        t0 = time.perf_counter()
        summary = jax_leg(dataset, a.steps, a.eval_every,
                          f"{a.outdir}_s{seed}", seed=seed)
        jax_s += time.perf_counter() - t0
        jax_finals.append(summary["summary/final_cer"])
        jax_bests.append(summary["summary/best_cer"])
        print(f"jax seed {seed}: final {jax_finals[-1]:.3f} "
              f"best {jax_bests[-1]:.3f}", file=sys.stderr)

    rnd = lambda xs: [round(x, 4) for x in xs]
    print(json.dumps({
        "family": a.family,
        "seeds": seeds,
        "torch_final_per": rnd(torch_finals),
        "torch_best_per": rnd(torch_bests),
        "jax_final_per": rnd(jax_finals),
        "jax_best_per": rnd(jax_bests),
        "torch_best_mean": round(float(np.mean(torch_bests)), 4),
        "jax_best_mean": round(float(np.mean(jax_bests)), 4),
        "steps": a.steps,
        "torch_wall_s": round(torch_s, 1),
        "jax_wall_s": round(jax_s, 1),
    }))


if __name__ == "__main__":
    main()
