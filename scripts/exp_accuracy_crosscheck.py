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
    a = ap.parse_args()
    seeds = [int(s) for s in a.seeds.split(",")]

    from neural_speech_decoder_tpu.data.synthetic import synthetic_dataset

    dataset = synthetic_dataset(**DATA_KW)

    torch_finals, torch_bests, jax_finals, jax_bests = [], [], [], []
    torch_s = jax_s = 0.0
    for seed in seeds:
        t0 = time.perf_counter()
        torch_pers = bench_torch(dataset, a.steps, a.eval_every, seed=seed)
        torch_s += time.perf_counter() - t0
        torch_finals.append(torch_pers[-1])
        torch_bests.append(min(torch_pers))
        print(f"torch seed {seed}: PER curve {torch_pers}", file=sys.stderr)

        t0 = time.perf_counter()
        summary = bench_jax(dataset, a.steps, a.eval_every,
                            f"{a.outdir}_s{seed}", seed=seed)
        jax_s += time.perf_counter() - t0
        jax_finals.append(summary["summary/final_cer"])
        jax_bests.append(summary["summary/best_cer"])
        print(f"jax seed {seed}: final {jax_finals[-1]:.3f} "
              f"best {jax_bests[-1]:.3f}", file=sys.stderr)

    rnd = lambda xs: [round(x, 4) for x in xs]
    print(json.dumps({
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
