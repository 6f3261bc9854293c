"""Write a reference-scale synthetic formatted dataset pickle.

Same schema as the reference formatter's output (``formatCompetitionData
.ipynb`` cell 6): 24 days, 256 channels, trial lengths 400-1200 bins,
structured phone-locked features (learnable signal) — the dataset the
full-duration reference-recipe drives train on (real competition data is
environment-blocked; see docs/REAL_DATA.md).

    python scripts/make_synth_refscale_dataset.py OUT.pkl [--trials 48]
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from neural_speech_decoder_tpu.data.synthetic import synthetic_dataset  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("out")
    p.add_argument("--trials", type=int, default=48,
                   help="train trials per day (test gets //4)")
    p.add_argument("--days", type=int, default=24)
    p.add_argument("--seed", type=int, default=1)
    cli = p.parse_args()

    ds = synthetic_dataset(
        seed=cli.seed, n_days=cli.days, trials_per_day=cli.trials,
        n_channels=256, min_t=400, max_t=1200, min_u=8, max_u=24,
        signal_scale=3.0,
    )
    with open(cli.out, "wb") as f:
        pickle.dump(ds, f, protocol=4)
    n_train = sum(len(d["sentenceDat"]) for d in ds["train"])
    n_test = sum(len(d["sentenceDat"]) for d in ds["test"])
    print(f"wrote {cli.out}: {cli.days} days, {n_train} train / "
          f"{n_test} test trials, {os.path.getsize(cli.out) / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
