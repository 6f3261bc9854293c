"""Export a trained run directory as an AOT serving artifact.

Usage:
  python scripts/export_inference.py MODEL_DIR OUT_DIR \
      [--batch-size 64] [--t-max 1280] [--platform cpu|tpu]

The artifact (StableHLO blob + weights + meta, see
``neural_speech_decoder_tpu/serving/export.py``) is loadable with only
jax installed:

  from neural_speech_decoder_tpu.serving import load_exported
  model = load_exported(OUT_DIR)
  log_probs, out_lens = model(x, days, x_lens)

Export on the platform you will serve on — the kernel auto-gates choose
Pallas (TPU) vs portable XLA paths at trace time.
"""

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--t-max", type=int, default=None)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) before tracing")
    ap.add_argument("--streaming", action="store_true",
                    help="export the GRU streaming prime/step pair "
                         "(unidirectional checkpoints only) instead of "
                         "the batch forward")
    ap.add_argument("--day-idx", type=int, default=0)
    ap.add_argument("--frames-per-chunk", type=int, default=1)
    ap.add_argument("--causal", action="store_true")
    a = ap.parse_args(argv)

    import jax

    if a.platform:
        jax.config.update("jax_platforms", a.platform)

    sys.path.insert(0, ".")
    from neural_speech_decoder_tpu.serving import (
        export_inference,
        export_streaming,
    )

    if a.streaming:
        out = export_streaming(
            a.model_dir, a.out_dir, day_idx=a.day_idx,
            batch=a.batch_size or 1,
            frames_per_chunk=a.frames_per_chunk, causal=a.causal,
        )
    else:
        out = export_inference(
            a.model_dir, a.out_dir, batch_size=a.batch_size, t_max=a.t_max
        )
    print(f"exported -> {out}")


if __name__ == "__main__":
    main()
