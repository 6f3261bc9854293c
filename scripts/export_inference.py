"""Repo-local shim for the packaged export CLI (``nsd-export``).

Usage:
  python scripts/export_inference.py MODEL_DIR OUT_DIR \
      [--batch-size 64] [--t-max 1280] [--platform cpu|tpu] \
      [--streaming --frames-per-chunk 2 --day-idx 0 [--causal]]

See ``neural_speech_decoder_tpu/serving/cli.py``.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from neural_speech_decoder_tpu.serving.cli import main

if __name__ == "__main__":
    main()
