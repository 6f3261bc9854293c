#!/usr/bin/env python
"""Export a framework run directory to the reference torch checkpoint.

One command completes the two-way migration story (docs/MIGRATION.md §5):

    python scripts/export_checkpoint.py <run_dir> <out_path>

loads the best-CER checkpoint via ``training.load_model`` (either model
family), converts it with ``models/torch_export.py``, and ``torch.save``s
a state dict the reference implementation loads with ``strict=True``
(GRU; ``neural_decoder_trainer.py:390-410``). Pass ``--last`` to export
the final state instead of the best.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run_dir", help="framework run directory")
    ap.add_argument("out", help="output path for the torch state dict")
    ap.add_argument("--nInputLayers", type=int, default=None,
                    help="day-count override (reference loadModel arg)")
    args = ap.parse_args(argv)

    import jax

    # Export is a host-side conversion; force CPU BEFORE any backend
    # query — even jax.default_backend() would initialize the pinned
    # remote-TPU platform (and hang through a dead tunnel).
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already initialized by the caller

    import numpy as np
    import torch

    from neural_speech_decoder_tpu.training.trainer import load_model

    params, model, margs = load_model(args.run_dir, args.nInputLayers)
    family = margs.get("model_type", "gru_baseline")
    if family == "transformer_ctc":
        from neural_speech_decoder_tpu.models.torch_export import (
            export_conformer_state_dict,
        )

        sd = export_conformer_state_dict(params, model.config)
    else:
        from neural_speech_decoder_tpu.models.torch_export import (
            export_gru_state_dict,
        )

        sd = export_gru_state_dict(params, model.config)
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()},
        args.out,
    )
    print(f"exported {family} checkpoint ({len(sd)} tensors) -> {args.out}")


if __name__ == "__main__":
    main()
