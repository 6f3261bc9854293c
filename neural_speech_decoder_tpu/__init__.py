"""neural_speech_decoder_tpu — TPU-native speech-BCI phoneme decoding framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of the reference
PyTorch codebase (EdwardoSunny/Neural-Speech-Decoder): multielectrode neural
features -> per-day affine calibration -> Gaussian temporal smoothing ->
temporal unfold -> recurrent (GRU) or Conformer encoder -> CTC over 41 phoneme
classes, with training, evaluation (greedy PER), beam/LM decoding, streaming
inference, and data-parallel scaling over TPU meshes.

Layout:
  data/       dataset formatting, loading, static-shape batching
  ops/        compute ops (smoothing, unfold, CTC, decode, augmentation)
  models/     GRU + Conformer encoders as pure-functional pytree models
  training/   trainer, optimizers, checkpoints, metrics
  parallel/   mesh construction and sharding strategies (dp/tp)
  streaming/  chunked low-latency inference with carried recurrent state
  decoding/   beam search + LM rescoring (competition pipeline)
"""

__version__ = "0.1.0"
