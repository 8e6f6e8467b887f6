"""hop_tpu — TPU-native co-speech gesture generation framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of HOP
(Heterogeneous Topology-based Multimodal Entanglement for Co-Speech Gesture
Generation, reference at /root/reference): trimodal (audio, text, speaker)
gesture generation on the TED Gesture (9-bone) and TED Expressive (42-bone)
skeletons, plus the seq2seq / speech2gesture / joint-embedding /
trimodal-context GAN / hierarchical HA2G baselines, GAN+KLD+diversity
training, and on-device FGD / beat-consistency / diversity evaluation.

Layout:
  geometry     — skeleton tables, dir-vec <-> pose forward kinematics
  config       — typed configuration (replaces reference argparse flags)
  ops          — TPU compute primitives (mel frontend, GRU scan, sqrtm, ...)
  models       — flax.linen model zoo
  data         — host-side data pipeline (record store, vocab, preprocessing)
  train        — per-model jitted train steps + epoch loops
  eval         — FGD / BC / diversity / MAE metrics
  parallel     — jax.sharding mesh utilities, data/tensor-parallel helpers
  utils        — meters, checkpointing, logging
"""

__version__ = "0.1.0"
