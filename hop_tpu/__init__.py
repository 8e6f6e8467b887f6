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

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache (huge win on the tunneled TPU where
    a cold compile of the full GAN step costs minutes). Opt out with
    HOP_TPU_NO_COMPILE_CACHE=1."""
    if _os.environ.get("HOP_TPU_NO_COMPILE_CACHE"):
        return
    # CPU-only runs (tests, driver dryrun) must not share the cache: XLA:CPU
    # AOT results encode host machine features and can mis-execute when
    # loaded on a different toolchain/CPU (observed in this image).
    if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return
    try:
        import jax
        cache_dir = _os.environ.get(
            "HOP_TPU_COMPILE_CACHE",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


_enable_compilation_cache()
