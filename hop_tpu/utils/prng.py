"""Training PRNG key construction (threefry vs rbg).

The per-step dropout masks inside the frozen BERT backbone are the single
largest VPU load in the train step: with jax's default threefry2x32, mask
generation is fused into the FF matmul epilogues and throttles the MXU
pipeline (the 6-layer trunk ran at ~28% of v5e bf16 peak). Building the
ROOT training key with the ``rbg`` implementation routes all derived
``random_bits`` through XLA's hardware ``RngBitGenerator`` while key
derivation (``fold_in``/``split``) stays threefry — measured end-to-end:
fused 19.4 -> 21.0 steps/s, parity 13.6 -> 14.7 (bench.py, v5e, bs256).

Scope: ONLY the training loop's root key (cli/train_main.py, bench.py).
Param init, the serving-export signature (raw uint32[2] key data,
infer.export_forward) and the eval path keep the default threefry, so
artifacts and golden tests are unaffected. Dropout masks drawn from an
rbg key differ from threefry draws in value but not in distribution —
the same class of change as picking a different seed (the 3-seed FGD
study in BASELINE.md bounds the sensitivity).

Determinism: rbg bits are deterministic for a fixed XLA version/backend
but not guaranteed stable across XLA upgrades; exact-resume tests pin
HOP_TPU_PRNG=threefry where bitwise reproducibility across environments
matters.

Replaces: the reference relies on torch's global CUDA RNG for dropout
(no explicit seeding of mask streams at all, run_ted.py / train_llm.py).
"""

from __future__ import annotations

import os

import jax


def prng_impl() -> str:
    """Resolve HOP_TPU_PRNG: 'rbg' | 'threefry' | 'auto' (default).

    auto = rbg on TPU (measured +8% end-to-end step rate), threefry
    elsewhere (CPU tests and the multichip dryrun stay on the default
    impl, so nothing recompiles or changes numerics there)."""
    val = os.environ.get("HOP_TPU_PRNG", "auto").strip().lower()
    if val == "rbg":
        return "rbg"
    if val in ("threefry", "threefry2x32"):
        return "threefry2x32"
    if val not in ("", "auto"):
        raise ValueError(
            f"HOP_TPU_PRNG={val!r}: expected 'rbg', 'threefry' or 'auto'")
    return "rbg" if jax.default_backend() == "tpu" else "threefry2x32"


def train_key(seed: int) -> jax.Array:
    """Typed root key for the training loop. fold_in/split preserve the
    implementation, so every per-step dropout stream derived from it in
    train/loops.py inherits the fast generator."""
    return jax.random.key(seed, impl=prng_impl())
