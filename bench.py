"""Benchmark: HOP GAN train step throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is the full reference training configuration (run_ted.py:
batch 256, HOP with BERT-6L backbone + reprogramming + gwnet + 4-layer
BiGRU(350), ConvDiscriminator) running the complete GAN-phase step: three
generator forwards, three discriminator forwards, both optimizer updates
(train_eval/train_llm.py:15-86).

vs_baseline: the reference repo publishes no throughput numbers (it only
prints `speed: s/iter` at runtime, run_ted.py:436, on unspecified hardware).
We normalise against a nominal 1.0 s/iter PyTorch-reference estimate for
this 41M-param model at batch 256 on the reference's single-GPU setup;
BASELINE.md records that this is an estimate until a measured figure exists.
"""

import json
import time

import jax
import numpy as np

PYTORCH_BASELINE_STEPS_PER_SEC = 1.0  # nominal 1.0 s/iter (see docstring)


def main():
    import jax.numpy as jnp
    from hop_tpu.config import ted_config
    from hop_tpu.data import synthetic
    from hop_tpu.models.hop import HOPModel
    from hop_tpu.models.multimodal_context import ConvDiscriminator
    from hop_tpu.train.llm import make_hop_train_steps

    batch_size = 256
    # parity-mode step (the reference's exact 3-forward structure); the
    # fused variant (hop.fused_step=True) measures within noise of this —
    # the recurrent head's backward dominates either way.
    cfg = ted_config()

    batch = synthetic.make_batch(cfg, batch_size, seed=0)
    batch["text_padded"] = batch["text_padded"] % cfg.llm.vocab_size
    batch = synthetic.add_device_features(batch, cfg)
    b = {k: jnp.asarray(v) for k, v in batch.items()
         if k in ("in_audio", "log_mel", "text_padded", "target_vec",
                  "vid_indices")}

    model = HOPModel(cfg, n_speakers=10)
    disc = ConvDiscriminator()
    # jit the inits: eager flax init dispatches thousands of tiny ops,
    # which is pathological over the tunneled TPU
    gen_vars = jax.jit(lambda r: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(3)},
        b["in_audio"], b["log_mel"], b["text_padded"],
        b["target_vec"][:, :16], b["vid_indices"],
        rng=r, train=True))(jax.random.PRNGKey(1))
    dis_vars = jax.jit(lambda: disc.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(4)},
        b["target_vec"], train=True))()

    _, gan_step, init_state = make_hop_train_steps(cfg, model, disc)
    state = init_state(gen_vars, dis_vars)

    # compile + warm up
    state, metrics = gan_step(state, b, jax.random.PRNGKey(100))
    jax.block_until_ready(metrics["loss"])

    n_steps = 50  # long enough to average out tunnel jitter
    start = time.perf_counter()
    for i in range(n_steps):
        state, metrics = gan_step(state, b, jax.random.PRNGKey(200 + i))
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - start

    steps_per_sec = n_steps / elapsed
    print(json.dumps({
        "metric": "hop_ted_gan_train_steps_per_sec_per_chip_bs256",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / PYTORCH_BASELINE_STEPS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
