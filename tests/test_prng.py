"""HOP_TPU_PRNG: rbg training keys (utils/prng.py).

The training loop's root key may be built with the 'rbg' implementation
on TPU (dropout-mask bits via XLA RngBitGenerator instead of threefry
epilogues fused into the BERT matmuls — measured fused 19.4 -> 21.0
steps/s at bs256, BASELINE.md). These tests pin the flag resolution and
prove the full HOP GAN step runs off an rbg root key (the CPU-default
threefry path is what every other test exercises)."""

import numpy as np
import pytest

import jax

from hop_tpu.utils.prng import prng_impl, train_key


def test_impl_auto_is_threefry_off_tpu(monkeypatch):
    monkeypatch.delenv("HOP_TPU_PRNG", raising=False)
    assert jax.default_backend() != "tpu"  # conftest pins JAX_PLATFORMS=cpu
    assert prng_impl() == "threefry2x32"
    k = train_key(0)
    assert str(k.dtype) == "key<fry>"


def test_impl_forced(monkeypatch):
    monkeypatch.setenv("HOP_TPU_PRNG", "rbg")
    assert prng_impl() == "rbg"
    assert str(train_key(0).dtype) == "key<rbg>"
    monkeypatch.setenv("HOP_TPU_PRNG", "threefry")
    assert prng_impl() == "threefry2x32"
    monkeypatch.setenv("HOP_TPU_PRNG", "nonsense")
    with pytest.raises(ValueError):
        prng_impl()


def test_rbg_key_derivation_chain():
    """fold_in(fold_in(root, epoch), i) — the loops.py derivation —
    preserves the impl and is deterministic."""
    root = jax.random.key(7, impl="rbg")
    a = jax.random.fold_in(jax.random.fold_in(root, 3), 11)
    b = jax.random.fold_in(jax.random.fold_in(root, 3), 11)
    assert str(a.dtype) == "key<rbg>"
    np.testing.assert_array_equal(jax.random.key_data(a),
                                  jax.random.key_data(b))
    bits_a = np.asarray(jax.random.bernoulli(a, 0.5, (64,)))
    bits_b = np.asarray(jax.random.bernoulli(b, 0.5, (64,)))
    np.testing.assert_array_equal(bits_a, bits_b)


@pytest.mark.slow
def test_gan_step_runs_with_rbg_key():
    """The full HOP GAN step (dropout in BERT + reprogramming, CVAE
    sampling, GAN noise) accepts an rbg root key: finite metrics and a
    deterministic repeat."""
    import jax.numpy as jnp
    from hop_tpu.config import tiny_test_config
    from hop_tpu.data import synthetic
    from hop_tpu.models.hop import HOPModel
    from hop_tpu.models.multimodal_context import ConvDiscriminator
    from hop_tpu.train.llm import make_hop_train_steps

    cfg = tiny_test_config("TED")
    batch_np = synthetic.make_batch(cfg, 4, seed=0)
    batch_np["text_padded"] = batch_np["text_padded"] % cfg.llm.vocab_size
    batch_np = synthetic.add_device_features(batch_np, cfg)
    b = {k: jnp.asarray(v) for k, v in batch_np.items()
         if k in ("in_audio", "log_mel", "text_padded", "target_vec",
                  "vid_indices")}
    model = HOPModel(cfg, n_speakers=10)
    disc = ConvDiscriminator()
    gen_vars = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(3)},
        b["in_audio"], b["log_mel"], b["text_padded"],
        b["target_vec"][:, :16], b["vid_indices"],
        rng=jax.random.PRNGKey(1), train=True)
    dis_vars = disc.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(4)},
        b["target_vec"], train=True)
    warmup, gan, init_state = make_hop_train_steps(cfg, model, disc)

    key = jax.random.key(8, impl="rbg")
    s0 = init_state(gen_vars, dis_vars)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)  # noqa: E731
    state2, metrics = gan(copy(s0), b, key)
    for k in ("loss", "KLD", "DIV_REG", "gen", "dis"):
        assert np.isfinite(float(metrics[k])), k
    state3, metrics2 = gan(copy(s0), b, key)
    assert float(metrics2["loss"]) == float(metrics["loss"])
