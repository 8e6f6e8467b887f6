"""Exact resume: train(N) == train(k) + resume(N-k), bit-identically.

The reference cannot resume at all (save-only, SURVEY.md §5.4); here the
trajectory is a pure function of (seed, epoch, iteration) — per-step RNG is
fold_in(fold_in(seed_key, epoch), i) and batch order is seeded per epoch —
so restarting from the epoch-k checkpoint replays epochs k+1.. exactly.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hop_tpu.config import tiny_test_config
from hop_tpu.data import synthetic
from hop_tpu.eval.evaluate import EvalResult
from hop_tpu.models.multimodal_context import PoseGenerator, ConvDiscriminator
from hop_tpu.train.gan import make_gan_train_steps, build_pre_seq
from hop_tpu.train.loops import run_training
from hop_tpu.utils.checkpoint import (CheckpointManager, reattach_frozen,
                                      strip_frozen)


def _setup():
    cfg = tiny_test_config("TED")
    nb = synthetic.make_batch(cfg, 4, seed=0)
    nb["text_padded"] = nb["text_padded"] % 50
    b = {k: jnp.asarray(v) for k, v in nb.items()
         if k in ("target_vec", "text_padded", "in_audio", "vid_indices")}
    gen = PoseGenerator(pose_dim=27, n_words=50, n_speakers=10,
                        hidden_size=16, n_layers=2)
    disc = ConvDiscriminator()
    pre = build_pre_seq(b["target_vec"], cfg.data.n_pre_poses)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    gen_vars = gen.init(rngs, pre, b["text_padded"], b["in_audio"],
                        b["vid_indices"], rng=jax.random.PRNGKey(2),
                        train=True)
    dis_vars = disc.init(rngs, b["target_vec"], train=True)
    warmup, gan, init_state = make_gan_train_steps(cfg, gen, disc)
    return cfg, b, warmup, gan, init_state(gen_vars, dis_vars)


def _batches(b):
    def fn(epoch):
        yield b
        yield b
    return fn


def _eval_fn(state, epoch):
    # deterministic fake metric tied to the params so best-FGD tracking and
    # checkpoint cadence behave like the real loop
    leaf = jax.tree_util.tree_leaves(state.gen_params)[0]
    return EvalResult(loss=0.0, mae=0.0,
                      frechet_dist=float(jnp.abs(leaf).sum()),
                      feat_dist=0.0, bc=0.0, diversity=0.0, elapsed_sec=0.0)


@pytest.mark.slow
def test_resume_bit_identical(tmp_path, capsys):
    cfg, b, warmup, gan, state0 = _setup()
    rng = jax.random.PRNGKey(7)
    fresh = lambda: jax.tree_util.tree_map(jnp.array, state0)  # noqa: E731
    # (the train steps donate their state buffers, so each run gets a copy)

    # uninterrupted 4-epoch run
    m_full = str(tmp_path / "full.jsonl")
    full_state, full_best = run_training(
        cfg, _batches(b), warmup, gan, fresh(), rng,
        eval_fn=_eval_fn, metric_path=m_full, epochs=4, log_every=1)

    # 2 epochs with checkpointing ...
    ck = CheckpointManager(str(tmp_path / "ck"))
    ck.metadata = {}
    part_state, _ = run_training(
        cfg, _batches(b), warmup, gan, fresh(), rng,
        eval_fn=_eval_fn, checkpoint_manager=ck, epochs=2, log_every=1)

    # ... then restore and replay epochs 2-3 (the CLI resume path)
    meta = ck.run_metadata()
    assert meta["epoch"] == 1
    stripped, frozen = strip_frozen(state0)
    restored = ck.restore(template=stripped)["state"]
    restored = reattach_frozen(restored, frozen)
    m_res = str(tmp_path / "resumed.jsonl")
    res_state, res_best = run_training(
        cfg, _batches(b), warmup, gan, restored, rng,
        eval_fn=_eval_fn, metric_path=m_res, epochs=4,
        start_epoch=meta["epoch"] + 1, best_fgd=meta["best_fgd"],
        log_every=1)

    # final states bit-identical
    for a, c in zip(jax.tree_util.tree_leaves(full_state),
                    jax.tree_util.tree_leaves(res_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    assert full_best == res_best

    # metric stream for the replayed epochs is byte-equal
    full_rows = [json.loads(l) for l in open(m_full)]
    res_rows = [json.loads(l) for l in open(m_res)]
    full_tail = [r for r in full_rows if r["step"] >= 2]
    assert res_rows == full_tail


def test_strip_reattach_frozen():
    from hop_tpu.train.state import GANTrainState
    import optax
    params = {"llm": {"w": jnp.ones((4, 4))}, "head": {"w": jnp.zeros(3)}}
    tx = optax.sgd(0.1)
    state = GANTrainState.create(
        {"params": params}, {"params": {"d": jnp.ones(2)}}, tx, tx)
    stripped, frozen = strip_frozen(state)
    assert "llm" not in stripped.gen_params
    assert "head" in stripped.gen_params
    back = reattach_frozen(stripped, frozen)
    np.testing.assert_array_equal(back.gen_params["llm"]["w"],
                                  params["llm"]["w"])
    # no-op for states without an llm subtree
    s2, f2 = strip_frozen(stripped)
    assert f2 is None and s2 is stripped
