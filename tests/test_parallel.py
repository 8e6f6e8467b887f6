"""Data-parallel correctness on the virtual 8-device CPU mesh.

The TPU-world analog of a fake-backend distributed test (SURVEY.md §4):
the pjit'd train step over a 'data'-sharded batch must produce the same
updated parameters as the unsharded single-device step — XLA's inserted
gradient psums must be exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from hop_tpu.config import tiny_test_config
from hop_tpu.data import synthetic
from hop_tpu.models.multimodal_context import PoseGenerator, ConvDiscriminator
from hop_tpu.parallel import (create_mesh, shard_batch, shard_state,
                              state_shardings, batch_sharding)
from hop_tpu.train.gan import make_gan_train_steps, build_pre_seq


def _setup(batch=8):
    cfg = tiny_test_config("TED")
    nb = synthetic.make_batch(cfg, batch, seed=0)
    nb["text_padded"] = nb["text_padded"] % 50
    b = {k: jnp.asarray(v) for k, v in nb.items()
         if k in ("target_vec", "text_padded", "in_audio", "vid_indices")}
    gen = PoseGenerator(pose_dim=27, n_words=50, n_speakers=10,
                        hidden_size=16, n_layers=2, dropout=0.0)
    disc = ConvDiscriminator()
    pre = build_pre_seq(b["target_vec"], cfg.data.n_pre_poses)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    gen_vars = gen.init(rngs, pre, b["text_padded"], b["in_audio"],
                        b["vid_indices"], rng=jax.random.PRNGKey(2),
                        train=True)
    dis_vars = disc.init(rngs, b["target_vec"], train=True)
    warmup, gan, init_state = make_gan_train_steps(cfg, gen, disc)
    return cfg, b, warmup, gan, init_state, gen_vars, dis_vars


def test_mesh_creation():
    mesh = create_mesh(4, 2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    cfg, b, warmup, gan, init_state, gen_vars, dis_vars = _setup()

    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

    # single device (fresh buffer copies: the steps donate their state)
    state1 = init_state(copy(gen_vars), copy(dis_vars))
    state1, m1 = warmup(state1, b, jax.random.PRNGKey(7))

    # 8-way data parallel
    mesh = create_mesh(8, 1)
    state2 = init_state(copy(gen_vars), copy(dis_vars))
    with mesh:
        state2 = shard_state(state2, mesh)
        sb = shard_batch(b, mesh)
        state2, m2 = warmup(state2, sb, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    l1 = jax.tree_util.tree_leaves_with_path(state1.gen_params)
    l2 = jax.tree_util.tree_leaves_with_path(state2.gen_params)
    for (p1, a), (_, bb) in zip(l1, l2):
        path = jax.tree_util.keystr(p1)
        # Conv biases immediately followed by BatchNorm have analytically
        # zero gradients (the mean subtraction cancels them); Adam then
        # amplifies float reduction-order noise to +-lr, so those leaves
        # legitimately differ between reduction orders. Every leaf with a
        # real gradient must match tightly.
        if "WavEncoder" in path and "bias" in path:
            continue
        diff = np.abs(np.asarray(a) - np.asarray(bb))
        assert diff.mean() < 1e-6, (path, diff.mean())
        assert diff.max() < 1e-3, (path, diff.max())


@pytest.mark.slow
def test_gan_step_runs_sharded():
    cfg, b, warmup, gan, init_state, gen_vars, dis_vars = _setup()
    mesh = create_mesh(8, 1)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    state = init_state(copy(gen_vars), copy(dis_vars))
    with mesh:
        state = shard_state(state, mesh)
        sb = shard_batch(b, mesh)
        state, m = gan(state, sb, jax.random.PRNGKey(9))
    for k in ("loss", "gen", "dis"):
        assert np.isfinite(float(m[k])), k


def test_state_shardings_structure():
    cfg, b, warmup, gan, init_state, gen_vars, dis_vars = _setup()
    mesh = create_mesh(8, 1)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    state = init_state(copy(gen_vars), copy(dis_vars))
    sh = state_shardings(state, mesh)
    # unannotated params replicate
    leaf = jax.tree_util.tree_leaves(sh)[0]
    assert leaf.spec == P()
    assert batch_sharding(mesh).spec == P("data")


def test_dcn_mesh_creation():
    mesh = create_mesh(2, 2, n_dcn=2)
    assert mesh.devices.shape == (2, 2, 2)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert batch_sharding(mesh).spec == P(("dcn", "data"))


@pytest.mark.slow
def test_dcn_sharded_step_matches_single_device():
    """Multi-slice analog (SURVEY §5.8): with an outer 'dcn' axis the
    batch shards over dcn x data jointly and the step must still equal
    the single-device update (grad psum spans both axes); ZeRO-2
    moments stay sharded over 'data' only so the optimizer all-gather
    never crosses the DCN boundary."""
    cfg, b, warmup, gan, init_state, gen_vars, dis_vars = _setup()
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

    state1 = init_state(copy(gen_vars), copy(dis_vars))
    state1, m1 = warmup(state1, b, jax.random.PRNGKey(7))

    mesh = create_mesh(4, 1, n_dcn=2)   # 2 slices x 4-way ICI data
    state2 = init_state(copy(gen_vars), copy(dis_vars))
    with mesh:
        state2 = shard_state(state2, mesh, zero2=True)
        from hop_tpu.parallel import zero2_spec
        for leaf in jax.tree_util.tree_leaves(state2.gen_opt_state):
            spec = leaf.sharding.spec
            assert spec == zero2_spec(leaf.shape, 4)
            assert not any(s == "dcn" for s in (spec or ()))
        sb = shard_batch(b, mesh)
        assert sb["target_vec"].sharding.spec == P(("dcn", "data"))
        state2, m2 = warmup(state2, sb, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    l1 = jax.tree_util.tree_leaves_with_path(state1.gen_params)
    l2 = jax.tree_util.tree_leaves_with_path(state2.gen_params)
    for (p1, a), (_, bb) in zip(l1, l2):
        path = jax.tree_util.keystr(p1)
        if "WavEncoder" in path and "bias" in path:
            continue  # zero-grad leaves: see comment in the test above
        diff = np.abs(np.asarray(a) - np.asarray(bb))
        assert diff.mean() < 1e-6, (path, diff.mean())
        assert diff.max() < 1e-3, (path, diff.max())


@pytest.mark.slow
def test_sharded_eval_matches_single_device():
    """Distributed eval (SURVEY §5.8, replacing the reference's
    single-device Evaluate.py:260-283 loop): evaluate_testset inside a
    mesh context shards each eval batch over 'data', the FGD feature
    extraction runs data-parallel, and the jitted mean/cov/Fréchet
    reduces the row-sharded features with XLA collectives. Scores must
    equal the single-device run bit-for-reduction-order; a ragged tail
    batch (drop_last=False) legitimately stays replicated."""
    from hop_tpu.eval.evaluate import evaluate_testset
    from hop_tpu.eval.fgd import EmbeddingSpaceEvaluator, make_ted_feature_fn
    from hop_tpu.models.embedding_net import EmbeddingNet

    cfg = tiny_test_config("TED")
    sizes = (16, 16, 6)   # two mesh-divisible batches + a ragged tail

    def batches():
        for i, n in enumerate(sizes):
            nb = synthetic.make_batch(cfg, n, seed=10 + i)
            yield {"target_vec": jnp.asarray(nb["target_vec"]),
                   "in_audio": jnp.asarray(nb["in_audio"])}

    seen_specs = []

    def gen(batch, vids, rng):
        seen_specs.append(getattr(batch["target_vec"].sharding, "spec",
                                  None))
        base = jnp.roll(batch["target_vec"], 1, axis=1)
        amp = jnp.mean(jnp.abs(batch["in_audio"]), axis=1)
        off = (vids.astype(jnp.float32) / 100.0)[:, None, None]
        return base * 0.9 + off + 0.01 * amp[:, None, None]

    net = EmbeddingNet(pose_dim=27, n_frames=cfg.data.n_poses,
                       n_words=50, mode="pose")
    poses = jnp.zeros((2, cfg.data.n_poses, 27))
    variables = net.init(jax.random.PRNGKey(0), None, None, poses[:, :4],
                         poses, input_mode="pose")

    def run():
        evaluator = EmbeddingSpaceEvaluator(
            make_ted_feature_fn(net, variables), trained=False)
        return evaluate_testset(batches(), gen, evaluator,
                                epoch=cfg.loss.bc_start_epoch + 1, cfg=cfg,
                                n_speakers=10, rng=jax.random.PRNGKey(5))

    r1 = run()                      # single device
    seen_specs.clear()
    mesh = create_mesh(8, 1)
    with mesh:
        r2 = run()

    # the two full batches were actually sharded; the tail was not
    assert seen_specs[0] == P("data") and seen_specs[1] == P("data")
    assert seen_specs[2] != P("data")

    np.testing.assert_allclose(r1.loss, r2.loss, rtol=1e-5)
    np.testing.assert_allclose(r1.mae, r2.mae, rtol=1e-5)
    np.testing.assert_allclose(r1.frechet_dist, r2.frechet_dist, rtol=2e-3)
    np.testing.assert_allclose(r1.feat_dist, r2.feat_dist, rtol=1e-4)
    np.testing.assert_allclose(r1.bc, r2.bc, rtol=1e-5)
    np.testing.assert_allclose(r1.diversity, r2.diversity, rtol=1e-4)


@pytest.mark.slow
def test_zero2_opt_state_sharding_matches_single_device():
    """ZeRO-2 analog (SURVEY §2.7; the reference's DeepSpeed plugin,
    run_ted.py:110-112): Adam moments sharded over the data axis. The
    update must equal the replicated-state update, and the moments must
    actually live sharded (1/N bytes per device)."""
    cfg, b, warmup, gan, init_state, gen_vars, dis_vars = _setup()
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

    state1 = init_state(copy(gen_vars), copy(dis_vars))
    state1, m1 = warmup(state1, b, jax.random.PRNGKey(7))

    mesh = create_mesh(8, 1)
    state2 = init_state(copy(gen_vars), copy(dis_vars))
    with mesh:
        state2 = shard_state(state2, mesh, zero2=True)
        # the placed moments are sharded over 'data'
        from hop_tpu.parallel import zero2_spec
        n_sharded = 0
        for leaf in jax.tree_util.tree_leaves(state2.gen_opt_state):
            spec = leaf.sharding.spec
            assert spec == zero2_spec(leaf.shape, 8)
            n_sharded += int(any(s == "data" for s in spec))
        assert n_sharded > 10  # real coverage, not a no-op
        sb = shard_batch(b, mesh)
        state2, m2 = warmup(state2, sb, jax.random.PRNGKey(7))
        # and STAY sharded through the jitted update
        mu_leaves = [leaf for leaf in
                     jax.tree_util.tree_leaves(state2.gen_opt_state)
                     if leaf.ndim >= 1 and any(
                         s == "data" for s in (leaf.sharding.spec or ()))]
        assert len(mu_leaves) > 10, "moments were re-replicated by XLA"

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    l1 = jax.tree_util.tree_leaves_with_path(state1.gen_params)
    l2 = jax.tree_util.tree_leaves_with_path(state2.gen_params)
    for (p1, a), (_, bb) in zip(l1, l2):
        path = jax.tree_util.keystr(p1)
        if "WavEncoder" in path and "bias" in path:
            continue  # zero-grad leaves: see comment in the test above
        diff = np.abs(np.asarray(a) - np.asarray(bb))
        assert diff.mean() < 1e-6, (path, diff.mean())
