"""Serving export: jax.export round-trip of the generation forward.

The serialized StableHLO artifact must execute without model code and
reproduce the in-process forward exactly (same weights, same rng).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hop_tpu.config import tiny_test_config
from hop_tpu.infer import compile_forward, export_forward, load_exported
from hop_tpu.models.hop import HOPModel


def _inputs(rng, cfg, B=1):
    d = cfg.data
    # the serving/demo audio length is int(unit_time * sr) — one sample
    # short of the training path's rounded expected_audio_length, exactly
    # like the reference (test_checkpoint.py:384 int vs
    # lmdb_data_loader.py:77 round)
    alen = int(d.n_poses / d.pose_resampling_fps * d.sample_rate)
    return (
        jnp.asarray(rng.normal(size=(B, alen)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, d.n_poses, d.mel_bins))
                    .astype(np.float32)),
        jnp.asarray(rng.integers(0, cfg.llm.vocab_size, size=(B, d.n_poses)),
                    jnp.int32),
        jnp.asarray(rng.normal(size=(B, d.n_seed_frames, d.pose_dim))
                    .astype(np.float32)),
        jnp.asarray(rng.integers(0, 5, size=(B,)), jnp.int32),
    )


@pytest.mark.parametrize("dataset", ["TED", "TED_expressive"])
@pytest.mark.slow
def test_export_roundtrip_matches_direct_forward(rng, tmp_path, dataset):
    cfg = tiny_test_config(dataset)
    model = HOPModel(cfg, n_speakers=5)
    inputs = _inputs(rng, cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           *inputs, rng=jax.random.PRNGKey(1), train=False)

    blob = export_forward(model, variables, cfg, batch_size=1)
    # file round-trip, loaded like a serving runtime would
    path = tmp_path / "hop.hlo"
    path.write_bytes(blob)
    call = load_exported(path.read_bytes())

    from flax.core import meta as flax_meta
    step_key = jax.random.PRNGKey(7)
    rng_raw = jax.random.key_data(step_key).astype(jnp.uint32)
    got = call(flax_meta.unbox(variables), *inputs, rng_raw)

    # vs the eager forward: jit-vs-eager fusion noise only (measured
    # 5.8e-5 max abs on the tiny config)
    direct, *_ = model.apply(variables, *inputs, rng=step_key, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(direct),
                               rtol=1e-4, atol=5e-4)
    assert got.shape == (1, cfg.data.n_poses, cfg.data.pose_dim)

    # the exported artifact is BITWISE identical to the in-process
    # AOT-compiled serving path
    fwd = compile_forward(model, variables, cfg, batch_size=1)
    via_compiled = fwd(*inputs, rng_raw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(via_compiled))
