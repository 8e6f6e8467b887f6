"""The training hot loop is free of implicit host->device transfers.

SURVEY §2.7's communication row prescribes explicit host↔device movement
(`jax.device_put` + `jax.transfer_guard`); the reference has no analog
(DDP/NCCL transfers are implicit, run_ted.py:110-112). We pin it by
running real batch assembly (cli/common.device_batch) and a real HOP
train step under jax.transfer_guard_host_to_device("disallow"): the
only transfer the loop performs is device_batch's explicit device_put,
so the guard must stay silent. run_training wraps its inner loop in the
same guard when --transfer-guard is passed (train/loops.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hop_tpu.cli import common as C
from hop_tpu.config import tiny_test_config
from hop_tpu.data import synthetic


def test_device_batch_is_guard_clean():
    """Batch assembly alone (transfer + on-device mel) under disallow."""
    cfg = tiny_test_config("TED")
    hb = synthetic.make_batch(cfg, 4, seed=0)
    with jax.transfer_guard_host_to_device("disallow"):
        db = C.device_batch(hb, cfg,
                            keys=C.MODEL_BATCH_KEYS["AD_LLM"])
    assert "log_mel" in db and db["log_mel"].shape[0] == 4


@pytest.mark.slow
def test_hop_hot_loop_is_guard_clean():
    """device_batch + per-step fold_in + the jitted HOP warmup step —
    the exact sequence run_training executes inside its guard."""
    from hop_tpu.models.hop import HOPModel
    from hop_tpu.models.multimodal_context import ConvDiscriminator
    from hop_tpu.train.llm import make_hop_train_steps

    cfg = tiny_test_config("TED")
    hb = synthetic.make_batch(cfg, 4, seed=0)

    db = C.device_batch(hb, cfg, keys=C.MODEL_BATCH_KEYS["AD_LLM"])
    model = HOPModel(cfg, n_speakers=10)
    disc = ConvDiscriminator()
    gen_vars = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(3)},
        db["in_audio"], db["log_mel"], db["text_padded"],
        db["target_vec"][:, :16], db["vid_indices"],
        rng=jax.random.PRNGKey(1), train=True)
    dis_vars = disc.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(4)},
        db["target_vec"], train=True)
    warmup, gan, init_state = make_hop_train_steps(cfg, model, disc)
    state = init_state(gen_vars, dis_vars)
    epoch_rng = jax.random.fold_in(jax.random.PRNGKey(11), 0)

    with jax.transfer_guard_host_to_device("disallow"):
        for i in range(2):
            batch = C.device_batch(hb, cfg,
                                   keys=C.MODEL_BATCH_KEYS["AD_LLM"])
            rng_step = jax.random.fold_in(
                epoch_rng, jax.device_put(np.uint32(i)))
            state, metrics = warmup.for_epoch(1)(state, batch, rng_step)
    assert np.isfinite(float(metrics["loss"]))


def test_cli_flag_plumbs_through():
    p = C.base_parser("t")
    args = p.parse_args(["--transfer-guard", "disallow"])
    assert args.transfer_guard == "disallow"
    assert p.parse_args([]).transfer_guard == "off"


def test_run_training_honors_guard():
    """An intentionally dirty batch generator (raw numpy leaves) must
    raise under --transfer-guard disallow and pass under off."""
    from hop_tpu.train.loops import run_training

    cfg = tiny_test_config("TED")

    def step(state, batch, rng):
        # jnp.asarray on a host numpy array = the implicit transfer
        return state + 1 + jnp.asarray(batch["x"]).sum(), \
            {"loss": jnp.asarray(1.0)}

    def dirty_batches(epoch):
        yield {"x": np.zeros((4, 2), np.float32)}

    with pytest.raises(Exception):
        run_training(cfg, dirty_batches, step, None, jnp.asarray(0.0),
                     rng=jax.random.PRNGKey(0), epochs=1,
                     transfer_guard="disallow")

    state, _ = run_training(cfg, dirty_batches, step, None,
                            jnp.asarray(0.0),
                            rng=jax.random.PRNGKey(0), epochs=1)
    assert int(state) == 1
