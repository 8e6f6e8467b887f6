"""Input-pipeline overlap and wire-format features of the training loop.

The reference overlaps host batch prep with GPU compute via DataLoader
num_workers (run_ted.py:229) and ships float32 audio. Our loop gets the
same overlap from train.loops.prefetch_iter (order-preserving, so the
trajectory is bit-identical) and can halve the dominant H2D tensor with
DataConfig.audio_wire="int16" (cli/common._put_audio) — exact on the
16-bit PCM grid the TED wavs live on (librosa.load yields i/2^15).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hop_tpu.cli import common as C
from hop_tpu.config import tiny_test_config
from hop_tpu.data import synthetic
from hop_tpu.train.loops import prefetch_iter


def test_prefetch_iter_preserves_order_and_items():
    items = [{"i": np.full((3,), k)} for k in range(17)]
    out = list(prefetch_iter(iter(items), depth=4))
    assert len(out) == 17
    for k, b in enumerate(out):
        np.testing.assert_array_equal(b["i"], np.full((3,), k))


def test_prefetch_iter_depth_zero_is_passthrough():
    gen = (k for k in range(5))
    out = list(prefetch_iter(gen, depth=0))
    assert out == [0, 1, 2, 3, 4]


def test_prefetch_iter_reraises_producer_exception():
    def boom():
        yield 1
        yield 2
        raise ValueError("producer died")

    it = prefetch_iter(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="producer died"):
        list(it)


def test_prefetch_iter_early_close_stops_producer():
    """Breaking out of the consumer loop must not hang or leak the
    bounded queue; generator close sets the stop event."""
    it = prefetch_iter(iter(range(1000)), depth=2)
    assert next(it) == 0
    it.close()  # must not deadlock


def test_run_training_prefetch_trajectory_identical():
    """run_training with prefetch=2 replays the exact synchronous
    trajectory: same batches, same order, same per-step fold_in keys."""
    from hop_tpu.train.loops import run_training

    cfg = tiny_test_config("TED")

    def step(state, batch, rng):
        mix = jnp.sum(batch["x"]) + jax.random.fold_in(rng, 0)[0]
        return state + mix, {"loss": jnp.asarray(0.0)}

    def batches(epoch):
        for k in range(5):
            yield {"x": jnp.full((2, 3), epoch * 10 + k, jnp.float32)}

    runs = {}
    for depth in (0, 2):
        state, _ = run_training(
            cfg, batches, step, None, jnp.zeros((), jnp.float64),
            rng=jax.random.PRNGKey(7), epochs=3, log_every=2,
            prefetch=depth)
        runs[depth] = np.asarray(state)
    np.testing.assert_array_equal(runs[0], runs[2])


def test_audio_wire_int16_exact_on_pcm_grid():
    """Audio decoded from 16-bit PCM is i/2^15 — the int16 wire recovers
    it bitwise, so the model sees identical float32 input."""
    rng = np.random.default_rng(0)
    ints = rng.integers(-32768, 32768, size=(4, 1024), dtype=np.int64)
    audio = (ints / 32768.0).astype(np.float32)
    via_wire = np.asarray(C._put_audio(audio, "int16"))
    np.testing.assert_array_equal(via_wire, audio)
    assert via_wire.dtype == np.float32


def test_audio_wire_int16_bounded_error_and_saturation():
    rng = np.random.default_rng(1)
    audio = rng.uniform(-1.5, 1.5, size=(2, 512)).astype(np.float32)
    via_wire = np.asarray(C._put_audio(audio, "int16"))
    clipped = np.clip(audio, -1.0, 32767 / 32768.0)
    assert np.max(np.abs(via_wire - clipped)) <= 0.5 / 32768.0 + 1e-7


def test_device_batch_int16_wire_end_to_end():
    """device_batch under audio_wire=int16: float32 in_audio, log_mel
    within quantization tolerance of the f32 path; other fields exact."""
    import dataclasses
    cfg = tiny_test_config("TED")
    cfg16 = cfg.replace(data=dataclasses.replace(cfg.data,
                                                 audio_wire="int16"))
    hb = synthetic.make_batch(cfg, 4, seed=0)
    # snap fixture audio to the PCM grid so the comparison is exact
    hb["in_audio"] = (np.rint(np.clip(hb["in_audio"], -1, 0.999) * 32768.0)
                      / 32768.0).astype(np.float32)
    db32 = C.device_batch(hb, cfg, keys=C.MODEL_BATCH_KEYS["AD_LLM"])
    db16 = C.device_batch(hb, cfg16, keys=C.MODEL_BATCH_KEYS["AD_LLM"])
    assert db16["in_audio"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(db16["in_audio"]),
                                  np.asarray(db32["in_audio"]))
    np.testing.assert_array_equal(np.asarray(db16["log_mel"]),
                                  np.asarray(db32["log_mel"]))
    np.testing.assert_array_equal(np.asarray(db16["target_vec"]),
                                  np.asarray(db32["target_vec"]))


def test_device_batch_int16_wire_guard_clean():
    """The quantized path keeps the explicit-transfer discipline."""
    import dataclasses
    cfg = tiny_test_config("TED")
    cfg = cfg.replace(data=dataclasses.replace(cfg.data,
                                               audio_wire="int16"))
    hb = synthetic.make_batch(cfg, 4, seed=0)
    # warm the dequant jit cache outside the guard (compile-time constant
    # folding may touch the host; the steady-state call must not)
    C.device_batch(hb, cfg, keys=C.MODEL_BATCH_KEYS["AD_LLM"])
    with jax.transfer_guard_host_to_device("disallow"):
        db = C.device_batch(hb, cfg, keys=C.MODEL_BATCH_KEYS["AD_LLM"])
    assert "log_mel" in db
