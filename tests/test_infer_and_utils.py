"""Sliding-window inference, H36M loader, meters, checkpoint roundtrip."""

import numpy as np

import jax
import jax.numpy as jnp

from hop_tpu import geometry as G
from hop_tpu.config import ted_config
from hop_tpu.data.h36m import Human36M, normalize_h36m
from hop_tpu.data.vocab import Vocab
from hop_tpu.infer import generate_long_form
from hop_tpu.utils.meters import AverageMeter


def test_generate_long_form_stitching(rng):
    cfg = ted_config()
    sr = cfg.data.sample_rate
    clip_seconds = 7.0
    audio = rng.normal(size=int(clip_seconds * sr)).astype(np.float32) * 0.01
    words = [("hello", 0.5, 0.8), ("world", 1.5, 1.9), ("again", 4.0, 4.4)]
    lang = Vocab("w")
    lang.add_vocab([w[0] for w in words])
    seed = rng.normal(size=(16, 27)).astype(np.float32)

    calls = []

    def forward(in_audio, log_mel, text, pre_seq, vid, rng_step):
        calls.append((np.asarray(pre_seq).copy(), np.asarray(text).copy()))
        # deterministic fake generator: previous seed mean + ramp
        base = jnp.mean(pre_seq, axis=1, keepdims=True)
        ramp = jnp.linspace(0, 1, 34)[None, :, None]
        return jnp.broadcast_to(base, (1, 34, 27)) + ramp

    out = generate_long_form(cfg, forward, audio, words, seed, lang,
                             vid_index=0)
    # windows: unit 34/15 s, stride 2 s -> ceil((7 - 2.267)/2)+1 = 4
    assert len(calls) == 4
    # total frames: 34 + 3 * (34 - 4) = 124
    assert out.shape == (124, 27)
    # second call must be seeded by the first window's last 16 frames
    np.testing.assert_allclose(calls[1][0][0],
                               np.asarray(forward(None, None, None,
                                                  jnp.asarray(seed)[None],
                                                  None, None))[0, -16:],
                               atol=1e-5)
    # word ids present in at least one window's text slots
    assert any(c[1].max() > 0 for c in calls)
    assert np.all(np.isfinite(out))


def test_generate_long_form_hf_token_stream(rng):
    """With use_hf_token_stream, windows are driven by tokenizer ids placed
    at word frame slots (test_checkpoint.py:438-446), not vocab ids."""
    import dataclasses
    cfg = ted_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, use_hf_token_stream=True))
    sr = cfg.data.sample_rate
    audio = rng.normal(size=int(3.0 * sr)).astype(np.float32) * 0.01
    words = [("hello", 0.5, 0.8), ("world", 1.5, 1.9)]
    lang = Vocab("w")
    lang.add_vocab([w[0] for w in words])
    seed = rng.normal(size=(16, 27)).astype(np.float32)

    texts = []

    def forward(in_audio, log_mel, text, pre_seq, vid, rng_step):
        texts.append(np.asarray(text).copy())
        return jnp.zeros((1, 34, 27))

    def tok(text):  # 500-offset ids, one per word
        return [500 + i for i, _ in enumerate(text.split())]

    generate_long_form(cfg, forward, audio, words, seed, lang,
                       vid_index=0, tokenizer=tok)
    first = texts[0][0]
    frame_dur = (34 / 15) / 34
    assert first[int(np.floor(0.5 / frame_dur))] == 500
    assert first[int(np.floor(1.5 / frame_dur))] == 501
    # nothing from the fasttext vocab id space leaked in
    placed = first[first > 0]
    assert (placed >= 500).all()


def test_h36m_loader(rng):
    # fabricate positions for two subjects, 32 joints
    positions = {
        "S1": {"Walking": rng.normal(size=(140, 32, 3)) * 0.3},
        "S9": {"Eating": rng.normal(size=(140, 32, 3)) * 0.3},
    }
    ds = Human36M(positions, np.zeros(27, np.float32), is_train=True,
                  augment=True)
    assert len(ds) > 0
    poses, dir_vec = ds[0]
    assert poses.shape == (34, 10, 3)
    assert dir_vec.shape == (34, 27)
    # dir vectors are unit (mean 0 subtracted here)
    norms = np.linalg.norm(dir_vec.reshape(34, 9, 3), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    test_ds = Human36M(positions, np.zeros(27, np.float32), is_train=False)
    assert len(test_ds) > 0


def test_normalize_h36m_frontalizes(rng):
    data = rng.normal(size=(5, 12, 3))
    out = normalize_h36m(data)
    assert out.shape == (5, 10, 3)


def test_average_meter():
    m = AverageMeter("loss", ":.2f")
    m.update(2.0, 4)
    m.update(4.0, 4)
    assert m.avg == 3.0 and m.count == 8
    assert "loss" in str(m)
    m.reset()
    assert m.count == 0


def test_checkpoint_roundtrip(tmp_path):
    from hop_tpu.utils.checkpoint import CheckpointManager
    state = {"params": {"w": np.arange(6.0).reshape(2, 3)},
             "step": np.int32(3)}
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.metadata = {"model": "test", "n_speakers": 7}
    mgr.save(0, state, metadata={"fgd": 1.5})
    assert mgr.latest_step() == 0
    meta = mgr.run_metadata()
    assert meta["n_speakers"] == 7 and meta["fgd"] == 1.5
    restored = mgr.restore()
    np.testing.assert_array_equal(restored["state"]["params"]["w"],
                                  state["params"]["w"])
    assert mgr.record_best("frechet", 2.0, 0)
    assert not mgr.record_best("frechet", 3.0, 1)
    assert mgr.record_best("frechet", 1.0, 2)


def test_cli_help_renders():
    """argparse expands help text with %-formatting at --help time, so a
    bare % in any help string crashes the CLI (regression: '~40% faster'
    in --parity-step parsed as a '% f' float spec). Render every
    entry-point parser's help in-process."""
    import pytest as _pytest
    from hop_tpu.cli import (run_ted, run_expressive, test_checkpoint,
                             train_h36m_ae, export_model)
    from hop_tpu.data import import_ted
    from hop_tpu.eval import torch_export_hop
    for mod in (run_ted, run_expressive, test_checkpoint, train_h36m_ae,
                export_model, import_ted, torch_export_hop):
        with _pytest.raises(SystemExit) as exc:
            mod.main(["--help"])
        assert exc.value.code == 0, mod.__name__
