"""--llm-weights: pretrained frozen-backbone loading from an HF checkpoint
on disk (models/llm_weights.py).

The reference's live path loads a pretrained BERT
(BertModel.from_pretrained, run_ted.py:176-212; LLaMA variant :133-175).
These tests fabricate REAL HF-format checkpoints on disk with
`transformers.save_pretrained` (no downloads), then:

  * pin our disk-loaded BertEncoder forward against the live
    `BertModel.from_pretrained(that_dir)` — the full chain the real-data
    parity runbook will use;
  * drive one training step through the run_ted CLI with --llm-weights
    and assert the state's backbone equals the checkpoint;
  * verify every consistency check (vocab size, family, depth, --hf-vocab)
    fails fast with a specific message.
"""

import json
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from hop_tpu.config import LLMConfig
from hop_tpu.models.bert import BertEncoder
from hop_tpu.models.llm_weights import (check_vocab_consistency,
                                        install_llm_params, load_llm_params)

pytestmark = pytest.mark.slow

SMALL = LLMConfig(dim=64, n_layers=2, n_heads=4, intermediate_dim=128,
                  vocab_size=100, max_position=64, compute_bf16=False)


def _save_hf_bert(tmp_path, cfg=SMALL, n_layers=None, fmt="safetensors",
                  seed=0):
    from transformers import BertConfig, BertModel
    hf_cfg = BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        num_hidden_layers=n_layers or cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        intermediate_size=cfg.intermediate_dim,
        max_position_embeddings=cfg.max_position,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(seed)
    hf = BertModel(hf_cfg, add_pooling_layer=False).eval()
    d = str(tmp_path / "bert_ckpt")
    hf.save_pretrained(d, safe_serialization=(fmt == "safetensors"))
    return d, hf


@pytest.mark.parametrize("fmt", ["safetensors", "bin"])
def test_disk_roundtrip_matches_live_from_pretrained(tmp_path, fmt):
    """load_llm_params(dir) forward == BertModel.from_pretrained(dir)."""
    from transformers import BertModel
    d, _ = _save_hf_bert(tmp_path, fmt=fmt)
    fname = ("model.safetensors" if fmt == "safetensors"
             else "pytorch_model.bin")
    assert os.path.exists(os.path.join(d, fname))
    hf = BertModel.from_pretrained(d, add_pooling_layer=False).eval()

    params = jax.tree_util.tree_map(jnp.asarray,
                                    load_llm_params(d, SMALL))
    rng = np.random.default_rng(1)
    embeds = rng.normal(size=(2, 34, SMALL.dim)).astype(np.float32)
    with torch.no_grad():
        want = hf(inputs_embeds=torch.from_numpy(embeds)
                  ).last_hidden_state.numpy()
    got = BertEncoder(SMALL).apply({"params": params}, jnp.asarray(embeds),
                                   deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_deeper_checkpoint_truncates_like_from_pretrained(tmp_path):
    """A 4-layer checkpoint serves a 2-layer config (the reference builds
    num_hidden_layers=6 from the 12-layer bert-base artifact)."""
    d, hf = _save_hf_bert(tmp_path, n_layers=4)
    params = load_llm_params(d, SMALL)
    assert sorted(k for k in params if k.startswith("layer_")) == [
        "layer_0", "layer_1"]
    want = hf.state_dict()["encoder.layer.1.attention.self.query.weight"]
    np.testing.assert_array_equal(
        params["layer_1"]["attention"]["query"]["kernel"],
        want.numpy().T)


def test_bare_state_dict_file_and_task_prefix(tmp_path):
    """A bare .bin state dict whose keys carry the bert. task prefix."""
    d, hf = _save_hf_bert(tmp_path)
    sd = {"bert." + k: v for k, v in hf.state_dict().items()}
    sd["cls.predictions.bias"] = torch.zeros(SMALL.vocab_size)  # task head
    p = str(tmp_path / "wrapped.bin")
    torch.save(sd, p)
    params = load_llm_params(p, SMALL)
    np.testing.assert_array_equal(
        params["word_embeddings"]["embedding"],
        hf.state_dict()["embeddings.word_embeddings.weight"].numpy())


def test_geometry_mismatches_fail_fast(tmp_path):
    d, _ = _save_hf_bert(tmp_path)
    import dataclasses
    with pytest.raises(ValueError, match="vocab size"):
        load_llm_params(d, dataclasses.replace(SMALL, vocab_size=101))
    with pytest.raises(ValueError, match="hidden size"):
        load_llm_params(d, dataclasses.replace(SMALL, dim=128))
    with pytest.raises(ValueError, match="layers"):
        load_llm_params(d, dataclasses.replace(SMALL, n_layers=3))
    with pytest.raises(ValueError, match="BERT"):
        load_llm_params(d, dataclasses.replace(SMALL, model="LLAMA"))


def test_hf_vocab_consistency(tmp_path):
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(f"tok{i}" for i in range(SMALL.vocab_size))
                     + "\n")
    check_vocab_consistency("x", SMALL, str(vocab))  # 100 rows: ok
    vocab.write_text("\n".join(f"tok{i}" for i in range(7)) + "\n")
    with pytest.raises(ValueError, match="--hf-vocab"):
        check_vocab_consistency("x", SMALL, str(vocab))


def test_llama_checkpoint_from_disk(tmp_path):
    """LLaMA-family state dict (model. prefix, safetensors) loads into the
    LLAMA backbone geometry."""
    import dataclasses
    from safetensors.numpy import save_file
    cfg = dataclasses.replace(SMALL, model="LLAMA", n_heads=4,
                              intermediate_dim=96)
    rng = np.random.default_rng(0)

    def w(*shape):
        return rng.normal(size=shape).astype(np.float32)

    sd = {"model.embed_tokens.weight": w(cfg.vocab_size, cfg.dim),
          "model.norm.weight": w(cfg.dim)}
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = w(cfg.dim)
        sd[p + "post_attention_layernorm.weight"] = w(cfg.dim)
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            sd[p + f"self_attn.{proj}.weight"] = w(cfg.dim, cfg.dim)
        sd[p + "mlp.gate_proj.weight"] = w(cfg.intermediate_dim, cfg.dim)
        sd[p + "mlp.up_proj.weight"] = w(cfg.intermediate_dim, cfg.dim)
        sd[p + "mlp.down_proj.weight"] = w(cfg.dim, cfg.intermediate_dim)
    d = tmp_path / "llama_ckpt"
    d.mkdir()
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(
        {"num_hidden_layers": cfg.n_layers, "hidden_size": cfg.dim}))
    params = load_llm_params(str(d), cfg)
    np.testing.assert_array_equal(
        params["layer_0"]["self_attn"]["q_proj"]["kernel"],
        sd["model.layers.0.self_attn.q_proj.weight"].T)


def _ted_sized_bert(tmp_path, n_layers=2):
    """TED-geometry (768/30522) checkpoint for the CLI path."""
    cfg = LLMConfig(n_layers=n_layers)
    return _save_hf_bert(tmp_path, cfg=cfg, n_layers=n_layers)


def test_cli_trains_with_pretrained_backbone(tmp_path):
    """run_ted --llm-weights: one epoch through the CLI; the state's frozen
    backbone equals the fabricated checkpoint, and the checkpoint metadata
    records the path so restore_hop_model reloads it."""
    from hop_tpu.cli import run_ted
    from hop_tpu.cli.common import restore_hop_model
    from hop_tpu.config import ted_config
    from hop_tpu.utils.checkpoint import CheckpointManager

    d, hf = _ted_sized_bert(tmp_path)
    ck = str(tmp_path / "ck")
    run_ted.main(["--model", "AD_LLM", "--data", "synthetic",
                  "--synthetic-videos", "1", "--epochs", "1",
                  "--batch-size", "2", "--llm-layers", "2",
                  "--data-parallel", "1",
                  "--llm-weights", d, "--checkpoint-dir", ck,
                  "--log-every", "1000000"])
    meta = CheckpointManager(ck).run_metadata()
    assert meta["llm_weights"] == d

    cfg = ted_config()
    _, _, variables, _ = restore_hop_model(cfg, ck)
    got = variables["params"]["llm"]["word_embeddings"]["embedding"]
    np.testing.assert_array_equal(
        np.asarray(got),
        hf.state_dict()["embeddings.word_embeddings.weight"].numpy())


def test_install_preserves_partitioning(tmp_path):
    """install_llm_params keeps the flax meta.Partitioned boxes (the TP
    sharding annotations) while swapping the boxed arrays."""
    from flax.core import meta as flax_meta
    d, hf = _save_hf_bert(tmp_path)
    enc = BertEncoder(SMALL)
    variables = enc.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)},
                         jnp.zeros((1, 4, SMALL.dim)), deterministic=True)
    gen_vars = {"params": {"llm": variables["params"]}}
    out = install_llm_params(gen_vars, d, SMALL)
    q = out["params"]["llm"]["layer_0"]["attention"]["query"]["kernel"]
    assert isinstance(q, flax_meta.Partitioned)
    assert q.names == (None, "model")
    np.testing.assert_allclose(
        np.asarray(q.unbox()),
        hf.state_dict()["encoder.layer.0.attention.self.query.weight"]
        .numpy().T, rtol=1e-6, atol=1e-6)
