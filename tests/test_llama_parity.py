"""LlamaEncoder numerics vs HuggingFace LlamaModel (the reference's LLAMA
backbone option, run_ted.py:133-175), plus the TP mesh path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hop_tpu.config import LLMConfig, llama7b_llm_config
from hop_tpu.models.llama import (LlamaEncoder, convert_hf_llama_params,
                                  make_llm_encoder, rope_cos_sin, apply_rope)

TINY = LLMConfig(model="LLAMA", dim=32, n_layers=2, n_heads=4,
                 intermediate_dim=64, vocab_size=97, max_position=64,
                 compute_bf16=False, rms_norm_eps=1e-6)


def _hf_model(cfg: LLMConfig, n_kv_heads=None):
    import torch
    from transformers import LlamaConfig, LlamaModel
    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.intermediate_dim,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=n_kv_heads or cfg.n_heads,
        max_position_embeddings=cfg.max_position,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        attn_implementation="eager")
    torch.manual_seed(0)
    model = LlamaModel(hf_cfg).eval()
    return model


@pytest.mark.slow
@pytest.mark.parametrize("n_kv", [None, 2])
def test_llama_matches_hf(n_kv):
    import torch
    cfg = TINY if n_kv is None else LLMConfig(
        **{**TINY.__dict__, "n_kv_heads": n_kv})
    hf = _hf_model(cfg, n_kv)
    params = convert_hf_llama_params(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)

    rng = np.random.default_rng(0)
    B, T = 3, 34
    embeds = rng.standard_normal((B, T, cfg.dim)).astype(np.float32)

    enc = LlamaEncoder(cfg)
    ours = enc.apply({"params": params}, jnp.asarray(embeds))

    with torch.no_grad():
        theirs = hf(inputs_embeds=torch.from_numpy(embeds)
                    ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs,
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_llama_token_path_matches_hf():
    import torch
    cfg = TINY
    hf = _hf_model(cfg)
    params = convert_hf_llama_params(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    ids = np.array([[1, 5, 9, 2, 0, 7]], dtype=np.int64)
    enc = LlamaEncoder(cfg)
    ours = enc.apply({"params": params}, jnp.asarray(ids),
                     method=enc.encode_tokens)
    with torch.no_grad():
        theirs = hf(input_ids=torch.from_numpy(ids)
                    ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs,
                               rtol=2e-4, atol=2e-4)


def test_rope_matches_hf_convention():
    import torch
    from transformers.models.llama.modeling_llama import (
        LlamaRotaryEmbedding, apply_rotary_pos_emb)
    from transformers import LlamaConfig
    head_dim, T = 8, 12
    hf_cfg = LlamaConfig(hidden_size=head_dim * 2, num_attention_heads=2,
                         rope_theta=10000.0)
    rot = LlamaRotaryEmbedding(config=hf_cfg)
    x = torch.randn(1, 2, T, head_dim)   # HF layout (B, H, T, D)
    pos = torch.arange(T)[None]
    cos_t, sin_t = rot(x, pos)
    q_hf, _ = apply_rotary_pos_emb(x, x, cos_t, sin_t)

    cos, sin = rope_cos_sin(T, head_dim, 10000.0)
    # ours is (B, T, H, D)
    q_ours = apply_rope(jnp.asarray(x.numpy().transpose(0, 2, 1, 3)),
                        cos, sin)
    np.testing.assert_allclose(np.asarray(q_ours).transpose(0, 2, 1, 3),
                               q_hf.numpy(), rtol=1e-5, atol=1e-5)


def test_unknown_backbone_rejected():
    cfg = LLMConfig(**{**TINY.__dict__, "model": "GPT2"})
    with pytest.raises(ValueError, match="not defined"):
        make_llm_encoder(cfg)


def test_llama7b_preset():
    cfg = llama7b_llm_config(2)
    assert cfg.dim == 4096 and cfg.n_layers == 2 and cfg.model == "LLAMA"


@pytest.mark.slow
def test_hop_with_llama_backbone_on_mesh():
    """HOP forward with the LLAMA backbone jitted over a data x model mesh
    (the TP annotations live on the q/k/v/gate/up (col) and o/down (row)
    kernels)."""
    import dataclasses
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from hop_tpu.config import tiny_test_config
    from hop_tpu.data import synthetic
    from hop_tpu.models.hop import HOPModel

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    cfg = tiny_test_config("TED")
    llm = dataclasses.replace(
        cfg.llm, model="LLAMA", compute_bf16=False,
        n_kv_heads=None, rope_theta=10000.0, rms_norm_eps=1e-6)
    cfg = cfg.replace(llm=llm)

    nb = synthetic.make_batch(cfg, 4, seed=0)
    nb["text_padded"] = nb["text_padded"] % cfg.llm.vocab_size
    nb = synthetic.add_device_features(nb, cfg)
    b = {k: jnp.asarray(v) for k, v in nb.items()
         if k in ("in_audio", "log_mel", "text_padded", "target_vec",
                  "vid_indices")}

    model = HOPModel(cfg, n_speakers=5)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, b["in_audio"], b["log_mel"],
                           b["text_padded"], b["target_vec"][:, :16],
                           b["vid_indices"], rng=jax.random.PRNGKey(2),
                           train=False)

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "model"))

    def fwd(v, audio, mel, text, pre, vid):
        out, *_ = model.apply(v, audio, mel, text, pre, vid,
                              rng=jax.random.PRNGKey(3), train=False)
        return out

    with mesh:
        dsharding = NamedSharding(mesh, P("data"))
        sb = {k: jax.device_put(v, dsharding) for k, v in b.items()}
        out = jax.jit(fwd)(variables, sb["in_audio"], sb["log_mel"],
                           sb["text_padded"], sb["target_vec"][:, :16],
                           sb["vid_indices"])
        out_ref = fwd(variables, b["in_audio"], b["log_mel"],
                      b["text_padded"], b["target_vec"][:, :16],
                      b["vid_indices"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)
