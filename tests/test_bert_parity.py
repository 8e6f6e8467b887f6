"""BertEncoder parity vs transformers.BertModel through the weight
converter (random HF init, no downloads). Validates both the flax
implementation and convert_hf_bert_params for loading real bert-base
checkpoints."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from hop_tpu.config import LLMConfig
from hop_tpu.models.bert import BertEncoder, convert_hf_bert_params

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def hf_and_flax():
    from transformers import BertConfig, BertModel
    cfg = LLMConfig(dim=64, n_layers=2, n_heads=4, intermediate_dim=128,
                    vocab_size=100, max_position=64, compute_bf16=False)
    hf_cfg = BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        intermediate_size=cfg.intermediate_dim,
        max_position_embeddings=cfg.max_position,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = BertModel(hf_cfg, add_pooling_layer=False).eval()
    params = convert_hf_bert_params(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return cfg, hf, BertEncoder(cfg), params


def test_token_forward_matches_hf(hf_and_flax, rng):
    cfg, hf, flax_bert, params = hf_and_flax
    ids = rng.integers(0, cfg.vocab_size, size=(2, 17))
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    got = flax_bert.apply({"params": params},
                          jnp.asarray(ids), deterministic=True,
                          method="encode_tokens")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_inputs_embeds_forward_matches_hf(hf_and_flax, rng):
    """The HOP path feeds raw embeddings (inputs_embeds, HOP.py:204)."""
    cfg, hf, flax_bert, params = hf_and_flax
    embeds = rng.normal(size=(2, 34, cfg.dim)).astype(np.float32)
    with torch.no_grad():
        want = hf(inputs_embeds=torch.from_numpy(embeds)
                  ).last_hidden_state.numpy()
    got = flax_bert.apply({"params": params}, jnp.asarray(embeds),
                          deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_einsum_attention_matches_hf(hf_and_flax, rng, monkeypatch):
    """The opt-in einsum attention formulation (HOP_TPU_BERT_EINSUM_ATTN=1,
    default OFF — a measured end-to-end loser, kept as an engineering
    record) is the same math as the Dense path: same param tree, HF
    parity, and an identical dropout RNG stream (both paths draw one
    Dropout_0 over (B, H, T, T) probs)."""
    cfg, hf, flax_bert, params = hf_and_flax
    embeds = rng.normal(size=(2, 34, cfg.dim)).astype(np.float32)
    with torch.no_grad():
        want = hf(inputs_embeds=torch.from_numpy(embeds)
                  ).last_hidden_state.numpy()

    monkeypatch.setenv("HOP_TPU_BERT_EINSUM_ATTN", "1")
    got = flax_bert.apply({"params": params}, jnp.asarray(embeds),
                          deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    # train-mode forwards agree between the two formulations with the
    # same dropout key -> the RNG stream (module path + draw order) is
    # unchanged, so parity/fused training is bitwise-insensitive to the
    # flag at the RNG level.
    key = jax.random.PRNGKey(7)
    got_train = flax_bert.apply({"params": params}, jnp.asarray(embeds),
                                deterministic=False,
                                rngs={"dropout": key})
    monkeypatch.setenv("HOP_TPU_BERT_EINSUM_ATTN", "0")
    want_train = flax_bert.apply({"params": params}, jnp.asarray(embeds),
                                 deterministic=False,
                                 rngs={"dropout": key})
    np.testing.assert_allclose(np.asarray(got_train), np.asarray(want_train),
                               rtol=1e-4, atol=1e-4)


def test_embed_tokens_is_word_table(hf_and_flax, rng):
    cfg, hf, flax_bert, params = hf_and_flax
    ids = rng.integers(0, cfg.vocab_size, size=(3, 5))
    got = flax_bert.apply({"params": params}, jnp.asarray(ids),
                          method="embed_tokens")
    want = hf.get_input_embeddings()(torch.from_numpy(ids)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
