"""Reprogramming cross-attention: mel frames attend over text prototypes.

Counterpart of reference model/HOP.py:255-299 (Time-LLM style). Queries are
the (B, 34, d_model=128) log-mel frames, keys/values are S=1500 learned
prototype embeddings projected from the frozen LLM's vocabulary table via
mapping_layer (HOP.py:115-116,200). The whole layer is three matmuls plus an
einsum attention — it fuses into a handful of MXU ops under XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


class ReprogrammingLayer(nn.Module):
    d_model: int          # query feature dim (mel bins)
    n_heads: int
    d_keys: int           # per-head key dim (configs.d_ff in the reference)
    d_llm: int
    attention_dropout: float = 0.1

    @nn.compact
    def __call__(self, target_embedding: jnp.ndarray,
                 source_embedding: jnp.ndarray,
                 value_embedding: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """(B, L, d_model), (S, d_llm), (S, d_llm) -> (B, L, d_llm)."""
        H, E = self.n_heads, self.d_keys
        B, L, _ = target_embedding.shape
        S = source_embedding.shape[0]

        q = nn.Dense(H * E, name="query_projection")(target_embedding)
        k = nn.Dense(H * E, name="key_projection")(source_embedding)
        v = nn.Dense(H * E, name="value_projection")(value_embedding)
        q = q.reshape(B, L, H, E)
        k = k.reshape(S, H, E)
        v = v.reshape(S, H, E)

        from hop_tpu.ops.pallas_reprogramming import (
            fused_reprogramming_attention, reprogramming_attention_enabled,
            operand_dtype, seed_from_key)
        if reprogramming_attention_enabled():
            # flash kernel: the (B, H, L, S=1500) probabilities never
            # leave VMEM (139 MB/tensor in HBM on the einsum path — see
            # ops/pallas_reprogramming.py); dropout mask comes from the
            # in-kernel PRNG, seeded from the flax dropout stream
            rate = 0.0 if deterministic else self.attention_dropout
            seed = (seed_from_key(self.make_rng("dropout")) if rate > 0.0
                    else jnp.zeros((1,), jnp.int32))
            dt = operand_dtype(q.dtype)
            out = fused_reprogramming_attention(
                q.astype(dt), jnp.transpose(k, (1, 0, 2)).astype(dt),
                jnp.transpose(v, (1, 0, 2)).astype(dt), seed,
                1.0 / E ** 0.5, rate)
            out = out.reshape(B, L, H * E)
        else:
            scores = jnp.einsum("blhe,she->bhls", q, k)
            attn = jax.nn.softmax(scores / (E ** 0.5), axis=-1)
            attn = nn.Dropout(self.attention_dropout)(
                attn, deterministic=deterministic)
            out = jnp.einsum("bhls,she->blhe", attn, v).reshape(B, L, H * E)
        out = nn.relu(out)
        return nn.Dense(self.d_llm, name="out_projection")(out)


class PrototypeMapper(nn.Module):
    """mapping_layer: vocab-sized linear mixing of the LLM embedding table.

    reference HOP.py:115-116,200: source = (W_emb^T -> Linear(vocab, S))^T,
    i.e. S prototype vectors, each a learned mixture over the vocabulary.
    """
    num_tokens: int

    @nn.compact
    def __call__(self, word_embeddings: jnp.ndarray) -> jnp.ndarray:
        """(vocab, d_llm) -> (num_tokens, d_llm)."""
        vocab = word_embeddings.shape[0]
        scale = 1.0 / vocab ** 0.5
        w = self.param("kernel",
                       lambda k, s: jax.random.uniform(k, s, jnp.float32,
                                                       -scale, scale),
                       (self.num_tokens, vocab))
        b = self.param("bias",
                       lambda k, s: jax.random.uniform(k, s, jnp.float32,
                                                       -scale, scale),
                       (self.num_tokens,))
        return w @ word_embeddings + b[:, None]
