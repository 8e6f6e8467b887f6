"""Compact BERT-style transformer encoder (the frozen LLM backbone).

Counterpart of the reference's HuggingFace BertModel with
num_hidden_layers=6, used frozen (reference run_ted.py:176-212, HOP.py:90-91,
204). Rewritten in flax rather than wrapping HF so that:

  * the whole forward lives in one jit region (the reference re-enters
    Python per module);
  * the big kernels carry jax.sharding partitioning metadata: QKV/out
    projections and the FFN are annotated for tensor parallelism over a
    'model' mesh axis, which is what makes the optional LLaMA-7B-sized
    backbone (run_ted.py:133-175) feasible on a TPU slice;
  * weights can be loaded from an HF checkpoint via
    `convert_hf_bert_params` when one is available locally.

Semantics match BertModel(inputs_embeds=...): position + token-type
embeddings are added to the provided embeddings, then LayerNorm + dropout,
then post-LN encoder blocks with GELU FFN. No attention mask (the reference
never passes one).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from hop_tpu.config import LLMConfig


def _compute_dtype(cfg: LLMConfig):
    """bf16 matmuls inside the frozen backbone (params stay f32; LayerNorm
    and residual sums stay f32). The backbone is frozen, so reduced matmul
    precision affects only the conditioning signal, and the MXU runs at
    twice the f32 throughput."""
    return jnp.bfloat16 if cfg.compute_bf16 else jnp.float32


def _col(init):
    """Column-parallel kernel: shard output features over 'model'."""
    return nn.with_partitioning(init, (None, "model"))


def _row(init):
    """Row-parallel kernel: shard input features over 'model'."""
    return nn.with_partitioning(init, ("model", None))


def einsum_attention_enabled() -> bool:
    """Attention as direct 3D->4D einsums against reshaped (f, H, D)
    kernel views, skipping the Dense->(B,T,H,D) bitcast boundary where
    the trace shows Q/K/V relayout copies. MEASURED LOSER end-to-end on
    v5e (bs256 GAN step: fused 19.3 -> 13.8 steps/s, parity 13.5 -> 13.5)
    — denying XLA the plain 2D Dense matmuls breaks its attention
    fusions, which cost far more than the relayouts saved. Kept as an
    engineering record (same parameter tree as the Dense path, parity
    tested in test_bert_parity.py); opt in with
    HOP_TPU_BERT_EINSUM_ATTN=1."""
    import os
    v = os.environ.get("HOP_TPU_BERT_EINSUM_ATTN", "").strip()
    return v not in ("", "0", "false", "off")


class _ProjParams(nn.Module):
    """Declares a Dense-shaped (kernel, bias) pair WITHOUT applying it, so
    the einsum attention path can reshape the kernel to (f, H, D) views
    while keeping the exact parameter tree of nn.Dense (converter- and
    checkpoint-compatible)."""
    features: int
    kernel_init: object

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", self.kernel_init,
                            (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class BertSelfAttention(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        cfg = self.cfg
        head_dim = cfg.dim // cfg.n_heads
        dense_init = nn.initializers.normal(0.02)
        dt = _compute_dtype(cfg)
        if einsum_attention_enabled():
            return self._einsum_attention(x, deterministic, dt, head_dim,
                                          dense_init)
        q = nn.Dense(cfg.dim, kernel_init=_col(dense_init), dtype=dt,
                     name="query")(x)
        k = nn.Dense(cfg.dim, kernel_init=_col(dense_init), dtype=dt,
                     name="key")(x)
        v = nn.Dense(cfg.dim, kernel_init=_col(dense_init), dtype=dt,
                     name="value")(x)
        B, T, _ = x.shape
        q = q.reshape(B, T, cfg.n_heads, head_dim)
        k = k.reshape(B, T, cfg.n_heads, head_dim)
        v = v.reshape(B, T, cfg.n_heads, head_dim)
        from hop_tpu.ops.pallas_attention import (fused_attention,
                                                  pallas_attention_enabled)
        from hop_tpu.ops.pallas_block_attention import (
            block_attention, block_attention_enabled, operand_dtype)
        if pallas_attention_enabled() or block_attention_enabled():
            # opt-in pallas attention; BOTH kernels measured slower than
            # XLA's fused path at T=34 and default OFF (kept as
            # engineering records): v1 per-head (HOP_TPU_PALLAS_ATTN=1,
            # ops/pallas_attention.py), v2 block-diagonal
            # (HOP_TPU_PALLAS_BLOCK_ATTN=1, ops/pallas_block_attention.py
            # — NB x T rows fused into one MXU matmul per head,
            # cross-sample scores masked to -inf). Dropout mask comes
            # from the in-kernel PRNG, seeded from the flax dropout
            # stream.
            rate = 0.0 if deterministic else 0.1
            if rate > 0.0:
                key = self.make_rng("dropout")
                seed = jax.random.key_data(key).reshape(-1)[:1].astype(
                    jnp.int32)
            else:
                seed = jnp.zeros((1,), jnp.int32)
            if pallas_attention_enabled():
                ctx = fused_attention(q, k, v, seed, 1.0 / head_dim ** 0.5,
                                      rate).reshape(B, T, cfg.dim)
            else:
                bdt = operand_dtype(q.dtype)
                ctx = block_attention(
                    q.astype(bdt), k.astype(bdt), v.astype(bdt), seed,
                    1.0 / head_dim ** 0.5, rate).reshape(B, T, cfg.dim)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (head_dim ** 0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            probs = nn.Dropout(0.1)(probs, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dt),
                             v).reshape(B, T, cfg.dim)
        out = nn.Dense(cfg.dim, kernel_init=_row(dense_init), dtype=dt,
                       name="out")(ctx)
        return out.astype(jnp.float32)

    def _einsum_attention(self, x, deterministic, dt, head_dim, dense_init):
        """Q/K/V as btf,fhd->bhtd einsums on (f, H, D) kernel VIEWS (weight
        reshapes are free constants), attention in (B, H, T, ...) form, and
        the output projection contracting (H, D) directly — the activations
        never pass a reshape/bitcast whose layout change XLA must
        materialise. Math identical to the Dense path (test_bert_parity
        runs both)."""
        cfg = self.cfg
        H, D = cfg.n_heads, head_dim
        B, T, F = x.shape
        xc = x.astype(dt)

        def proj(name, init):
            kernel, bias = _ProjParams(cfg.dim, init, name=name)(F)
            k4 = kernel.reshape(F, H, D).astype(dt)
            return (jnp.einsum("btf,fhd->bhtd", xc, k4)
                    + bias.reshape(1, H, 1, D).astype(dt))

        q = proj("query", _col(dense_init))
        k = proj("key", _col(dense_init))
        v = proj("value", _col(dense_init))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (D ** 0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(0.1)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dt), v)
        kernel, bias = _ProjParams(cfg.dim, _row(dense_init), name="out")(F)
        out = (jnp.einsum("bhtd,hdf->btf", ctx,
                          kernel.reshape(H, D, cfg.dim).astype(dt))
               + bias.astype(dt))
        return out.astype(jnp.float32)


class BertLayer(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        cfg = self.cfg
        dense_init = nn.initializers.normal(0.02)
        attn = BertSelfAttention(cfg, name="attention")(x, deterministic)
        attn = nn.Dropout(0.1)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="attention_ln")(x + attn)
        dt = _compute_dtype(cfg)
        h = nn.Dense(cfg.intermediate_dim, kernel_init=_col(dense_init),
                     dtype=dt, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.dim, kernel_init=_row(dense_init), dtype=dt,
                     name="output")(h)
        h = h.astype(jnp.float32)
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                            name="output_ln")(x + h)


class BertEncoder(nn.Module):
    """Embeddings + encoder stack; accepts token ids or raw embeddings."""

    cfg: LLMConfig

    def setup(self):
        cfg = self.cfg
        self.word_embeddings = nn.Embed(
            cfg.vocab_size, cfg.dim,
            embedding_init=nn.initializers.normal(0.02),
            name="word_embeddings")
        self.position_embeddings = nn.Embed(
            cfg.max_position, cfg.dim,
            embedding_init=nn.initializers.normal(0.02),
            name="position_embeddings")
        self.token_type_embeddings = nn.Embed(
            cfg.type_vocab_size, cfg.dim,
            embedding_init=nn.initializers.normal(0.02),
            name="token_type_embeddings")
        self.embed_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps)
        self.embed_dropout = nn.Dropout(0.1)
        self.layers = [BertLayer(cfg, name=f"layer_{i}")
                       for i in range(cfg.n_layers)]

    def embed_tokens(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        """get_input_embeddings()(ids) — the word table only (HOP.py:198)."""
        return self.word_embeddings(token_ids)

    def __call__(self, inputs_embeds: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        B, T, _ = inputs_embeds.shape
        pos = self.position_embeddings(jnp.arange(T))
        typ = self.token_type_embeddings(jnp.zeros((T,), jnp.int32))
        x = inputs_embeds + pos[None] + typ[None]
        x = self.embed_ln(x)
        x = self.embed_dropout(x, deterministic=deterministic)
        for layer in self.layers:
            x = layer(x, deterministic)
        return x

    def encode_tokens(self, token_ids: jnp.ndarray,
                      deterministic: bool = True) -> jnp.ndarray:
        return self(self.embed_tokens(token_ids), deterministic)


def convert_hf_bert_params(hf_state_dict: dict, cfg: LLMConfig) -> dict:
    """Map a HuggingFace BertModel state_dict onto BertEncoder params."""
    import numpy as np

    def t(name):
        # copy: np.asarray on a torch tensor is a VIEW of torch memory —
        # in-place optimizer steps on the torch side would silently mutate
        # the "converted" weights
        return np.array(hf_state_dict[name])

    params = {
        "word_embeddings": {
            "embedding": t("embeddings.word_embeddings.weight")},
        "position_embeddings": {
            "embedding": t("embeddings.position_embeddings.weight")[:cfg.max_position]},
        "token_type_embeddings": {
            "embedding": t("embeddings.token_type_embeddings.weight")},
        "embed_ln": {"scale": t("embeddings.LayerNorm.weight"),
                     "bias": t("embeddings.LayerNorm.bias")},
    }
    for i in range(cfg.n_layers):
        p = f"encoder.layer.{i}."
        params[f"layer_{i}"] = {
            "attention": {
                "query": {"kernel": t(p + "attention.self.query.weight").T,
                          "bias": t(p + "attention.self.query.bias")},
                "key": {"kernel": t(p + "attention.self.key.weight").T,
                        "bias": t(p + "attention.self.key.bias")},
                "value": {"kernel": t(p + "attention.self.value.weight").T,
                          "bias": t(p + "attention.self.value.bias")},
                "out": {"kernel": t(p + "attention.output.dense.weight").T,
                        "bias": t(p + "attention.output.dense.bias")},
            },
            "attention_ln": {
                "scale": t(p + "attention.output.LayerNorm.weight"),
                "bias": t(p + "attention.output.LayerNorm.bias")},
            "intermediate": {"kernel": t(p + "intermediate.dense.weight").T,
                             "bias": t(p + "intermediate.dense.bias")},
            "output": {"kernel": t(p + "output.dense.weight").T,
                       "bias": t(p + "output.dense.bias")},
            "output_ln": {"scale": t(p + "output.LayerNorm.weight"),
                          "bias": t(p + "output.LayerNorm.bias")},
        }
    return params
