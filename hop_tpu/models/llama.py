"""LLaMA-architecture decoder used as the frozen HOP backbone.

The reference optionally swaps the frozen BERT for a LLaMA-7B
(`--llm_model LLAMA`, run_ted.py:133-175): it truncates the decoder to
``llm_layers`` layers and calls ``LlamaModel(inputs_embeds=...)`` —
a *causal* decoder over the 34 aligned frame slots, with rotary position
embeddings, RMSNorm pre-normalisation and a SwiGLU MLP.

This is the flax counterpart with the same TP layout as the BERT
backbone (QKV/gate/up column-parallel, out/down row-parallel over the
'model' mesh axis — at 7B-class widths the backbone is the one part of
HOP that genuinely needs tensor parallelism). It exposes the exact
interface HOPModel uses for its backbone (``embed_tokens``,
``word_embeddings.embedding``, ``__call__(inputs_embeds)``), so
``LLMConfig.model = "LLAMA"`` drops in with no other changes.

Numerics match HF ``LlamaModel`` (parity-tested in
tests/test_llama_parity.py): RoPE in the rotate-half convention with
``inv_freq = theta^(-2i/d)``, grouped-query attention when
``n_kv_heads < n_heads``, causal masking, and a final RMSNorm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from hop_tpu.config import LLMConfig
from hop_tpu.models.bert import _col, _row, _compute_dtype


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        x = x.astype(jnp.float32)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        return scale * x * jax.lax.rsqrt(var + self.eps)


def rope_cos_sin(T: int, head_dim: int, theta: float):
    """HF-convention rotary tables: cos/sin of shape (T, head_dim), the
    (head_dim/2) frequencies duplicated [f, f] along the last axis."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2,
                                           dtype=jnp.float32) / head_dim))
    angles = jnp.arange(T, dtype=jnp.float32)[:, None] * inv_freq[None]
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x: (B, T, H, D). rotate_half: (x1, x2) -> (-x2, x1)."""
    half = x.shape[-1] // 2
    rotated = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return x * cos[None, :, None, :] + rotated * sin[None, :, None, :]


class LlamaAttention(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        head_dim = cfg.dim // cfg.n_heads
        n_kv = cfg.n_kv_heads or cfg.n_heads
        groups = cfg.n_heads // n_kv
        dt = _compute_dtype(cfg)
        init = nn.initializers.normal(0.02)

        B, T, _ = x.shape
        q = nn.Dense(cfg.dim, use_bias=False, kernel_init=_col(init),
                     dtype=dt, name="q_proj")(x).reshape(
            B, T, cfg.n_heads, head_dim)
        k = nn.Dense(n_kv * head_dim, use_bias=False, kernel_init=_col(init),
                     dtype=dt, name="k_proj")(x).reshape(
            B, T, n_kv, head_dim)
        v = nn.Dense(n_kv * head_dim, use_bias=False, kernel_init=_col(init),
                     dtype=dt, name="v_proj")(x).reshape(
            B, T, n_kv, head_dim)

        cos, sin = rope_cos_sin(T, head_dim, cfg.rope_theta)
        q = apply_rope(q.astype(jnp.float32), cos, sin).astype(dt)
        k = apply_rope(k.astype(jnp.float32), cos, sin).astype(dt)
        if groups > 1:   # grouped-query attention: repeat kv heads
            k = jnp.repeat(k, groups, axis=2)
            v = jnp.repeat(v, groups, axis=2)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (head_dim ** 0.5)
        causal = jnp.tril(jnp.ones((T, T), bool))
        scores = jnp.where(causal[None, None], scores.astype(jnp.float32),
                           -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dt),
                         v).reshape(B, T, cfg.dim)
        out = nn.Dense(cfg.dim, use_bias=False, kernel_init=_row(init),
                       dtype=dt, name="o_proj")(ctx)
        return out.astype(jnp.float32)


class LlamaMLP(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dt = _compute_dtype(cfg)
        init = nn.initializers.normal(0.02)
        gate = nn.Dense(cfg.intermediate_dim, use_bias=False, dtype=dt,
                        kernel_init=_col(init), name="gate_proj")(x)
        up = nn.Dense(cfg.intermediate_dim, use_bias=False, dtype=dt,
                      kernel_init=_col(init), name="up_proj")(x)
        h = nn.silu(gate) * up
        down = nn.Dense(cfg.dim, use_bias=False, dtype=dt,
                        kernel_init=_row(init), name="down_proj")(h)
        return down.astype(jnp.float32)


class LlamaLayer(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        h = RMSNorm(cfg.rms_norm_eps, name="input_ln")(x)
        x = x + LlamaAttention(cfg, name="self_attn")(h)
        h = RMSNorm(cfg.rms_norm_eps, name="post_attention_ln")(x)
        return x + LlamaMLP(cfg, name="mlp")(h)


class LlamaEncoder(nn.Module):
    """Same backbone interface as models.bert.BertEncoder (HOP.py:198-204
    usage: token-table lookups for the text stream + full forward over
    inputs_embeds)."""

    cfg: LLMConfig

    def setup(self):
        cfg = self.cfg
        self.word_embeddings = nn.Embed(
            cfg.vocab_size, cfg.dim,
            embedding_init=nn.initializers.normal(0.02),
            name="word_embeddings")
        self.layers = [LlamaLayer(cfg, name=f"layer_{i}")
                       for i in range(cfg.n_layers)]
        self.final_norm = RMSNorm(cfg.rms_norm_eps, name="final_norm")

    def embed_tokens(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        return self.word_embeddings(token_ids)

    def __call__(self, inputs_embeds: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        x = inputs_embeds
        for layer in self.layers:
            x = layer(x)
        return self.final_norm(x)

    def encode_tokens(self, token_ids: jnp.ndarray,
                      deterministic: bool = True) -> jnp.ndarray:
        return self(self.embed_tokens(token_ids), deterministic)


def convert_hf_llama_params(hf_state_dict: dict, cfg: LLMConfig) -> dict:
    """Map a HuggingFace LlamaModel state_dict onto LlamaEncoder params."""
    import numpy as np

    def t(name):
        return np.array(hf_state_dict[name])  # copy, not a torch-memory view

    params = {
        "word_embeddings": {"embedding": t("embed_tokens.weight")},
        "final_norm": {"scale": t("norm.weight")},
    }
    for i in range(cfg.n_layers):
        p = f"layers.{i}."
        params[f"layer_{i}"] = {
            "input_ln": {"scale": t(p + "input_layernorm.weight")},
            "post_attention_ln": {
                "scale": t(p + "post_attention_layernorm.weight")},
            "self_attn": {
                "q_proj": {"kernel": t(p + "self_attn.q_proj.weight").T},
                "k_proj": {"kernel": t(p + "self_attn.k_proj.weight").T},
                "v_proj": {"kernel": t(p + "self_attn.v_proj.weight").T},
                "o_proj": {"kernel": t(p + "self_attn.o_proj.weight").T},
            },
            "mlp": {
                "gate_proj": {"kernel": t(p + "mlp.gate_proj.weight").T},
                "up_proj": {"kernel": t(p + "mlp.up_proj.weight").T},
                "down_proj": {"kernel": t(p + "mlp.down_proj.weight").T},
            },
        }
    return params


def make_llm_encoder(cfg: LLMConfig, name: str = "llm"):
    """Backbone factory for HOPModel. The reference raises on unknown
    values ('LLM model is not defined', run_ted.py:211); GPT2 appears in
    its argparse help but has no implementation there either."""
    if cfg.model == "BERT":
        from hop_tpu.models.bert import BertEncoder
        return BertEncoder(cfg, name=name)
    if cfg.model == "LLAMA":
        return LlamaEncoder(cfg, name=name)
    raise ValueError(f"LLM model is not defined: {cfg.model!r} "
                     "(supported: BERT, LLAMA)")
