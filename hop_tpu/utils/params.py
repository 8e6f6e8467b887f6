"""Parameter-pytree surgery helpers."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def set_pretrained_embeddings(variables: dict, weights: np.ndarray) -> dict:
    """Overwrite every word-embedding table in a flax variables tree with
    pretrained vectors — the JAX analog of the reference's
    ``nn.Embedding.from_pretrained(word_embedding_weights)``
    (multimodal_context_net.py:38-44, seq2seq_net.py:27-31).

    A table qualifies when its param name is ``embedding`` and its shape
    equals ``weights.shape`` (the (n_words, wordembed_dim) vocab matrix);
    GRU/attention params and the HOP LLM's token embeddings have different
    names/shapes and are untouched. Returns the new tree and the number of
    tables replaced as ``(variables, n)``.
    """
    weights = jnp.asarray(weights)
    n_replaced = 0

    def walk(node):
        nonlocal n_replaced
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if (k == "embedding" and hasattr(v, "shape")
                    and tuple(v.shape) == tuple(weights.shape)):
                out[k] = weights.astype(v.dtype)
                n_replaced += 1
            else:
                out[k] = walk(v)
        return out

    return walk(dict(variables)), n_replaced
