"""Reprogramming layer parity vs a direct torch transcription of the
einsum-attention math (reference HOP.py:255-299)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from hop_tpu.models.reprogramming import ReprogrammingLayer, PrototypeMapper


def test_reprogramming_matches_torch(rng):
    B, L, S, H, E, d_model, d_llm = 2, 34, 10, 4, 8, 16, 24
    m = ReprogrammingLayer(d_model=d_model, n_heads=H, d_keys=E, d_llm=d_llm)
    target = rng.normal(size=(B, L, d_model)).astype(np.float32)
    source = rng.normal(size=(S, d_llm)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(target),
                       jnp.asarray(source), jnp.asarray(source))
    out = m.apply(variables, jnp.asarray(target), jnp.asarray(source),
                  jnp.asarray(source), deterministic=True)
    p = variables["params"]

    # torch transcription of the attention math with the same weights
    tq = torch.from_numpy(target) @ torch.from_numpy(
        np.asarray(p["query_projection"]["kernel"])) + torch.from_numpy(
        np.asarray(p["query_projection"]["bias"]))
    tk = torch.from_numpy(source) @ torch.from_numpy(
        np.asarray(p["key_projection"]["kernel"])) + torch.from_numpy(
        np.asarray(p["key_projection"]["bias"]))
    tv = torch.from_numpy(source) @ torch.from_numpy(
        np.asarray(p["value_projection"]["kernel"])) + torch.from_numpy(
        np.asarray(p["value_projection"]["bias"]))
    tq = tq.view(B, L, H, E)
    tk = tk.view(S, H, E)
    tv = tv.view(S, H, E)
    scores = torch.einsum("blhe,she->bhls", tq, tk)
    attn = torch.softmax(scores / (E ** 0.5), dim=-1)
    rep = torch.einsum("bhls,she->blhe", attn, tv).reshape(B, L, H * E)
    rep = torch.relu(rep)
    want = rep @ torch.from_numpy(
        np.asarray(p["out_projection"]["kernel"])) + torch.from_numpy(
        np.asarray(p["out_projection"]["bias"]))
    np.testing.assert_allclose(np.asarray(out), want.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_prototype_mapper_matches_torch_linear(rng):
    vocab, d, S = 50, 12, 7
    emb = rng.normal(size=(vocab, d)).astype(np.float32)
    m = PrototypeMapper(num_tokens=S)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(emb))
    out = m.apply(variables, jnp.asarray(emb))
    w = np.asarray(variables["params"]["kernel"])
    b = np.asarray(variables["params"]["bias"])
    # torch: mapping_layer(emb.T).T with Linear(vocab, S)
    lin = torch.nn.Linear(vocab, S)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w))
        lin.bias.copy_(torch.from_numpy(b))
        want = lin(torch.from_numpy(emb).T).T
    np.testing.assert_allclose(np.asarray(out), want.numpy(), rtol=1e-4,
                               atol=1e-5)
