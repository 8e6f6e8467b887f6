"""Pretrained frozen-backbone weights from an HF checkpoint on disk.

The reference's live path LOADS a pretrained frozen backbone — BERT via
``BertModel.from_pretrained('bert-base-uncased', num_hidden_layers=6)``
(reference run_ted.py:176-212, tokenizer included) or LLaMA-7B
(run_ted.py:133-175). The in-memory converters
(models/bert.py::convert_hf_bert_params,
models/llama.py::convert_hf_llama_params) are live-parity-tested against
real ``transformers`` models; this module supplies the missing half: read
an HF-format checkpoint FROM DISK (directory with config.json +
model.safetensors / pytorch_model.bin, or a bare state-dict file), run
consistency checks against the configured backbone geometry and the
``--hf-vocab`` tokenizer, and hand back flax params for the ``llm``
subtree. Wired to the ``--llm-weights`` CLI flag (cli/common.py).

Notes mirroring ``from_pretrained`` semantics:
  * a checkpoint with MORE encoder layers than ``cfg.n_layers`` is valid —
    the first ``n_layers`` are taken (the reference builds a 6-layer
    config and from_pretrained drops the rest);
  * task-head keys (pooler, cls, lm_head, ...) are ignored;
  * a ``bert.`` / ``model.`` key prefix (checkpoints saved from
    task wrappers) is stripped.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

from hop_tpu.config import LLMConfig

_WEIGHT_FILES = ("model.safetensors", "pytorch_model.bin")


def _read_state_dict(path: str) -> Tuple[dict, Optional[dict]]:
    """(state_dict, config.json dict or None) from a file or HF dir."""
    hf_config = None
    if os.path.isdir(path):
        cfg_path = os.path.join(path, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                hf_config = json.load(f)
        for name in _WEIGHT_FILES:
            p = os.path.join(path, name)
            if os.path.exists(p):
                path = p
                break
        else:
            raise FileNotFoundError(
                f"no {' / '.join(_WEIGHT_FILES)} in {path}")
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        sd = dict(load_file(path))
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
    return sd, hf_config


def _strip_prefix(sd: dict) -> dict:
    """Drop a uniform task-wrapper prefix (bert. / model.) if present."""
    for prefix in ("bert.", "model."):
        if any(k.startswith(prefix + "embeddings.") for k in sd) or \
           any(k.startswith(prefix + "embed_tokens.") for k in sd):
            return {k[len(prefix):]: v for k, v in sd.items()
                    if k.startswith(prefix)}
    return sd


def _detect_family(sd: dict) -> str:
    if any(k.startswith("embeddings.word_embeddings") for k in sd):
        return "BERT"
    if any(k.startswith("embed_tokens.") for k in sd):
        return "LLAMA"
    raise ValueError(
        "unrecognised checkpoint: neither BERT (embeddings.word_embeddings)"
        " nor LLaMA (embed_tokens) keys found; sample keys: "
        + ", ".join(sorted(sd)[:5]))


def _check_geometry(sd: dict, hf_config: Optional[dict], cfg: LLMConfig,
                    family: str) -> None:
    """Fail fast with a specific message instead of a shape error mid-tree."""
    if family != cfg.model:
        raise ValueError(f"--llm-weights checkpoint is {family} but the "
                         f"configured backbone is {cfg.model} "
                         "(--llm-model)")
    emb_key = ("embeddings.word_embeddings.weight" if family == "BERT"
               else "embed_tokens.weight")
    vocab, dim = sd[emb_key].shape
    if dim != cfg.dim:
        raise ValueError(f"checkpoint hidden size {dim} != configured "
                         f"llm dim {cfg.dim}")
    if vocab != cfg.vocab_size:
        raise ValueError(
            f"checkpoint vocab size {vocab} != configured {cfg.vocab_size}"
            " — the reprogramming mapping_layer (vocab -> 1500 prototypes,"
            " reference HOP.py:115-116) is sized from the embedding table;"
            " a mismatched table would silently scramble the prototypes")
    if hf_config is not None:
        n_avail = hf_config.get("num_hidden_layers")
        if n_avail is not None and n_avail < cfg.n_layers:
            raise ValueError(f"checkpoint has {n_avail} layers < configured "
                             f"--llm-layers {cfg.n_layers}")
    # layer presence check independent of config.json
    probe = (f"encoder.layer.{cfg.n_layers - 1}.attention.self.query.weight"
             if family == "BERT"
             else f"layers.{cfg.n_layers - 1}.self_attn.q_proj.weight")
    if probe not in sd:
        raise ValueError(f"checkpoint lacks encoder layer "
                         f"{cfg.n_layers - 1} ({probe})")


def check_vocab_consistency(path: str, cfg: LLMConfig,
                            hf_vocab: Optional[str]) -> None:
    """--hf-vocab tokenizer vs the checkpoint's embedding-table rows.

    The token-id stream produced from vocab.txt indexes straight into the
    loaded word-embedding table (and the 30522-row mapping_layer input,
    HOP.py:115-116), so the row counts must agree exactly."""
    if not hf_vocab:
        return
    with open(hf_vocab, encoding="utf-8") as f:
        n_tokens = sum(1 for _ in f)
    if n_tokens != cfg.vocab_size:
        raise ValueError(
            f"--hf-vocab {hf_vocab} has {n_tokens} tokens but the backbone "
            f"vocab (and --llm-weights embedding table) is {cfg.vocab_size}")


def load_llm_params(path: str, cfg: LLMConfig,
                    hf_vocab: Optional[str] = None) -> dict:
    """HF checkpoint on disk -> flax params for the ``llm`` subtree."""
    sd, hf_config = _read_state_dict(path)
    sd = _strip_prefix(sd)
    family = _detect_family(sd)
    _check_geometry(sd, hf_config, cfg, family)
    check_vocab_consistency(path, cfg, hf_vocab)
    if family == "BERT":
        from hop_tpu.models.bert import convert_hf_bert_params
        return convert_hf_bert_params(sd, cfg)
    from hop_tpu.models.llama import convert_hf_llama_params
    return convert_hf_llama_params(sd, cfg)


def install_llm_params(gen_vars: dict, path: str, cfg: LLMConfig,
                       hf_vocab: Optional[str] = None) -> dict:
    """Replace the fresh-init ``llm`` subtree of AD_LLM generator variables
    with converted pretrained weights, shape-checked leaf by leaf. The
    model's TP-annotated kernels are flax ``meta.Partitioned`` boxes —
    boxing (and its 'model'-axis sharding metadata) is preserved, only the
    boxed value is swapped."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax.core import meta as flax_meta

    loaded = load_llm_params(path, cfg, hf_vocab)
    current = gen_vars["params"]["llm"]
    is_box = lambda x: isinstance(x, flax_meta.Partitioned)  # noqa: E731
    new_leaves = {jax.tree_util.keystr(p): v for p, v in
                  jax.tree_util.tree_leaves_with_path(loaded)}
    cur_leaves = jax.tree_util.tree_leaves_with_path(current, is_leaf=is_box)
    # Every model array must come from the checkpoint; checkpoint arrays
    # the instantiation doesn't use are fine (e.g. a standalone BertEncoder
    # driven with inputs_embeds never initialises word_embeddings — the
    # full AD_LLM model does, via the reprogramming prototypes).
    missing = (set(new_leaves)
               - {jax.tree_util.keystr(p) for p, _ in cur_leaves})
    if missing:
        print("llm-weights: checkpoint arrays unused by this model "
              "instantiation: " + ", ".join(sorted(missing)))

    def _swap(keypath, cur):
        k = jax.tree_util.keystr(keypath)
        if k not in new_leaves:
            raise ValueError(f"checkpoint missing backbone array {k}")
        raw = cur.unbox() if is_box(cur) else cur
        new = jnp.asarray(new_leaves[k], dtype=raw.dtype)
        if tuple(np.shape(new)) != tuple(np.shape(raw)):
            raise ValueError(
                f"backbone array {k}: checkpoint shape "
                f"{np.shape(new)} != model {np.shape(raw)}")
        return cur.replace_boxed(new) if is_box(cur) else new

    new_llm = jax.tree_util.tree_map_with_path(_swap, current,
                                               is_leaf=is_box)
    params = dict(gen_vars["params"])
    params["llm"] = new_llm
    out = dict(gen_vars)
    out["params"] = params
    return out
