"""Shared CLI assembly: data, model zoo switch, train steps, evaluator.

Counterpart of the setup half of reference run_ted.py:219-372 (datasets,
vocab, model zoo elif-chain :272-310, optimizers, evaluator) with the
reference's dispatch bugs fixed (its generator/model flag mix-up meant only
the LLM path could run under defaults, run_ted.py:399-418 — here every model
name dispatches).
"""

from __future__ import annotations

import argparse
import logging
import os
import tempfile
from pathlib import Path
from typing import Optional

import jax

# Honour JAX_PLATFORMS=cpu even though the axon TPU plugin in this image
# ignores the env var and would try (and possibly hang) to initialise the
# tunnel backend; same guard as tests/conftest.py and __graft_entry__.py.
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from hop_tpu import geometry
from hop_tpu.config import Config, ted_config, expressive_config
from hop_tpu.data import synthetic
from hop_tpu.data.dataset import SpeechMotionDataset
from hop_tpu.data.preprocessor import DataPreprocessor
from hop_tpu.data.vocab import Vocab, build_vocab
from hop_tpu.eval.evaluate import evaluate_testset
from hop_tpu.eval.fgd import (EmbeddingSpaceEvaluator, make_ted_feature_fn,
                              make_expressive_feature_fn)
from hop_tpu.ops import mel as mel_ops


MODEL_CHOICES = ("AD_LLM", "multimodal_context", "seq2seq", "speech2gesture",
                 "joint_embedding", "gesture_autoencoder", "hierarchy")


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--model", default="AD_LLM", choices=MODEL_CHOICES)
    p.add_argument("--data", default="synthetic",
                   help="record-store path prefix (train split), or "
                        "'synthetic' to fabricate one")
    p.add_argument("--val-data", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--checkpoint-dir", default="./checkpoints")
    p.add_argument("--metrics", default="./metrics.jsonl")
    p.add_argument("--tensorboard-dir", default=None,
                   help="also mirror scalars into a TensorBoard event dir "
                        "(the reference's SummaryWriter, run_ted.py:216)")
    p.add_argument("--eval-net", default=None,
                   help=".npz with the frozen FGD feature-net params "
                        "(random-init used when absent — scores are then "
                        "relative, not comparable to the reference)")
    p.add_argument("--seed", type=int, default=2021)
    p.add_argument("--data-parallel", type=int, default=0,
                   help="shard the batch over N devices (0 = all available "
                        "when >1 device, 1 = off)")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="tensor-parallel degree for the frozen LLM kernels")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler device trace of train steps "
                        "2-5 into this dir (summarise with "
                        "benchmarks/profile_step.py --analyze-only)")
    p.add_argument("--dcn-slices", type=int, default=1,
                   help="number of ICI slices joined over DCN; adds an "
                        "outer 'dcn' mesh axis carrying data-parallel "
                        "traffic only (batch shards over dcn x data, "
                        "ZeRO-2 moments stay in-slice)")
    p.add_argument("--parity-step", action="store_true",
                   help="train HOP with the reference's exact 3-forward "
                        "sequential D/G step instead of the default fused "
                        "step (same quality across seeds, "
                        "benchmarks/FUSED_MULTISEED.json; fused is ~40%% "
                        "faster)")
    p.add_argument("--no-zero2", action="store_true",
                   help="keep optimizer moments replicated instead of the "
                        "default ZeRO-2-style sharding over the data axis "
                        "(the reference always trains under DeepSpeed "
                        "ZeRO-2, run_ted.py:110-112)")
    p.add_argument("--synthetic-videos", type=int, default=3)
    p.add_argument("--wordembed-path", default=None,
                   help="pretrained word vectors for the text encoders: a "
                        ".npy matrix aligned with the built vocab (see "
                        "data/fasttext_export.py) or a fastText .bin model "
                        "(vectors computed on the fly); default random init "
                        "(reference run_ted.py --wordembed_path)")
    p.add_argument("--use-hf-token-stream", action="store_true",
                   help="feed HF tokenizer ids to the LLM instead of the "
                        "reference's live-path quirk of fasttext vocab ids "
                        "(run_ted.py:400 -> train_llm.py:17); requires "
                        "--hf-vocab")
    p.add_argument("--hf-vocab", default=None,
                   help="WordPiece vocab.txt for the HF token stream (the "
                        "reference's BertTokenizer artifact; tokenisation "
                        "matches transformers.BertTokenizer token-for-token, "
                        "tests/test_wordpiece.py)")
    p.add_argument("--llm-model", default=None, choices=("BERT", "LLAMA"),
                   help="frozen backbone for AD_LLM (reference --llm_model, "
                        "run_ted.py:133-212); LLAMA uses LLaMA-7B geometry "
                        "truncated to --llm-layers")
    p.add_argument("--llm-layers", type=int, default=None,
                   help="backbone depth (reference --llm_layers, default 6)")
    p.add_argument("--llm-weights", default=None,
                   help="pretrained weights for the frozen backbone: an HF "
                        "checkpoint directory (config.json + "
                        "model.safetensors / pytorch_model.bin) or a bare "
                        "state-dict file. The reference's live path loads "
                        "pretrained BERT/LLaMA (run_ted.py:176-212, "
                        ":133-175); default is random init, honestly "
                        "labelled. Geometry and --hf-vocab consistency are "
                        "checked before training (models/llm_weights.py)")
    p.add_argument("--warmup-epochs", type=int, default=None,
                   help="generator-only epochs before the GAN phase starts "
                        "(the reference hardcodes the gate `epoch > 10`, "
                        "train_llm.py:15; override to e.g. 0 to enter the "
                        "GAN phase immediately)")
    p.add_argument("--transfer-guard", default="off",
                   choices=("off", "log", "disallow"),
                   help="jax.transfer_guard_host_to_device mode around the "
                        "training hot loop: any implicit host->device "
                        "transfer (anything but device_batch's explicit "
                        "device_put) logs or raises. The reference has no "
                        "analog (NCCL/DDP transfers are implicit).")
    p.add_argument("--audio-wire", default=None, choices=("f32", "int16"),
                   help="host->device wire dtype for raw audio, the "
                        "dominant batch tensor (37 of 38 MB at bs256). "
                        "int16 halves the transfer volume; bit-exact for "
                        "16-bit-PCM-derived audio (the TED wavs), else "
                        "bounded by 2^-16 full-scale (DataConfig."
                        "audio_wire).")
    p.add_argument("--prefetch", type=int, default=0,
                   help="overlap host batch assembly + device transfer "
                        "with the device step by preparing up to N "
                        "batches ahead on a background thread (0 = "
                        "synchronous). The prefetch thread performs only "
                        "device_batch's sanctioned explicit transfers; "
                        "--transfer-guard applies to the consumer loop.")
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--checkpoint-every", type=int, default=1,
                   help="save the latest-for-resume checkpoint every N "
                        "epochs (best-FGD epochs always save; the "
                        "reference saves only on best, run_ted.py:454)")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint from --checkpoint-dir "
                        "before training (params, optimizer state, stats)")
    return p


def restore_hop_model(cfg: Config, checkpoint_dir: str,
                      allow_random_init: bool = False):
    """Rebuild a HOPModel from a train_main checkpoint dir.

    Returns (cfg, model, variables, n_speakers). The frozen backbone the
    checkpoint was trained with is reconstructed from run_metadata
    (llm_model / llm_layers — it is stripped from the saved arrays,
    utils/checkpoint.strip_frozen) and its fresh-init weights are
    reattached. With allow_random_init the helper falls back to the init
    variables when no checkpoint exists (the demo's labelled
    random-init mode); otherwise it raises SystemExit.
    """
    import dataclasses

    from hop_tpu.models.hop import HOPModel
    from hop_tpu.utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(checkpoint_dir)
    meta = ckpt.run_metadata()
    n_speakers = int(meta.get("n_speakers", 10))
    if meta.get("llm_model") == "LLAMA":
        from hop_tpu.config import llama7b_llm_config
        cfg = cfg.replace(llm=llama7b_llm_config(
            int(meta.get("llm_layers", cfg.llm.n_layers))))
    elif meta.get("llm_layers"):
        cfg = cfg.replace(llm=dataclasses.replace(
            cfg.llm, n_layers=int(meta["llm_layers"])))
    model = HOPModel(cfg, n_speakers=n_speakers)

    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    d = cfg.data
    variables = model.init(
        rngs,
        jnp.zeros((1, d.expected_audio_length)),
        jnp.zeros((1, d.n_poses, d.mel_bins)),
        jnp.zeros((1, d.n_poses), jnp.int32),
        jnp.zeros((1, d.n_seed_frames, d.pose_dim)),
        jnp.zeros((1,), jnp.int32),
        rng=jax.random.PRNGKey(2), train=False)

    if ckpt.latest_step() is None:
        if allow_random_init:
            print("no checkpoint found — using random init")
            return cfg, model, variables, n_speakers
        raise SystemExit(f"no checkpoint found in {checkpoint_dir}")
    state = ckpt.restore()["state"]
    if "gen_params" not in state:
        raise SystemExit(
            f"checkpoint in {checkpoint_dir} is not a HOP generator "
            f"checkpoint (state keys: {sorted(state)}); train with "
            "--model AD_LLM to produce one")
    # the frozen LLM is stripped from checkpoints; take it from the init,
    # or — when the run was trained with --llm-weights — reload the
    # pretrained backbone the checkpoint actually saw (its path is in the
    # run metadata; a random-init backbone would silently change every
    # generated gesture)
    llm_weights = meta.get("llm_weights")
    if llm_weights:
        if not os.path.exists(llm_weights):
            raise SystemExit(
                f"checkpoint was trained with --llm-weights {llm_weights}, "
                "which no longer exists; restore it (or copy the HF "
                "checkpoint back to that path) before inference")
        from hop_tpu.models.llm_weights import install_llm_params
        variables = install_llm_params(variables, llm_weights, cfg.llm)
        print(f"reloaded pretrained backbone from {llm_weights}")
    params = dict(state["gen_params"])
    params.setdefault("llm", variables["params"]["llm"])
    variables = {"params": params, "batch_stats": state["gen_stats"]}
    print(f"restored checkpoint step {ckpt.latest_step()}")
    return cfg, model, variables, n_speakers


def apply_overrides(cfg: Config, args) -> Config:
    import dataclasses
    train = cfg.train
    if args.epochs is not None:
        train = dataclasses.replace(train, epochs=args.epochs)
    if args.batch_size is not None:
        train = dataclasses.replace(train, batch_size=args.batch_size)
    if args.learning_rate is not None:
        train = dataclasses.replace(train, learning_rate=args.learning_rate)
    if getattr(args, "warmup_epochs", None) is not None:
        cfg = cfg.replace(loss=dataclasses.replace(
            cfg.loss, warmup_epochs=args.warmup_epochs))
    data = cfg.data
    if getattr(args, "use_hf_token_stream", False):
        data = dataclasses.replace(data, use_hf_token_stream=True)
        cfg = cfg.replace(data=data)
    if getattr(args, "audio_wire", None):
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, audio_wire=args.audio_wire))
    if getattr(args, "parity_step", False):
        cfg = cfg.replace(hop=dataclasses.replace(cfg.hop,
                                                  fused_step=False))
    llm = cfg.llm
    if getattr(args, "llm_model", None) == "LLAMA":
        from hop_tpu.config import llama7b_llm_config
        llm = llama7b_llm_config(getattr(args, "llm_layers", None)
                                 or llm.n_layers)
    elif getattr(args, "llm_layers", None):
        llm = dataclasses.replace(llm, n_layers=args.llm_layers)
    return cfg.replace(train=train, llm=llm)


def make_tokenizer(args):
    """WordPiece tokenizer for the HF token stream, or None.

    The reference tokenizes every sample with BertTokenizer
    (lmdb_data_loader.py:155); without a vocab artifact the stream would
    silently be all zeros, so --use-hf-token-stream without --hf-vocab is
    an error."""
    vocab_path = getattr(args, "hf_vocab", None)
    if not getattr(args, "use_hf_token_stream", False):
        return None
    if not vocab_path:
        raise SystemExit(
            "--use-hf-token-stream needs --hf-vocab <vocab.txt>: without a "
            "WordPiece vocab the LLM token stream would be all zeros "
            "(the reference builds its tokenizer from the BERT artifact, "
            "run_ted.py:176-212)")
    from hop_tpu.data.wordpiece import WordPieceTokenizer
    return WordPieceTokenizer(vocab_path)


def load_datasets(cfg: Config, args):
    """Returns (train_ds, val_ds, lang_model)."""
    tokenizer = make_tokenizer(args)
    if args.data == "synthetic":
        tmp = Path(tempfile.mkdtemp(prefix="hop_synth_"))
        videos = synthetic.make_source_clips(
            cfg, n_videos=args.synthetic_videos, clip_seconds=20.0,
            seed=args.seed)
        for split, vids in (("train", videos), ("val", videos[:1])):
            DataPreprocessor(cfg.data, str(tmp / split)).run(vids)
        train_path, val_path = str(tmp / "train"), str(tmp / "val")
    else:
        train_path = args.data
        val_path = args.val_data or args.data

    train_ds = SpeechMotionDataset(train_path, cfg.data, tokenizer=tokenizer)
    val_ds = SpeechMotionDataset(val_path, cfg.data,
                                 speaker_model=train_ds.speaker_model,
                                 tokenizer=tokenizer)
    source = getattr(args, "wordembed_path", None)
    if source and source.endswith(".bin"):
        from hop_tpu.data.fasttext_export import FastTextModel
        source = FastTextModel(source).get_word_vector
    lang = build_vocab(
        "words",
        [[w for aux in ds._aux_cache for w in aux["words"]]
         for ds in (train_ds, val_ds)],
        None, source, cfg.data.wordembed_dim)
    train_ds.set_lang_model(lang)
    val_ds.set_lang_model(lang)
    return train_ds, val_ds, lang


#: host fields each model family actually consumes — transferring only
#: these cuts the per-batch host->device volume (e.g. AD_LLM skips the
#: (B, 128, 82) spectrogram and the pose_seq/word streams, ~40% less)
MODEL_BATCH_KEYS = {
    "AD_LLM": ("in_audio", "target_vec", "vid_indices", "text_padded",
               "text_tokens"),
    "multimodal_context": ("in_audio", "target_vec", "vid_indices",
                           "text_padded"),
    "seq2seq": ("word_seq", "text_lengths", "target_vec"),
    "speech2gesture": ("spectrogram", "target_vec"),
    "joint_embedding": ("text_padded", "in_audio", "target_vec"),
    "gesture_autoencoder": ("target_vec",),
    "hierarchy": ("spectrogram", "text_padded", "target_vec",
                  "vid_indices"),
}


@jax.jit
def _dequant_audio(q: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * (1.0 / 32768.0)


def _put_audio(audio: np.ndarray, wire: str) -> jax.Array:
    """Transfer raw audio at the configured wire dtype (DataConfig.audio_wire).

    "int16" quantizes on the host to the 16-bit PCM grid (i/2^15) and
    dequantizes on device, halving the H2D volume of the batch's dominant
    tensor. Exact for PCM-derived audio; <=2^-16 full-scale error and
    [-1, 1) saturation otherwise. The model always sees float32.
    """
    if wire == "int16":
        q = np.clip(np.rint(audio * 32768.0), -32768, 32767).astype(np.int16)
        return _dequant_audio(jax.device_put(q))
    return jax.device_put(audio)


def device_batch(batch: dict, cfg: Config, with_mel: bool = True,
                 keys=None) -> dict:
    """Host batch -> device arrays + on-device log-mel.

    keys: optional subset of host fields to transfer (MODEL_BATCH_KEYS);
    derived tensors (log_mel, text_mask, text_padded clamp) are computed
    when their sources are present.

    Host arrays move via explicit jax.device_put so the training hot loop
    is clean under jax.transfer_guard_host_to_device (SURVEY §2.7's
    host↔device discipline; opt in with --transfer-guard disallow,
    pinned by tests/test_transfer_guard.py).
    """
    if keys is not None:
        batch = {k: v for k, v in batch.items() if k in keys}
    # text ids are transferred once, post-clamp (below) — not here too
    out = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()
           if k not in ("text_padded", "text_tokens", "in_audio")}
    if "in_audio" in batch:
        out["in_audio"] = _put_audio(np.asarray(batch["in_audio"]),
                                     cfg.data.audio_wire)
    if with_mel and "in_audio" in out:
        d = cfg.data
        out["log_mel"] = mel_ops.log_mel_spectrogram(
            out["in_audio"], sr=d.sample_rate, n_fft=d.mel_n_fft,
            hop=d.mel_hop, n_mels=d.mel_bins)
    if "word_seq" in batch and "text_lengths" in batch:
        T = batch["word_seq"].shape[1]
        out["text_mask"] = jax.device_put(
            (np.arange(T)[None] < batch["text_lengths"][:, None])
            .astype(np.float32))
    # the live HOP path feeds vocab word ids as LLM token ids
    # (run_ted.py:400); clamp into the LLM vocab on the host (a device
    # `% int` would promote the Python scalar through an implicit
    # transfer and break the --transfer-guard discipline).
    # use_hf_token_stream switches to the HF tokenizer ids instead.
    if cfg.data.use_hf_token_stream and "text_tokens" in batch:
        out["text_padded"] = jax.device_put(
            np.asarray(batch["text_tokens"]) % cfg.llm.vocab_size)
    elif "text_padded" in batch:
        out["text_padded"] = jax.device_put(
            np.asarray(batch["text_padded"]) % cfg.llm.vocab_size)
    return out


def make_fgd_evaluator(cfg: Config, lang_n_words: int,
                       eval_net_path: Optional[str]):
    """Frozen feature net -> EmbeddingSpaceEvaluator.

    With no pretrained weights available the net is randomly initialised —
    FGD values are then only comparable within a run (the reference instead
    loads gesture_autoencoder_checkpoint_best.bin, run_ted.py:126)."""
    rng = jax.random.PRNGKey(0)
    pose_dim = cfg.data.pose_dim
    if pose_dim == 27:
        from hop_tpu.models.embedding_net import EmbeddingNet
        net = EmbeddingNet(pose_dim=pose_dim, n_frames=cfg.data.n_poses,
                           n_words=lang_n_words, mode="pose")
        poses = jnp.zeros((2, cfg.data.n_poses, pose_dim))
        variables = net.init(rng, None, None, poses[:, :4], poses,
                             input_mode="pose")
        if eval_net_path:
            variables = _load_variables(eval_net_path, variables)
        else:
            _warn_untrained_eval_net()
        return EmbeddingSpaceEvaluator(make_ted_feature_fn(net, variables),
                                       trained=bool(eval_net_path))
    else:
        from hop_tpu.models.motion_ae import MotionAE
        net = MotionAE(pose_dim=pose_dim,
                       latent_dim=cfg.baseline.motion_ae_latent_dim)
        poses = jnp.zeros((2, cfg.data.n_poses, pose_dim))
        variables = net.init(rng, poses)
        if eval_net_path:
            variables = _load_variables(eval_net_path, variables)
        else:
            _warn_untrained_eval_net()
        return EmbeddingSpaceEvaluator(
            make_expressive_feature_fn(net, variables),
            trained=bool(eval_net_path))


def _warn_untrained_eval_net():
    print("WARNING: no --eval-net weights; the FGD feature net is RANDOMLY "
          "INITIALISED.\n         FGD/diversity below are relative numbers "
          "for this run only — NOT\n         comparable to the reference "
          "(convert gesture_autoencoder_checkpoint\n         _best.bin with "
          "eval/torch_import.py for parity numbers).")


def _load_variables(path: str, template):
    from hop_tpu.utils.checkpoint import load_arrays
    return load_arrays(path, template)


def make_eval_fn(cfg: Config, val_ds, evaluator, generate_from_state,
                 n_speakers: int, prefetch: int = 0):
    """generate_from_state(state, batch, vids, rng) -> outputs.

    prefetch: overlap val-batch assembly + transfer with the device
    forwards, same background-thread pipeline as the train loop."""
    from hop_tpu.train.loops import prefetch_iter

    def eval_fn(state, epoch):
        batches = prefetch_iter(
            (device_batch(b, cfg)
             for b in val_ds.batches(cfg.train.batch_size,
                                     shuffle=False, drop_last=False)),
            prefetch)
        def gen(batch, vids, rng):
            return generate_from_state(state, batch, vids, rng)
        return evaluate_testset(batches, gen, evaluator, epoch, cfg,
                                n_speakers, jax.random.PRNGKey(1234 + epoch))
    return eval_fn
