"""Synthetic TED-like batches for tests, benchmarks, and dry runs.

The reference trains from a proprietary LMDB cache of TED videos; none of
that data ships with either repo. This module fabricates batches with the
exact shapes/dtypes and plausible statistics of the real pipeline output
(reference data_loader/lmdb_data_loader.py:47-62 collate tuple), so every
train step / eval path / benchmark is exercisable end to end.

Audio is built from a few random tones + click transients so the mel
frontend, onset detector and BC metric see realistic structure; dir-vec
targets are smooth random walks renormalised per bone and mean-centred like
the preprocessed dataset (data_preprocessor.py:163-164).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from hop_tpu import geometry
from hop_tpu.config import Config


@dataclass
class SyntheticSpec:
    n_speakers: int = 10
    vocab_size: int = 1000       # fasttext-vocab ids (live HOP text stream)
    hf_vocab_size: int = 30522   # HF tokenizer ids


def make_batch(cfg: Config, batch_size: int, seed: int = 0,
               spec: SyntheticSpec | None = None) -> dict:
    """One host batch as numpy arrays (feature-last layouts)."""
    spec = spec or SyntheticSpec()
    rng = np.random.default_rng(seed)
    d = cfg.data
    skel = d.skeleton
    T, D = d.n_poses, d.pose_dim

    # --- audio: tones + clicks over pink-ish noise -------------------------
    t = np.arange(d.expected_audio_length) / d.sample_rate
    audio = 0.01 * rng.standard_normal((batch_size, t.size))
    for b in range(batch_size):
        for _ in range(3):
            f0 = rng.uniform(80, 1000)
            start = rng.integers(0, t.size - 4000)
            seg = np.sin(2 * np.pi * f0 * t[:4000])
            audio[b, start:start + 4000] += 0.2 * seg * np.exp(
                -np.arange(4000) / 1500)
    audio = audio.astype(np.float32)

    # --- motion: smooth unit dir-vec walk, mean-centred ---------------------
    steps = rng.standard_normal((batch_size, T, skel.n_bones, 3)) * 0.15
    walk = np.cumsum(steps, axis=1) + rng.standard_normal(
        (batch_size, 1, skel.n_bones, 3))
    walk /= np.linalg.norm(walk, axis=-1, keepdims=True) + 1e-8
    mean = (skel.mean_dir_vec.reshape(-1, 3) if skel.mean_dir_vec is not None
            else np.zeros((skel.n_bones, 3), np.float32))
    vec = (walk - mean[None, None]).reshape(batch_size, T, D).astype(np.float32)

    # --- text: sparse frame-aligned ids (most slots are padding=0) ----------
    text_padded = np.zeros((batch_size, T), np.int64)
    text_tokens = np.zeros((batch_size, T), np.int64)
    word_seq = np.zeros((batch_size, 16), np.int64)
    text_lengths = rng.integers(4, 16, size=(batch_size,))
    for b in range(batch_size):
        n_words = int(rng.integers(3, 9))
        space = T // (n_words + 1)
        for i in range(n_words):
            idx = (i + 1) * space
            text_padded[b, idx] = rng.integers(4, spec.vocab_size)
            text_tokens[b, idx] = rng.integers(4, spec.hf_vocab_size)
        word_seq[b, :text_lengths[b]] = rng.integers(
            4, spec.vocab_size, size=text_lengths[b])

    return {
        "in_audio": audio,
        "target_vec": vec,
        "text_padded": text_padded,
        "text_tokens": text_tokens,
        "word_seq": word_seq,
        "text_lengths": text_lengths.astype(np.int32),
        "vid_indices": rng.integers(0, spec.n_speakers,
                                    size=(batch_size,)).astype(np.int32),
    }


_WORDS = ("the quick brown fox jumps over a lazy dog while people "
          "talk about ideas and wave their hands in the air").split()


def make_source_clips(cfg: Config, n_videos: int = 2, clips_per_video: int = 1,
                      clip_seconds: float = 12.0, seed: int = 0):
    """Synthetic source clips for the offline preprocessor: plausible
    skeleton walks anchored near the dataset mean pose (so the motion
    filters pass), tones+noise audio, and timed word lists."""
    from hop_tpu.data.preprocessor import SourceClip
    from hop_tpu.ops import mel as mel_ops
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    skel = cfg.data.skeleton
    sr = cfg.data.sample_rate
    native_fps = 25
    videos = []
    mean_pose = (skel.mean_pose.reshape(-1, 3)
                 if skel.mean_pose is not None
                 else np.zeros((skel.n_joints, 3), np.float32))
    for v in range(n_videos):
        clips = []
        for c in range(clips_per_video):
            n_frames = int(clip_seconds * native_fps)
            # mean-reverting wander so the spine stays upright (the motion
            # filters must pass): x_{t+1} = 0.95 x_t + noise
            walk = np.zeros((n_frames, skel.n_joints, 3))
            x = np.zeros((skel.n_joints, 3))
            for tt in range(n_frames):
                x = 0.95 * x + rng.standard_normal((skel.n_joints, 3)) * 0.02
                walk[tt] = x
            walk[:, :2] *= 0.05  # keep root + neck nearly still
            skeletons = mean_pose[None] + walk
            audio = 0.01 * rng.standard_normal(int(clip_seconds * sr))
            t = np.arange(audio.size) / sr
            audio += 0.2 * np.sin(2 * np.pi * rng.uniform(100, 500) * t)
            spec = np.asarray(mel_ops.extract_melspectrogram(
                jnp.asarray(audio.astype(np.float32)), sr=sr))
            words = []
            wt = 0.2
            while wt < clip_seconds - 0.4:
                dur = rng.uniform(0.15, 0.5)
                words.append((_WORDS[rng.integers(len(_WORDS))], wt, wt + dur))
                wt += dur + rng.uniform(0.02, 0.2)
            clips.append(SourceClip(
                vid=f"vid{v}",
                skeletons_3d=skeletons.astype(np.float32),
                audio_raw=audio.astype(np.float32),
                audio_spectrogram=spec.astype(np.float32),
                words=words,
                start_frame_no=0,
                end_frame_no=n_frames,
                start_time=0.0,
                end_time=clip_seconds))
        videos.append((f"vid{v}", clips))
    return videos


def add_device_features(batch: dict, cfg: Config) -> dict:
    """Attach the on-device-computable features (log-mel, cache spectrogram).

    In the real pipeline these are produced inside the input pipeline / on
    device; synthetic batches get them here so tests can feed models
    directly.
    """
    import jax.numpy as jnp
    from hop_tpu.ops import mel as mel_ops

    d = cfg.data
    audio = jnp.asarray(batch["in_audio"])
    out = dict(batch)
    out["log_mel"] = np.asarray(mel_ops.log_mel_spectrogram(
        audio, sr=d.sample_rate, n_fft=d.mel_n_fft, hop=d.mel_hop,
        n_mels=d.mel_bins))
    spec = np.asarray(mel_ops.extract_melspectrogram(audio, sr=d.sample_rate))
    out["spectrogram"] = spec[
        :, :, :geometry.calc_spectrogram_length_from_motion_length(
            d.n_poses, d.pose_resampling_fps)]
    return out
