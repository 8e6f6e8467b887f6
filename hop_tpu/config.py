"""Typed configuration for the framework.

Replaces the reference's duplicated argparse banners (reference
run_ted.py:50-109, run_expressive.py:61-104, test_checkpoint.py:106-151) and
its hardcoded dataset constants / absolute paths with one dataclass tree and
per-dataset presets. Also defines the baseline-model hyperparameters that the
reference referenced but never declared (hidden_size, n_layers, dropout_prob,
input_context, loss_warmup, ... — see SURVEY.md §5.6).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

from hop_tpu import geometry


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "TED"                 # "TED" | "TED_expressive"
    n_poses: int = 34                    # frames per window (run_ted.py:83)
    n_pre_poses: int = 4                 # seed frames for baselines (:86)
    n_seed_frames: int = 16              # HOP seed frames (train_llm.py:12)
    pose_resampling_fps: int = 15
    subdivision_stride: int = 10
    sample_rate: int = 16000
    # 34 / 15 * 16000 rounded (lmdb_data_loader.py:77)
    expected_audio_length: int = 36267
    mel_bins: int = 128
    mel_n_fft: int = 1024
    mel_hop: int = 1096                  # => exactly 34 frames (:216)
    wordembed_dim: int = 300
    max_text_tokens: int = 2048
    remove_word_timing: bool = True      # run_ted.py passes truthy ('text')
    # The reference's live path feeds fasttext-vocab ids into the LLM
    # embedding table (run_ted.py:400 passes in_text_padded); set True to
    # use the HF tokenizer id stream the dataset also produces.
    use_hf_token_stream: bool = False
    # reference DataPreprocessor only ingests the first 50% of videos
    # (data_preprocessor.py:56-57); kept as an opt-in parity flag.
    truncate_videos_frac: float = 1.0
    # host->device wire dtype for the raw-audio stream, the largest batch
    # tensor (bs256: 37 MB of the 38 MB AD_LLM batch). "int16" halves the
    # transfer volume; it is bit-exact for audio decoded from 16-bit PCM
    # (the TED wavs: librosa.load yields i/2^15 floats — the i is
    # recovered exactly), and bounded by 2^-16 full-scale otherwise.
    # Values outside [-1, 1) saturate. Default keeps the f32 parity path.
    audio_wire: str = "f32"              # "f32" | "int16"

    @property
    def pose_dim(self) -> int:
        return self.skeleton.pose_dim

    @property
    def skeleton(self) -> geometry.Skeleton:
        return (geometry.TED_SKELETON if self.dataset == "TED"
                else geometry.EXPRESSIVE_SKELETON)

    @property
    def n_joints_graph(self) -> int:
        """Graph nodes for gwnet: 9 (TED) / 42 (expressive) (HOP.py:136-139)."""
        return 9 if self.dataset == "TED" else 42


@dataclass(frozen=True)
class LLMConfig:
    """Frozen language-model backbone (reference run_ted.py:133-212).

    model: "BERT" (default) or "LLAMA"; anything else is rejected like the
    reference's 'LLM model is not defined' (run_ted.py:211)."""
    model: str = "BERT"                  # "BERT" | "LLAMA"
    dim: int = 768
    n_layers: int = 6                    # run_ted.py:107 (llm_layers)
    n_heads: int = 12
    intermediate_dim: int = 3072
    vocab_size: int = 30522
    max_position: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    compute_bf16: bool = True   # bf16 matmuls in the frozen backbone
    # LLaMA-specific (run_ted.py:133-175; ignored by the BERT path)
    n_kv_heads: int | None = None        # grouped-query attention
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6


def llama7b_llm_config(n_layers: int = 6) -> LLMConfig:
    """LLaMA-7B geometry truncated to n_layers, the reference's LLAMA
    option (run_ted.py:133-140 sets num_hidden_layers=args.llm_layers)."""
    return LLMConfig(model="LLAMA", dim=4096, n_layers=n_layers, n_heads=32,
                     intermediate_dim=11008, vocab_size=32000,
                     max_position=2048, rms_norm_eps=1e-6)


@dataclass(frozen=True)
class HOPConfig:
    """HOP generator hyperparameters (reference model/HOP.py:72-174)."""
    d_model: int = 128                   # mel feature dim == reprogramming query dim
    n_heads: int = 8
    d_ff: int = 128                      # d_keys in ReprogrammingLayer
    num_prototype_tokens: int = 1500     # mapping_layer out (HOP.py:115-116)
    use_gwnet: bool = True
    use_reprogramming: bool = True
    # Fast step (default): share the speaker-independent trunk between the
    # main and random-speaker forwards and update G/D from one joint
    # backward (simultaneous-GAN semantics). Parity mode (False) keeps the
    # reference's 3-forward sequential-update structure; quality is
    # indistinguishable across 3 seeds x 20 epochs on a trained eval net
    # (benchmarks/FUSED_MULTISEED.json: parity minima 1182/1148/1153 vs
    # fused 1144/1172/1174), so the ~40% faster fused step is the default.
    fused_step: bool = True
    hidden_size: int = 350               # BiGRU hidden (HOP.py:125)
    gru_layers: int = 4
    z_size: int = 16
    beat_window: int = 3400              # unfold window (HOP.py:210)
    beat_stride: int = 2191
    beat_feat: int = 170                 # beat MLP out (HOP.py:130-134)
    # gwnet dims (HOP.py:141-143)
    gwnet_residual: int = 64
    gwnet_dilation: int = 64
    gwnet_skip: int = 256
    gwnet_end: int = 512
    gwnet_blocks: int = 4
    gwnet_layers: int = 2
    gwnet_node_emb: int = 10
    gwnet_order: int = 2


@dataclass(frozen=True)
class BaselineConfig:
    """Hyperparameters shared by the legacy baselines.

    These flags are referenced but undefined in the reference's parser; the
    values follow the upstream Trimodal/HA2G defaults its models assume.
    """
    hidden_size: int = 300
    n_layers: int = 4
    dropout_prob: float = 0.3
    input_context: str = "both"          # both | audio | text | none
    freeze_wordembed: bool = False
    gan_noise_size: int = 0
    pose_level: int = 3                  # hierarchy cascade depth (TED)
    motion_ae_latent_dim: int = 128


@dataclass(frozen=True)
class LossConfig:
    """Loss weights (reference run_ted.py:89-92 / run_expressive.py:86-89)."""
    regression_weight: float = 600.0
    gan_weight: float = 5.0
    kld_weight: float = 0.6
    reg_weight: float = 0.4              # diversity regularizer
    warmup_epochs: int = 10              # GAN gate: epoch > 10 (train_llm.py:15)
    bc_start_epoch: int = 35             # BC gate: epoch > 35 (Evaluate.py:175)
    huber_beta: float = 0.1
    div_beta: float = 0.05
    div_clamp: float = -1000.0
    contrastive_pos_weight: float = 0.0  # hierarchy-only
    contrastive_neg_weight: float = 0.0
    physical_weight: float = 0.0


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 256
    epochs: int = 75
    learning_rate: float = 0.01          # generator Adam lr (run_ted.py:338)
    dis_lr_scale: float = 0.1            # D lr = G lr * 0.1 (run_ted.py:344-346)
    betas: tuple = (0.5, 0.999)
    z_type: str = "speaker"              # speaker | random | none
    seed: int = 2021
    grad_clip_seq2seq: float = 5.0       # train_seq2seq.py:48
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"      # TPU-native default (ref used fp32)


@dataclass(frozen=True)
class ParallelConfig:
    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel: int = 1              # TP degree for the frozen LLM


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    llm: LLMConfig = field(default_factory=LLMConfig)
    hop: HOPConfig = field(default_factory=HOPConfig)
    baseline: BaselineConfig = field(default_factory=BaselineConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def ted_config(**overrides) -> Config:
    """TED Gesture preset (reference run_ted.py defaults)."""
    cfg = Config()
    return cfg.replace(**overrides) if overrides else cfg


def expressive_config(**overrides) -> Config:
    """TED Expressive preset (reference run_expressive.py:81-100)."""
    cfg = Config(
        data=DataConfig(dataset="TED_expressive"),
        loss=LossConfig(regression_weight=2100.0, gan_weight=5.0,
                        kld_weight=0.8, reg_weight=0.5),
        train=TrainConfig(learning_rate=0.005),
    )
    return cfg.replace(**overrides) if overrides else cfg


def tiny_test_config(dataset: str = "TED") -> Config:
    """Small shapes for unit tests / dry runs: real topology, thin layers."""
    base = ted_config() if dataset == "TED" else expressive_config()
    return base.replace(
        llm=LLMConfig(dim=64, n_layers=2, n_heads=4, intermediate_dim=128,
                      vocab_size=128, max_position=64),
        hop=dataclasses.replace(
            base.hop, d_model=128, n_heads=4, d_ff=16,
            num_prototype_tokens=32, hidden_size=64, gru_layers=2,
            gwnet_residual=16, gwnet_dilation=16, gwnet_skip=32,
            gwnet_end=32),
        baseline=dataclasses.replace(base.baseline, hidden_size=32, n_layers=2),
        train=dataclasses.replace(base.train, batch_size=4),
    )
