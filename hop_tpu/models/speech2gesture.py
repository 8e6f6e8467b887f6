"""Speech2Gesture baseline: spectrogram 2D CNN + 1D U-Net GAN.

Counterpart of reference model/speech2gesture.py:106-251 (itself a torch
port of the original TF model). The reference's Conv1d_tf/Conv2d_tf SAME
-padding shims (:9-104) are simply flax padding='SAME', which already
implements TF semantics. Upsample(bilinear, align_corners=False) maps to
jax.image.resize(method='linear') — both use half-pixel centres.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from hop_tpu.models import common


class ConvNormRelu(nn.Module):
    features: int
    conv_type: str = "1d"   # "1d" | "2d"
    downsample: bool = False
    k: int | None = None
    s: int | None = None
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.k if self.k is not None else (4 if self.downsample else 3)
        s = self.s if self.s is not None else (2 if self.downsample else 1)
        if self.conv_type == "1d":
            x = nn.Conv(self.features, (k,), strides=(s,),
                        padding=self.padding)(x)
        else:
            x = nn.Conv(self.features, (k, k), strides=(s, s),
                        padding=self.padding)(x)
        x = common.BatchNorm(use_running_average=not train)(x)
        return common.leaky_relu(x, 0.2)


class UnetUp(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        # repeat_interleave(2) along time, crop to the skip's length, add
        x1 = jnp.repeat(x1, 2, axis=1)[:, :x2.shape[1]]
        return ConvNormRelu(self.features)(x1 + x2, train)


class AudioEncoder(nn.Module):
    """(B, mels, T) spectrogram -> (B, n_frames, 256)
    (reference speech2gesture.py:144-197)."""
    n_frames: int

    @nn.compact
    def __call__(self, spectrogram, train: bool = False):
        x = spectrogram[..., None]                      # (B, mels, T, 1)
        x = ConvNormRelu(64, "2d")(x, train)
        x = ConvNormRelu(64, "2d", downsample=True)(x, train)
        x = ConvNormRelu(128, "2d")(x, train)
        x = ConvNormRelu(128, "2d", downsample=True)(x, train)
        x = ConvNormRelu(256, "2d")(x, train)
        x = ConvNormRelu(256, "2d", downsample=True)(x, train)
        x = ConvNormRelu(256, "2d")(x, train)
        x = ConvNormRelu(256, "2d", padding="VALID")(x, train)
        # bilinear resize to (n_frames, 1), half-pixel == align_corners=
        # False; antialias=False matches torch Upsample, which does NOT
        # low-pass when downscaling the frequency axis to 1
        # (jax.image.resize antialiases by default — that diverges ~2%)
        x = jax.image.resize(
            x, (x.shape[0], self.n_frames, 1, x.shape[3]), method="linear",
            antialias=False)
        x1 = x[:, :, 0, :]                              # (B, n_frames, 256)

        # two statements, not nested: flax names submodules in
        # CONSTRUCTION order and Python builds the outer callee before
        # its argument, so nesting would name the second-applied conv
        # ConvNormRelu_8 and the first-applied one _9 (swapped weights
        # under the torch importer)
        x2 = ConvNormRelu(256)(x1, train)
        x2 = ConvNormRelu(256)(x2, train)
        x3 = ConvNormRelu(256, downsample=True)(x2, train)
        x4 = ConvNormRelu(256, downsample=True)(x3, train)
        x5 = ConvNormRelu(256, downsample=True)(x4, train)
        x6 = ConvNormRelu(256, downsample=True)(x5, train)
        x7 = ConvNormRelu(256, downsample=True)(x6, train)
        x = UnetUp(256)(x7, x6, train)
        x = UnetUp(256)(x, x5, train)
        x = UnetUp(256)(x, x4, train)
        x = UnetUp(256)(x, x3, train)
        x = UnetUp(256)(x, x2, train)
        return x


class Generator(nn.Module):
    """reference speech2gesture.py:200-231."""
    n_poses: int
    pose_dim: int
    n_pre_poses: int

    @nn.compact
    def __call__(self, in_spec, pre_poses, train: bool = False):
        audio = AudioEncoder(self.n_poses)(in_spec, train)
        pp = pre_poses.reshape(pre_poses.shape[0], -1)
        pp = nn.Dense(32)(pp)
        pp = common.BatchNorm(use_running_average=not train)(pp)
        pp = nn.relu(pp)
        pp = nn.Dense(16)(pp)
        pp = jnp.broadcast_to(pp[:, None, :],
                              (pp.shape[0], self.n_poses, 16))
        x = jnp.concatenate([audio, pp], axis=-1)
        for _ in range(4):
            x = ConvNormRelu(256)(x, train)
        return nn.Conv(self.pose_dim, (1,))(x)


class Discriminator(nn.Module):
    """PatchGAN-ish discriminator on pose differences (:234-250)."""
    pose_dim: int

    @nn.compact
    def __call__(self, poses, train: bool = False):
        x = poses[:, 1:] - poses[:, :-1]
        x = nn.Conv(64, (4,), strides=(2,), padding="SAME")(x)
        x = common.leaky_relu(x, 0.2)
        x = ConvNormRelu(128, downsample=True)(x, train)
        x = ConvNormRelu(256, k=4, s=1)(x, train)
        return nn.Conv(1, (4,), padding="SAME")(x)
