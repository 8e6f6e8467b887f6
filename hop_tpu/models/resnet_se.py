"""SE-ResNet-34 multi-scale audio encoder for the hierarchical (HA2G) model.

Counterpart of reference model/ResNetSE34V2.py:13-219 + model/ResNetBlocks.py:
7-96: SE basic blocks [3,4,6,3] with filters [32,64,128,256] over the
(mels=128, T=70) spectrogram; taps after layer2/3/4 are brought to a common
(62/63-high, 34-wide) grid via PixelShuffle upsampling + valid convs, each
projected to nOut per time step (fc_low/mid/high), then blended per cascade
level with speaker-conditioned softmax weights (:191-212).

Layout feature-last (B, H=mels, W=time, C). PixelShuffle follows torch
semantics: out[b, h*r+i, w*r+j, c] = in[b, h, w, c*r*r + i*r + j].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from hop_tpu.models import common


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C*r*r) -> (B, H*r, W*r, C), torch PixelShuffle semantics."""
    B, H, W, C = x.shape
    c_out = C // (r * r)
    x = x.reshape(B, H, W, c_out, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # B, H, i, W, j, c
    return x.reshape(B, H * r, W * r, c_out)


class SELayer(nn.Module):
    """Squeeze-excitation, reduction 8 (ResNetBlocks.py:82-96)."""
    channels: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))  # (B, C)
        y = nn.relu(nn.Dense(self.channels // self.reduction)(y))
        y = jax.nn.sigmoid(nn.Dense(self.channels)(y))
        return x * y[:, None, None, :]


class SEBasicBlock(nn.Module):
    """conv -> relu -> bn -> conv -> bn -> SE -> +res -> relu
    (ResNetBlocks.py:7-37; note the reference's conv1->relu->bn1 order)."""
    planes: int
    stride: int = 1
    use_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False)(x)
        y = nn.relu(y)
        y = common.BatchNorm(use_running_average=not train)(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False)(y)
        y = common.BatchNorm(use_running_average=not train)(y)
        y = SELayer(self.planes)(y)
        if self.use_downsample:
            residual = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False)(x)
            residual = common.BatchNorm(use_running_average=not train)(residual)
        return nn.relu(y + residual)


class ResNetSE(nn.Module):
    """Multi-scale encoder + speaker-conditioned blend weights."""
    n_speakers: int
    pose_level: int = 3
    n_out: int = 32
    layers: tuple = (3, 4, 6, 3)
    filters: tuple = (32, 64, 128, 256)

    def _stage(self, x, planes, blocks, stride, train, name):
        x = SEBasicBlock(planes, stride, use_downsample=True,
                         name=f"{name}_0")(x, train) if (
            stride != 1 or x.shape[-1] != planes) else SEBasicBlock(
            planes, stride, name=f"{name}_0")(x, train)
        for i in range(1, blocks):
            x = SEBasicBlock(planes, name=f"{name}_{i}")(x, train)
        return x

    @nn.compact
    def __call__(self, spectrogram: jnp.ndarray,
                 vid_indices: Optional[jnp.ndarray],
                 train: bool = False):
        """spectrogram (B, mels, T) -> (weight, feat_low, feat_mid,
        feat_high, [blend per level])."""
        x = spectrogram[..., None]  # (B, mels, T, 1)
        B = x.shape[0]
        x = nn.Conv(self.filters[0], (3, 3), padding=1, name="conv1")(x)
        x = nn.relu(x)
        x = common.BatchNorm(use_running_average=not train)(x)

        x = self._stage(x, self.filters[0], self.layers[0], 1, train, "layer1")
        feat1 = self._stage(x, self.filters[1], self.layers[1], 2, train,
                            "layer2")
        feat2 = self._stage(feat1, self.filters[2], self.layers[2], 2, train,
                            "layer3")
        feat3 = self._stage(feat2, self.filters[3], self.layers[3], 2, train,
                            "layer4")

        # low: valid k2 conv on the layer2 map
        f1 = nn.Conv(64, (2, 2), padding="VALID", name="conv_low")(feat1)
        f1 = nn.relu(f1)
        f1 = common.BatchNorm(use_running_average=not train)(f1)
        # torch reshape(B, C*H, W): channel-major flatten => transpose first
        f1 = jnp.transpose(f1, (0, 3, 1, 2)).reshape(B, -1, f1.shape[2])
        f1 = jnp.swapaxes(f1, 1, 2)  # (B, W, C*H)
        feat_low = nn.Dense(self.n_out, name="fc_low")(f1)

        f2 = pixel_shuffle(feat2, 2)
        f2 = nn.Conv(32, (3, 3), padding="VALID", name="conv_mid")(f2)
        f2 = nn.relu(f2)
        f2 = common.BatchNorm(use_running_average=not train)(f2)
        f2 = jnp.transpose(f2, (0, 3, 1, 2)).reshape(B, -1, f2.shape[2])
        f2 = jnp.swapaxes(f2, 1, 2)
        feat_mid = nn.Dense(self.n_out, name="fc_mid")(f2)

        f3 = pixel_shuffle(feat3, 4)
        f3 = nn.Conv(16, (3, 3), padding="VALID", name="conv_high")(f3)
        f3 = nn.relu(f3)
        f3 = common.BatchNorm(use_running_average=not train)(f3)
        f3 = jnp.transpose(f3, (0, 3, 1, 2)).reshape(B, -1, f3.shape[2])
        f3 = jnp.swapaxes(f3, 1, 2)
        feat_high = nn.Dense(self.n_out, name="fc_high")(f3)

        # feat_low is one frame longer (63-high k2 vs 62-high k3 taps);
        # align to the common time length like the reference's runtime shapes
        t = min(feat_low.shape[1], feat_mid.shape[1], feat_high.shape[1])
        feat_low, feat_mid, feat_high = (feat_low[:, :t], feat_mid[:, :t],
                                         feat_high[:, :t])

        blends = []
        weight = None
        if vid_indices is not None:
            z = nn.Embed(self.n_speakers, 16,
                         embedding_init=nn.initializers.normal(1.0),
                         name="speaker_embed")(vid_indices)
            z = nn.Dense(16, name="speaker_proj")(z)
            h = nn.elu(z)
            h = nn.elu(nn.Dense(32, name="fc1")(h))
            h = nn.Dense(3 * self.pose_level, name="fc2")(h)
            h = h.reshape(B, 3, self.pose_level)
            weight = jax.nn.softmax(h, axis=1)
            for i in range(self.pose_level):
                w = weight[:, :, i][:, :, None, None]  # (B, 3, 1, 1)
                blends.append(feat_low * w[:, 0] + feat_mid * w[:, 1]
                              + feat_high * w[:, 2])
        return weight, feat_low, feat_mid, feat_high, blends
