"""Extra segmentation building blocks (InPlace-ABN companion modules).

The reference vendors these alongside the ABN extension
(`src/Segmentation/modules/deeplab.py`, `residual.py`, `dense.py`, `misc.py`)
as part of its capability surface (none are wired into the shipped BiSeNet;
`deeplab.py:5` even imports a nonexistent module). Rebuilt in Flax on the
fused ABN layer; the DeepLab head's dead import is, of course, not replicated.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.abn import FusedABNorm

Array = jax.Array


class GlobalAvgPool2d(nn.Module):
    """(B, H, W, C) -> (B, C) (`modules/misc.py:5-12`)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return jnp.mean(x, axis=(1, 2))


class DeeplabV3Head(nn.Module):
    """ASPP head (`modules/deeplab.py:9-84`): three dilated 3x3 branches +
    1x1 branch + global-pooling branch, concatenated then fused; output 1x1
    classifier with global-context bias."""

    hidden_channels: int = 256
    out_channels: int = 256
    num_classes: Optional[int] = None
    dilations: Tuple[int, int, int] = (12, 24, 36)
    norm_activation: str = "leaky_relu"

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        h = self.hidden_channels
        branches = [nn.Conv(h, (1, 1), use_bias=False, name="map_conv_0")(x)]
        for i, d in enumerate(self.dilations, start=1):
            branches.append(
                nn.Conv(h, (3, 3), padding=d, kernel_dilation=d, use_bias=False,
                        name=f"map_conv_{i}")(x)
            )
        out = jnp.concatenate(branches, axis=-1)
        out = FusedABNorm(activation=self.norm_activation, name="map_bn")(out, train)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="red_conv")(out)

        # global pooling branch
        pool = jnp.mean(x, axis=(1, 2), keepdims=True)
        pool = nn.Conv(h, (1, 1), use_bias=False, name="global_pooling_conv")(pool)
        pool = FusedABNorm(activation=self.norm_activation, name="global_pooling_bn")(
            pool, train
        )
        pool_red = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                           name="pool_red_conv")(pool)
        out = out + pool_red
        out = FusedABNorm(activation=self.norm_activation, name="red_bn")(out, train)

        if self.num_classes is not None:
            cls = nn.Conv(self.num_classes, (1, 1), name="cls_conv")(out)
            cls_bias = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                               name="pool_cls_conv")(pool)
            out = cls + cls_bias
        return out


class IdentityResidualBlock(nn.Module):
    """Pre-activation residual block with 2- or 3-conv bodies
    (`modules/residual.py:8-88`)."""

    channels: Tuple[int, ...] = (64, 64)
    stride: int = 1
    dilation: int = 1
    norm_activation: str = "leaky_relu"

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if len(self.channels) not in (2, 3):
            raise ValueError("channels must have length 2 or 3")
        in_c = x.shape[-1]
        need_proj = in_c != self.channels[-1] or self.stride != 1

        bn1 = FusedABNorm(activation=self.norm_activation, name="bn1")(x, train)
        shortcut = x
        if need_proj:
            shortcut = nn.Conv(self.channels[-1], (1, 1), strides=self.stride,
                               use_bias=False, name="proj_conv")(bn1)

        d = self.dilation
        if len(self.channels) == 2:
            h = nn.Conv(self.channels[0], (3, 3), strides=self.stride, padding=d,
                        kernel_dilation=d, use_bias=False, name="conv1")(bn1)
            h = FusedABNorm(activation=self.norm_activation, name="bn2")(h, train)
            h = nn.Conv(self.channels[1], (3, 3), padding=d, kernel_dilation=d,
                        use_bias=False, name="conv2")(h)
        else:
            h = nn.Conv(self.channels[0], (1, 1), strides=self.stride,
                        use_bias=False, name="conv1")(bn1)
            h = FusedABNorm(activation=self.norm_activation, name="bn2")(h, train)
            h = nn.Conv(self.channels[1], (3, 3), padding=d, kernel_dilation=d,
                        use_bias=False, name="conv2")(h)
            h = FusedABNorm(activation=self.norm_activation, name="bn3")(h, train)
            h = nn.Conv(self.channels[2], (1, 1), use_bias=False, name="conv3")(h)
        return h + shortcut


class DenseModule(nn.Module):
    """DenseNet-style module (`modules/dense.py:9-42`)."""

    growth: int = 32
    layers: int = 4
    norm_activation: str = "leaky_relu"

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        feats = x
        for i in range(self.layers):
            h = FusedABNorm(activation=self.norm_activation, name=f"bn_{i}")(feats, train)
            h = nn.Conv(self.growth, (3, 3), padding=1, use_bias=False,
                        name=f"conv_{i}")(h)
            feats = jnp.concatenate([feats, h], axis=-1)
        return feats
