"""ResNet backbones in Flax (NHWC): ResNet-18 feature extractor for BiSeNet
and ResNet-50 classifier for the anyGAN attribute predictor.

Rebuild of `src/Segmentation/resnet.py` (BasicBlock ResNet-18 emitting
stride-8/16/32 features) and the torchvision ResNet-50 the reference loads
for anyGAN (`src/models.py:69-77`, fc -> 40*2 logits). Module names mirror
the torch attribute paths so `models/port.py` can translate checkpoints
mechanically.

The norm layer is pluggable: "bn" (BatchNorm+ReLU, the reference's shipped
configuration) or "abn" / "abn_sync" (our fused Pallas activated-BN with
leaky-ReLU, the InPlace-ABN capability the reference keeps commented out at
`Segmentation/model.py:12`, `resnet.py:9` — sync variant psums moments over
the mesh axis).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.abn import FusedABNorm
from ..ops.conv import Conv3x3

Array = jax.Array


class NormAct(nn.Module):
    """BatchNorm (+optional ReLU) or fused ABN, selected by `norm`.

    `dtype` is the surrounding COMPUTE dtype (mixed-precision training):
    normalization statistics always run in f32 — the input is upcast for the
    norm and the result is cast back, the standard TPU mixed-precision
    recipe (params/stats f32, matmul/conv compute bf16)."""

    norm: str = "bn"  # "bn" | "abn" | "abn_sync"
    act: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = x.astype(jnp.float32)
        if self.norm == "bn":
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                axis_name=self.axis_name if train else None, name="bn",
            )(x)
            out = nn.relu(x) if self.act else x
        else:
            axis = self.axis_name if self.norm == "abn_sync" else None
            out = FusedABNorm(
                activation="leaky_relu" if self.act else "identity",
                axis_name=axis, name="abn",
            )(x, train=train)
        return out.astype(self.dtype)


def max_pool_3x3_s2(x: Array) -> Array:
    """torch MaxPool2d(3, 2, padding=1) over NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class BasicBlock(nn.Module):
    out_chan: int
    stride: int = 1
    norm: str = "bn"
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        in_chan = x.shape[-1]
        dt = self.dtype
        # stride-1 3x3s ride the measured-dispatch layer (ops/conv.py) so
        # the opt-in int8 gate reaches the seg-guidance VJP; params and
        # auto-mode numerics are identical to nn.Conv (drop-in contract).
        if self.stride == 1:
            r = Conv3x3(self.out_chan, use_bias=False, dtype=dt, name="conv1")(x)
        else:
            r = nn.Conv(self.out_chan, (3, 3), strides=self.stride, padding=1,
                        use_bias=False, dtype=dt, name="conv1")(x)
        r = NormAct(self.norm, act=True, axis_name=self.axis_name, dtype=dt,
                    name="bn1")(r, train)
        r = Conv3x3(self.out_chan, use_bias=False, dtype=dt, name="conv2")(r)
        r = NormAct(self.norm, act=False, axis_name=self.axis_name, dtype=dt,
                    name="bn2")(r, train)
        shortcut = x
        if in_chan != self.out_chan or self.stride != 1:
            shortcut = nn.Conv(self.out_chan, (1, 1), strides=self.stride,
                               use_bias=False, dtype=dt, name="downsample_conv")(x)
            shortcut = NormAct(self.norm, act=False, axis_name=self.axis_name,
                               dtype=dt, name="downsample_bn")(shortcut, train)
        return nn.relu(shortcut.astype(dt) + r)


class Resnet18Features(nn.Module):
    """Returns (feat8, feat16, feat32) — `src/Segmentation/resnet.py:58-80`."""

    norm: str = "bn"
    axis_name: Optional[str] = None
    width: int = 64  # shrink for tests
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Tuple[Array, Array, Array]:
        w, dt = self.width, self.dtype
        h = nn.Conv(w, (7, 7), strides=2, padding=3, use_bias=False, dtype=dt,
                    name="conv1")(x.astype(dt))
        h = NormAct(self.norm, act=True, axis_name=self.axis_name, dtype=dt,
                    name="bn1")(h, train)
        h = max_pool_3x3_s2(h)
        for j in range(2):
            h = BasicBlock(w, 1, self.norm, self.axis_name, dt,
                           name=f"layer1_{j}")(h, train)
        f8 = h
        for j in range(2):
            f8 = BasicBlock(w * 2, 2 if j == 0 else 1, self.norm, self.axis_name,
                            dt, name=f"layer2_{j}")(f8, train)
        f16 = f8
        for j in range(2):
            f16 = BasicBlock(w * 4, 2 if j == 0 else 1, self.norm, self.axis_name,
                             dt, name=f"layer3_{j}")(f16, train)
        f32 = f16
        for j in range(2):
            f32 = BasicBlock(w * 8, 2 if j == 0 else 1, self.norm, self.axis_name,
                             dt, name=f"layer4_{j}")(f32, train)
        return f8, f16, f32


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    norm: str = "bn"

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = NormAct(self.norm, act=True, name="bn1")(out, train)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, name="conv2")(out)
        out = NormAct(self.norm, act=True, name="bn2")(out, train)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = NormAct(self.norm, act=False, name="bn3")(out, train)
        shortcut = x
        if self.downsample:
            shortcut = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample_conv")(x)
            shortcut = NormAct(self.norm, act=False, name="downsample_bn")(shortcut, train)
        return nn.relu(shortcut + out)


class ResNet50(nn.Module):
    """torchvision-style ResNet-50 with a configurable head — the anyGAN
    attribute predictor uses num_outputs = 40*2 (`src/models.py:69-77`)."""

    num_outputs: int = 80
    norm: str = "bn"
    width: int = 64

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        w = self.width
        h = nn.Conv(w, (7, 7), strides=2, padding=3, use_bias=False, name="conv1")(x)
        h = NormAct(self.norm, act=True, name="bn1")(h, train)
        h = max_pool_3x3_s2(h)
        layout = [(w, 3, 1), (w * 2, 4, 2), (w * 4, 6, 2), (w * 8, 3, 2)]
        for i, (planes, blocks, stride) in enumerate(layout, start=1):
            for j in range(blocks):
                h = Bottleneck(
                    planes, stride if j == 0 else 1, downsample=(j == 0),
                    norm=self.norm, name=f"layer{i}_{j}",
                )(h, train)
        h = jnp.mean(h, axis=(1, 2))  # global average pool
        return nn.Dense(self.num_outputs, name="fc")(h)
