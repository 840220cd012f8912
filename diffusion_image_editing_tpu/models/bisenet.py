"""BiSeNet face-parsing network in Flax (NHWC).

Rebuild of `src/Segmentation/model.py` (vendored from
zllrunning/face-parsing.PyTorch): ContextPath (ResNet-18 + ARM-16/32 +
global-average context), spatial path replaced by the stride-8 resnet feature
(`model.py:248`), FeatureFusionModule, and three upsampled output heads.
Module names mirror the torch attribute paths for checkpoint porting.

Bilinear upsampling uses align_corners=True to match `F.interpolate` at
`model.py:256-262`, implemented as separable interpolation matrices (two
matmuls — MXU-friendly, unlike gather-based resize).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..ops.conv import Conv3x3
from .layers import upsample_nearest
from .resnet import NormAct, Resnet18Features

Array = jax.Array


def _interp_matrix(n_in: int, n_out: int, dtype=jnp.float32) -> Array:
    """(n_out, n_in) align_corners=True bilinear interpolation matrix."""
    if n_in == 1:
        return jnp.ones((n_out, 1), dtype)
    pos = jnp.linspace(0.0, n_in - 1.0, n_out)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
    frac = pos - lo
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in), dtype)
    m = m.at[rows, lo].set(1.0 - frac)
    m = m.at[rows, lo + 1].add(frac)
    return m


def resize_bilinear_align_corners(x: Array, h_out: int, w_out: int) -> Array:
    """NHWC bilinear resize with align_corners=True (torch semantics)."""
    n, h, w, c = x.shape
    if (h, w) == (h_out, w_out):
        return x
    my = _interp_matrix(h, h_out, x.dtype)
    mx = _interp_matrix(w, w_out, x.dtype)
    return jnp.einsum("Yh,nhwc,Xw->nYXc", my, x, mx)


class ConvBNReLU(nn.Module):
    """conv(bias=False) -> norm -> relu (`Segmentation/model.py:15-39`).

    `dtype` = conv compute dtype (mixed precision); params and norm
    statistics stay f32 (see `NormAct`)."""

    out_chan: int
    ks: int = 3
    stride: int = 1
    padding: int = 1
    norm: str = "bn"
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        # 3x3 stride-1 rides the measured-dispatch layer (ops/conv.py):
        # identical params/numerics under auto; lets the opt-in int8 gate
        # reach the BiSeNet-dominated seg-guidance VJP.
        if self.ks == 3 and self.stride == 1 and self.padding == 1:
            x = Conv3x3(self.out_chan, use_bias=False, dtype=self.dtype,
                        name="conv")(x.astype(self.dtype))
        else:
            x = nn.Conv(self.out_chan, (self.ks, self.ks), strides=self.stride,
                        padding=self.padding, use_bias=False, dtype=self.dtype,
                        name="conv")(x.astype(self.dtype))
        return NormAct(self.norm, act=True, axis_name=self.axis_name,
                       dtype=self.dtype, name="bn")(x, train)


class BiSeNetOutput(nn.Module):
    """ConvBNReLU -> 1x1 conv to n_classes (`model.py:42-59`)."""

    mid_chan: int
    n_classes: int
    norm: str = "bn"
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = ConvBNReLU(self.mid_chan, 3, 1, 1, self.norm, self.axis_name,
                       self.dtype, name="conv")(x, train)
        # logits head: compute may be bf16; emit f32 for the loss
        return nn.Conv(self.n_classes, (1, 1), use_bias=False, dtype=self.dtype,
                       name="conv_out")(x).astype(jnp.float32)


class AttentionRefinementModule(nn.Module):
    """feat * sigmoid(bn(1x1(gap(feat)))) (`model.py:74-96`)."""

    out_chan: int
    norm: str = "bn"
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        feat = ConvBNReLU(self.out_chan, 3, 1, 1, self.norm, self.axis_name,
                          self.dtype, name="conv")(x, train)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.out_chan, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv_atten")(atten)
        atten = NormAct(self.norm, act=False, axis_name=self.axis_name,
                        dtype=self.dtype, name="bn_atten")(atten, train)
        return feat * jax.nn.sigmoid(atten)


class ContextPath(nn.Module):
    """ResNet-18 + ARMs + global context (`model.py:99-150`)."""

    norm: str = "bn"
    axis_name: Optional[str] = None
    width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Tuple[Array, Array, Array]:
        w = self.width
        feat8, feat16, feat32 = Resnet18Features(
            self.norm, self.axis_name, width=w, dtype=self.dtype, name="resnet"
        )(x, train)
        h16, w16 = feat16.shape[1:3]
        h8, w8 = feat8.shape[1:3]

        avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(w * 2, 1, 1, 0, self.norm, self.axis_name, self.dtype,
                         name="conv_avg")(avg, train)
        avg_up = jnp.broadcast_to(avg, (avg.shape[0],) + feat32.shape[1:3] + (avg.shape[-1],))

        f32_arm = AttentionRefinementModule(w * 2, self.norm, self.axis_name,
                                            self.dtype, name="arm32")(feat32, train)
        f32_sum = f32_arm + avg_up
        # mode="nearest" (model.py:128) as broadcast+reshape (2x at every
        # production size): the jax.image.resize gather's scatter-add VJP sat
        # in the trainer's and the seg-guidance VJP's backward
        # (see layers.upsample_nearest)
        f32_up = upsample_nearest(f32_sum, h16, w16)
        f32_up = ConvBNReLU(w * 2, 3, 1, 1, self.norm, self.axis_name, self.dtype,
                            name="conv_head32")(f32_up, train)

        f16_arm = AttentionRefinementModule(w * 2, self.norm, self.axis_name,
                                            self.dtype, name="arm16")(feat16, train)
        f16_sum = f16_arm + f32_up
        f16_up = upsample_nearest(f16_sum, h8, w8)
        f16_up = ConvBNReLU(w * 2, 3, 1, 1, self.norm, self.axis_name, self.dtype,
                            name="conv_head16")(f16_up, train)
        return feat8, f16_up, f32_up


class FeatureFusionModule(nn.Module):
    """Concat + 1x1 ConvBNReLU + squeeze-excite gate (`model.py:189-231`)."""

    out_chan: int
    norm: str = "bn"
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fsp: Array, fcp: Array, train: bool = False) -> Array:
        fcat = jnp.concatenate([fsp.astype(self.dtype), fcp.astype(self.dtype)], axis=-1)
        feat = ConvBNReLU(self.out_chan, 1, 1, 0, self.norm, self.axis_name,
                          self.dtype, name="convblk")(fcat, train)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.out_chan // 4, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv1")(atten)
        atten = nn.relu(atten)
        atten = nn.Conv(self.out_chan, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv2")(atten)
        atten = jax.nn.sigmoid(atten)
        return feat * atten + feat


class BiSeNet(nn.Module):
    """Three upsampled heads, (B, H, W, n_classes) each (`model.py:234-268`)."""

    n_classes: int = 19
    norm: str = "bn"
    axis_name: Optional[str] = None
    width: int = 64  # 64 = reference size; smaller for tests
    dtype: jnp.dtype = jnp.float32  # conv COMPUTE dtype; params/norms stay f32

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        w = self.width
        h0, w0 = x.shape[1:3]
        feat_res8, feat_cp8, feat_cp16 = ContextPath(
            self.norm, self.axis_name, width=w, dtype=self.dtype, name="cp"
        )(x, train)
        feat_fuse = FeatureFusionModule(w * 4, self.norm, self.axis_name,
                                        self.dtype, name="ffm")(
            feat_res8, feat_cp8, train
        )
        out = BiSeNetOutput(w * 4, self.n_classes, self.norm, self.axis_name,
                            self.dtype, name="conv_out")(feat_fuse, train)
        out16 = BiSeNetOutput(w, self.n_classes, self.norm, self.axis_name,
                              self.dtype, name="conv_out16")(feat_cp8, train)
        out32 = BiSeNetOutput(w, self.n_classes, self.norm, self.axis_name,
                              self.dtype, name="conv_out32")(feat_cp16, train)
        out = resize_bilinear_align_corners(out, h0, w0)
        out16 = resize_bilinear_align_corners(out16, h0, w0)
        out32 = resize_bilinear_align_corners(out32, h0, w0)
        return out, out16, out32


class SegForwardClosure(struct.PyTreeNode):
    """Pytree seg forward (resize 512 + ImageNet norm -> BiSeNet -> argmax):
    params are a leaf, so jitted callers take the weights as traced ARGUMENTS
    (CLAUDE.md rule 1), and the closure composes into larger fused programs
    (e.g. the one-dispatch segment+mask+encode prep, `pipeline/edit_pipeline.
    _jit_prepare_for_edit`)."""

    apply_fn: Any = struct.field(pytree_node=False)
    params: Any = None
    image_size: int = struct.field(pytree_node=False, default=512)

    def __call__(self, img: Array) -> Array:
        from ..ops.resize import imagenet_normalize, resize_bilinear, to_unit_range

        x = resize_bilinear(img, self.image_size, self.image_size)
        x = imagenet_normalize(to_unit_range(x))
        out = self.apply_fn(self.params, x)[0]
        return jnp.argmax(out[0], axis=-1)


@jax.jit
def _jit_seg_forward(closure: SegForwardClosure, img: Array) -> Array:
    return closure(img)


class SegmentationModel:
    """Inference wrapper: resize 512 + ImageNet normalize -> BiSeNet -> argmax
    parsing map (`src/models.py:80-118`). Input: (B, H, W, 3) in [-1, 1]."""

    def __init__(self, module: BiSeNet, params, image_size: int = 512):
        self.module = module
        self.params = params
        self.image_size = image_size
        self.closure = SegForwardClosure(module.apply, params, image_size)

    def __call__(self, img: Array) -> Array:
        return _jit_seg_forward(self.closure, img)

    def logits_fn(self, params, img: Array) -> Array:
        """Differentiable logits for NetAttrFunc guidance
        (`src/attr_functions.py:213-219`): image -> (B, H, W, n_classes)."""
        return self.module.apply(params, img)[0]
