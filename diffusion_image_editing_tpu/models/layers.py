"""Shared Flax building blocks for the UNet / VAE model families.

Architecturally compatible with the torch models the reference loads through
diffusers (`src/models.py:17-54`) — same tensor algebra, so ported HF
checkpoints reproduce outputs — but implemented NHWC/TPU-first: fused
GroupNorm+SiLU (Pallas), flash attention (Pallas), fp32 time-embedding math
with configurable compute dtype.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention
from ..ops.conv import Conv3x3
from ..ops.fused_conv import fused_conv_wanted, gn_affine_coeffs
from ..ops.groupnorm import group_norm

Array = jax.Array


def timestep_embedding(
    timesteps: Array,
    dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1.0,
    max_period: float = 10000.0,
) -> Array:
    """Sinusoidal timestep embedding (diffusers `Timesteps` semantics)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimeEmbedding(nn.Module):
    """linear_1 -> SiLU -> linear_2 (diffusers `TimestepEmbedding`)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: Array) -> Array:
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(x)
        return x


class ResnetBlock2D(nn.Module):
    """GroupNorm+SiLU -> conv -> (+temb) -> GroupNorm+SiLU -> conv, residual."""

    out_channels: int
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    dropout: float = 0.0
    output_scale_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: Array, temb: Optional[Array] = None, deterministic: bool = True
    ) -> Array:
        in_channels = x.shape[-1]
        residual = x

        # DIE_TPU_FUSED_CONV=1: fold each GroupNorm(+temb)+SiLU into its
        # conv as a per-(batch, channel) affine prologue executed inside
        # the fused Pallas kernel (ops/fused_conv.py) — recovers the
        # prologue/epilogue fusion that made XLA's conv win e2e while
        # keeping the 9-shift decomposition's higher MXU rate. The temb
        # projection folds into the second conv's B coefficient exactly
        # (no h+temb tensor is materialised). Dropout>0 in train mode
        # falls back: it sits between norm2 and conv2.
        itemsize = jnp.dtype(self.dtype or x.dtype).itemsize
        # Dropout sits between norm2 and conv2 only, so it gates fused2
        # alone; conv1 fuses regardless of train/eval mode (ADVICE r4).
        fused1 = fused_conv_wanted(
            x.shape, in_channels, self.out_channels, itemsize
        )
        fused2 = fused_conv_wanted(
            (x.shape[0], x.shape[1], x.shape[2], self.out_channels),
            self.out_channels, self.out_channels, itemsize,
        ) and (self.dropout == 0 or deterministic)

        s1 = self.param("norm1_scale", nn.initializers.ones, (in_channels,))
        b1 = self.param("norm1_bias", nn.initializers.zeros, (in_channels,))
        if fused1:
            a1, c1 = gn_affine_coeffs(
                x, s1, b1, self.norm_num_groups, self.norm_eps
            )
            h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv1")(
                x, prologue=(a1, c1)
            )
        else:
            h = group_norm(
                x, s1, b1, self.norm_num_groups, self.norm_eps, act="silu"
            )
            h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv1")(h)

        t = None
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            if not fused2:
                h = h + t[:, None, None, :].astype(h.dtype)

        s2 = self.param("norm2_scale", nn.initializers.ones, (self.out_channels,))
        b2 = self.param("norm2_bias", nn.initializers.zeros, (self.out_channels,))
        if fused2:
            a2, c2 = gn_affine_coeffs(
                h, s2, b2, self.norm_num_groups, self.norm_eps,
                shift=None if t is None else t.astype(jnp.float32),
            )
            h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv2")(
                h, prologue=(a2, c2)
            )
        else:
            h = group_norm(
                h, s2, b2, self.norm_num_groups, self.norm_eps, act="silu"
            )
            if self.dropout > 0:
                h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = Conv3x3(self.out_channels, dtype=self.dtype, name="conv2")(h)

        if in_channels != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(residual)
        return (residual + h) / self.output_scale_factor


class AttentionBlock2D(nn.Module):
    """Spatial self-attention over NHWC feature maps (diffusers
    `AttentionBlock`/VAE `Attention`): GroupNorm, qkv projections, residual."""

    num_head_channels: Optional[int] = None
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    rescale_output_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        num_heads = 1 if self.num_head_channels is None else c // self.num_head_channels
        head_dim = c // num_heads

        gs = self.param("group_norm_scale", nn.initializers.ones, (c,))
        gb = self.param("group_norm_bias", nn.initializers.zeros, (c,))
        hid = group_norm(x, gs, gb, self.norm_num_groups, self.norm_eps, act=None)
        hid = hid.reshape(n, h * w, c)

        q = nn.Dense(c, dtype=self.dtype, name="query")(hid)
        k = nn.Dense(c, dtype=self.dtype, name="key")(hid)
        v = nn.Dense(c, dtype=self.dtype, name="value")(hid)
        q = q.reshape(n, h * w, num_heads, head_dim)
        k = k.reshape(n, h * w, num_heads, head_dim)
        v = v.reshape(n, h * w, num_heads, head_dim)
        out = attention(q, k, v, scale=head_dim**-0.5)
        out = out.reshape(n, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj_attn")(out)
        out = out.reshape(n, h, w, c)
        return (x + out) / self.rescale_output_factor


class Downsample2D(nn.Module):
    """3x3 stride-2 conv; `padding=0` uses DDPM's asymmetric (0,1,0,1) pad."""

    out_channels: int
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.padding == 0:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = "VALID"
        else:
            pad = [(self.padding, self.padding)] * 2
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=pad, dtype=self.dtype, name="conv"
        )(x)


def upsample_nearest(x: Array, h_out: int, w_out: int) -> Array:
    """Nearest upsample to (h_out, w_out): integer scale factors use the
    partitionable broadcast+reshape form (see `upsample2x_nearest`);
    non-integer factors fall back to `jax.image.resize` (only reachable at
    degenerate test sizes — every production shape is an exact 2x)."""
    n, h, w, c = x.shape
    if (h_out, w_out) == (h, w):
        return x
    if h_out % h == 0 and w_out % w == 0:
        kh, kw = h_out // h, w_out // w
        return jnp.broadcast_to(
            x[:, :, None, :, None, :], (n, h, kh, w, kw, c)
        ).reshape(n, h_out, w_out, c)
    return jax.image.resize(x, (n, h_out, w_out, c), method="nearest")


def upsample2x_nearest(x: Array) -> Array:
    """Exact-2x nearest upsample as broadcast+reshape, NOT jax.image.resize:
    resize lowers to a gather, which (a) GSPMD cannot partition along the
    gathered (H) dim — under spatial sharding it all-gathered the FULL
    activation at every up-stage (67 MB at the 256px VAE stage alone; r04
    HLO census) — and (b) has a scatter-add VJP, costly on TPU in every
    backward that crosses it (guidance VJPs, the BiSeNet trainer).
    Broadcast/reshape stays partitioned and transposes to a reduce.
    Values identical to nearest resize at integer 2x."""
    n, h, w, c = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (n, h, 2, w, 2, c)
    ).reshape(n, h * 2, w * 2, c)


class Upsample2D(nn.Module):
    """Nearest 2x upsample + 3x3 conv."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = upsample2x_nearest(x)
        return Conv3x3(self.out_channels, dtype=self.dtype, name="conv")(x)


class GroupNormLayer(nn.Module):
    """Parameterized fused group norm (+ optional activation)."""

    num_groups: int = 32
    eps: float = 1e-6
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        s = self.param("scale", nn.initializers.ones, (c,))
        b = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm(x, s, b, self.num_groups, self.eps, act=self.act)
