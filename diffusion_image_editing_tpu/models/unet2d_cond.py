"""Text-conditional UNet (Stable Diffusion 1.x family) in Flax.

Architecture-compatible with the torch `UNet2DConditionModel` the reference
loads for SD (`src/models.py:46-50`), NHWC/TPU-first: the transformer blocks
run the Pallas flash-attention kernel, GroupNorm+SiLU is fused, and CFG is a
batched-2 call at the engine level.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention
from ..ops.conv import Conv3x3
from .layers import (
    Downsample2D,
    GroupNormLayer,
    ResnetBlock2D,
    TimeEmbedding,
    Upsample2D,
    timestep_embedding,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class UNet2DConditionConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    layers_per_block: int = 2
    attention_head_dim: int = 8  # number of heads (diffusers naming quirk)
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


SD15_UNET = UNet2DConditionConfig()  # CompVis SD-1.4 / runwayml SD-1.5

TINY_SD_UNET = UNet2DConditionConfig(
    sample_size=8,
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    attention_head_dim=2,
    cross_attention_dim=32,
    norm_num_groups=8,
)


class CrossAttention(nn.Module):
    """Multi-head attention; cross when `context` given, self otherwise.
    QKV projections bias-free, out projection biased (diffusers Attention)."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None) -> Array:
        inner = self.num_heads * self.head_dim
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        b, s, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k = k.reshape(b, sk, self.num_heads, self.head_dim)
        v = v.reshape(b, sk, self.num_heads, self.head_dim)
        out = attention(q, k, v, scale=self.head_dim**-0.5)
        out = out.reshape(b, s, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out")(out)


class FeedForwardGEGLU(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        inner = self.dim * self.mult
        proj = nn.Dense(inner * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(h * nn.gelu(gate))


class BasicTransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        dim = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(self.num_heads, self.head_dim, self.dtype, name="attn1")(h)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(self.num_heads, self.head_dim, self.dtype, name="attn2")(
            h, context
        )
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = x + FeedForwardGEGLU(dim, dtype=self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    """GroupNorm -> 1x1 proj_in -> transformer block(s) -> 1x1 proj_out + res."""

    num_heads: int
    norm_num_groups: int = 32
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, context: Array) -> Array:
        n, h, w, c = x.shape
        head_dim = c // self.num_heads
        residual = x
        hid = GroupNormLayer(self.norm_num_groups, 1e-6, act=None, name="norm")(x)
        hid = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(hid)
        hid = hid.reshape(n, h * w, c)
        for d in range(self.depth):
            hid = BasicTransformerBlock(
                self.num_heads, head_dim, self.dtype, name=f"block_{d}"
            )(hid, context)
        hid = hid.reshape(n, h, w, c)
        hid = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(hid)
        return hid + residual


class UNet2DCondition(nn.Module):
    config: UNet2DConditionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: Array,
        timesteps: Array,
        context: Array,
        encoder_features=None,
        return_encoder_features: bool = False,
    ) -> Array:
        """sample: (B, H, W, C_lat); context: (B, L, cross_attention_dim).

        Encoder propagation (Faster Diffusion, arXiv 2312.09608 — retrieved
        in PAPERS.md): the down-path activations change little between
        adjacent denoising steps, so a cached `encoder_features` dict (from a
        `return_encoder_features=True` call at a key step) lets non-key steps
        skip conv_in + every down block and recompute only mid + up with the
        CURRENT timestep embedding — ~35-40%% of the per-step FLOPs. This is
        an APPROXIMATION (opt-in; `engine.denoise` key-step schedules);
        injecting features from the SAME (sample, t) reproduces the full
        forward exactly (tested)."""
        cfg = self.config
        heads = cfg.attention_head_dim
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        )
        temb = TimeEmbedding(cfg.time_embed_dim, dtype=self.dtype, name="time_embedding")(t_emb)
        context = context.astype(self.dtype)

        if encoder_features is not None:
            h = encoder_features["h"]
            skips = list(encoder_features["skips"])
            out_ch = cfg.block_out_channels[-1]
        else:
            h = Conv3x3(cfg.block_out_channels[0], dtype=self.dtype, name="conv_in")(
                sample.astype(self.dtype)
            )

            skips = [h]
            out_ch = cfg.block_out_channels[0]
            for i, block_type in enumerate(cfg.down_block_types):
                out_ch = cfg.block_out_channels[i]
                is_final = i == len(cfg.down_block_types) - 1
                with_xattn = block_type == "CrossAttnDownBlock2D"
                for j in range(cfg.layers_per_block):
                    h = ResnetBlock2D(
                        out_ch, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype,
                        name=f"down_{i}_resnet_{j}",
                    )(h, temb)
                    if with_xattn:
                        h = Transformer2D(
                            heads, cfg.norm_num_groups, dtype=self.dtype, name=f"down_{i}_attn_{j}"
                        )(h, context)
                    skips.append(h)
                if not is_final:
                    h = Downsample2D(out_ch, padding=1, dtype=self.dtype, name=f"down_{i}_downsample")(h)
                    skips.append(h)

        feats_out = {"h": h, "skips": tuple(skips)} if return_encoder_features else None

        h = ResnetBlock2D(
            out_ch, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype, name="mid_resnet_0"
        )(h, temb)
        h = Transformer2D(heads, cfg.norm_num_groups, dtype=self.dtype, name="mid_attn")(h, context)
        h = ResnetBlock2D(
            out_ch, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype, name="mid_resnet_1"
        )(h, temb)

        reversed_out = list(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = reversed_out[i]
            is_final = i == len(cfg.up_block_types) - 1
            with_xattn = block_type == "CrossAttnUpBlock2D"
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(
                    out_ch, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype,
                    name=f"up_{i}_resnet_{j}",
                )(h, temb)
                if with_xattn:
                    h = Transformer2D(
                        heads, cfg.norm_num_groups, dtype=self.dtype, name=f"up_{i}_attn_{j}"
                    )(h, context)
            if not is_final:
                h = Upsample2D(out_ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)

        h = GroupNormLayer(cfg.norm_num_groups, cfg.norm_eps, act="silu", name="conv_norm_out")(h)
        h = Conv3x3(cfg.out_channels, dtype=self.dtype, name="conv_out")(h)
        out = h.astype(jnp.float32)
        if return_encoder_features:
            return out, feats_out
        return out
