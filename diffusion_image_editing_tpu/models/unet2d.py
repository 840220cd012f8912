"""Unconditional UNet2D in Flax (DDPM / LDM denoiser).

Architecture-compatible with the torch `UNet2DModel` the reference drives via
diffusers (`src/models.py:22-44` loads google/ddpm-celebahq-256 and
CompVis/ldm-celebahq-256), rebuilt NHWC/TPU-first with fused Pallas
GroupNorm+SiLU and flash attention. Configs are read from HF `config.json`
by `models/port.py` at weight-port time.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import Conv3x3
from .layers import (
    AttentionBlock2D,
    Downsample2D,
    GroupNormLayer,
    ResnetBlock2D,
    TimeEmbedding,
    Upsample2D,
    timestep_embedding,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    sample_size: int = 256
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 128, 256, 256, 512, 512)
    down_block_types: Tuple[str, ...] = (
        "DownBlock2D",
        "DownBlock2D",
        "DownBlock2D",
        "DownBlock2D",
        "AttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "AttnUpBlock2D",
        "UpBlock2D",
        "UpBlock2D",
        "UpBlock2D",
        "UpBlock2D",
    )
    layers_per_block: int = 2
    attention_head_dim: Optional[int] = None  # None => single-head
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    downsample_padding: int = 0  # DDPM asymmetric padding
    flip_sin_to_cos: bool = False
    freq_shift: float = 1.0
    add_mid_attention: bool = True
    dropout: float = 0.0

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


# Small config for tests: full architecture shape, tiny channel counts.
TINY_UNET2D = UNet2DConfig(
    sample_size=16,
    block_out_channels=(32, 64),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=8,
)

DDPM_CELEBAHQ_256 = UNet2DConfig()  # google/ddpm-celebahq-256

LDM_CELEBAHQ_256_UNET = UNet2DConfig(  # CompVis/ldm-celebahq-256 `unet`
    sample_size=64,
    in_channels=3,
    out_channels=3,
    block_out_channels=(224, 448, 672, 896),
    down_block_types=(
        "DownBlock2D",
        "AttnDownBlock2D",
        "AttnDownBlock2D",
        "AttnDownBlock2D",
    ),
    up_block_types=(
        "AttnUpBlock2D",
        "AttnUpBlock2D",
        "AttnUpBlock2D",
        "UpBlock2D",
    ),
    layers_per_block=2,
    attention_head_dim=32,
    downsample_padding=1,
    flip_sin_to_cos=True,
    freq_shift=0.0,
)


class UNet2D(nn.Module):
    config: UNet2DConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: Array,
        timesteps: Array,
        encoder_features=None,
        return_encoder_features: bool = False,
    ) -> Array:
        """sample: (B, H, W, C_in) NHWC; timesteps: () or (B,) int32.

        `encoder_features` / `return_encoder_features`: encoder propagation
        (Faster Diffusion, arXiv 2312.09608) — see `UNet2DCondition` for the
        contract; opt-in, exact when features come from the same (x, t)."""
        cfg = self.config
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        )
        temb = TimeEmbedding(cfg.time_embed_dim, dtype=self.dtype, name="time_embedding")(
            t_emb
        )

        if encoder_features is not None:
            h = encoder_features["h"]
            skips = list(encoder_features["skips"])
            out_ch = cfg.block_out_channels[-1]
        else:
            h = Conv3x3(
                cfg.block_out_channels[0], dtype=self.dtype, name="conv_in"
            )(sample.astype(self.dtype))

            # --- down path ---
            skips = [h]
            out_ch = cfg.block_out_channels[0]
            for i, block_type in enumerate(cfg.down_block_types):
                out_ch = cfg.block_out_channels[i]
                is_final = i == len(cfg.down_block_types) - 1
                with_attn = block_type == "AttnDownBlock2D"
                for j in range(cfg.layers_per_block):
                    h = ResnetBlock2D(
                        out_ch,
                        cfg.norm_num_groups,
                        cfg.norm_eps,
                        cfg.dropout,
                        dtype=self.dtype,
                        name=f"down_{i}_resnet_{j}",
                    )(h, temb)
                    if with_attn:
                        h = AttentionBlock2D(
                            cfg.attention_head_dim,
                            cfg.norm_num_groups,
                            cfg.norm_eps,
                            dtype=self.dtype,
                            name=f"down_{i}_attn_{j}",
                        )(h)
                    skips.append(h)
                if not is_final:
                    h = Downsample2D(
                        out_ch, cfg.downsample_padding, dtype=self.dtype, name=f"down_{i}_downsample"
                    )(h)
                    skips.append(h)

        feats_out = {"h": h, "skips": tuple(skips)} if return_encoder_features else None

        # --- mid ---
        h = ResnetBlock2D(
            out_ch, cfg.norm_num_groups, cfg.norm_eps, cfg.dropout, dtype=self.dtype,
            name="mid_resnet_0",
        )(h, temb)
        if cfg.add_mid_attention:
            h = AttentionBlock2D(
                cfg.attention_head_dim, cfg.norm_num_groups, cfg.norm_eps,
                dtype=self.dtype, name="mid_attn",
            )(h)
        h = ResnetBlock2D(
            out_ch, cfg.norm_num_groups, cfg.norm_eps, cfg.dropout, dtype=self.dtype,
            name="mid_resnet_1",
        )(h, temb)

        # --- up path ---
        reversed_out = list(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = reversed_out[i]
            is_final = i == len(cfg.up_block_types) - 1
            with_attn = block_type == "AttnUpBlock2D"
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(
                    out_ch,
                    cfg.norm_num_groups,
                    cfg.norm_eps,
                    cfg.dropout,
                    dtype=self.dtype,
                    name=f"up_{i}_resnet_{j}",
                )(h, temb)
                if with_attn:
                    h = AttentionBlock2D(
                        cfg.attention_head_dim,
                        cfg.norm_num_groups,
                        cfg.norm_eps,
                        dtype=self.dtype,
                        name=f"up_{i}_attn_{j}",
                    )(h)
            if not is_final:
                h = Upsample2D(out_ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)

        h = GroupNormLayer(cfg.norm_num_groups, cfg.norm_eps, act="silu", name="conv_norm_out")(h)
        h = Conv3x3(cfg.out_channels, dtype=self.dtype, name="conv_out")(h)
        out = h.astype(jnp.float32)
        if return_encoder_features:
            return out, feats_out
        return out
