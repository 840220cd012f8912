"""Variational/vector-quantized autoencoders in Flax (SD's AutoencoderKL and
LDM's VQModel).

The reference uses these purely as the codec boundary: SD latents are
`0.18215 * vae.encode(x).latent_dist.mode()` and decode is the
gradient-carrying path of guidance (`src/diffusion_classes.py:27-41`); LDM
uses `vqvae.encode(x).latents` (pre-quantization) and quantizing decode
(`:55-70`). Same semantics here, NHWC and TPU-first; gradient flow is
caller-controlled (JAX), so the reference's `no_grad` flag disappears.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv import Conv3x3
from .layers import AttentionBlock2D, Downsample2D, GroupNormLayer, ResnetBlock2D, Upsample2D

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class AutoencoderConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    sample_size: int = 512
    scaling_factor: float = 0.18215
    double_z: bool = True  # KL: moments = 2*latent_channels
    # VQ-specific
    num_vq_embeddings: int = 8192
    vq_embed_dim: int = 3
    mid_attention: bool = True


SD_VAE = AutoencoderConfig()  # CompVis/stable-diffusion-v1-4 `vae`

LDM_CELEBAHQ_VQVAE = AutoencoderConfig(  # CompVis/ldm-celebahq-256 `vqvae`
    latent_channels=3,
    block_out_channels=(128, 256, 512),
    layers_per_block=2,
    sample_size=256,
    scaling_factor=1.0,
    double_z=False,
    num_vq_embeddings=8192,
    vq_embed_dim=3,
)

TINY_VAE = AutoencoderConfig(
    latent_channels=4,
    block_out_channels=(16, 32),
    layers_per_block=1,
    norm_num_groups=8,
    sample_size=32,
)


class Encoder(nn.Module):
    config: AutoencoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.config
        h = Conv3x3(cfg.block_out_channels[0], dtype=self.dtype, name="conv_in")(x)
        for i, out_ch in enumerate(cfg.block_out_channels):
            is_final = i == len(cfg.block_out_channels) - 1
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(
                    out_ch, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype,
                    name=f"down_{i}_resnet_{j}",
                )(h)
            if not is_final:
                h = Downsample2D(out_ch, padding=0, dtype=self.dtype, name=f"down_{i}_downsample")(h)
        c = cfg.block_out_channels[-1]
        h = ResnetBlock2D(c, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype, name="mid_resnet_0")(h)
        if cfg.mid_attention:
            h = AttentionBlock2D(None, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(c, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype, name="mid_resnet_1")(h)
        h = GroupNormLayer(cfg.norm_num_groups, cfg.norm_eps, act="silu", name="conv_norm_out")(h)
        out_c = cfg.latent_channels * (2 if cfg.double_z else 1)
        return Conv3x3(out_c, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    """Latent -> image decoder.

    `remat=True` checkpoints every block: the guidance VJP (decode sits inside
    the per-step `jax.grad`, `src/attr_functions.py:112-118`) then keeps only
    block-boundary activations live instead of every conv/norm intermediate —
    the fix for the batch>=2 512px guided-edit memory cliff on a 16GB chip.
    `nn.remat` preserves parameter paths, so the same params serve both modes.
    """

    config: AutoencoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array, remat: bool = False, shard_fn=None) -> Array:
        """`shard_fn` (optional `Array -> Array`, e.g. a spatial
        `with_sharding_constraint`) re-anchors the activation sharding after
        every stage: GSPMD propagation from the decoder's input/output alone
        loses the 'sp' partitioning at the middle resolutions (the 128/256-px
        stages all-gather to full replication; measured in the partitioned
        HLO of the 512px cfg x sp guided step, PARITY.md round 3). The
        constraint transposes to the VJP, so the guidance gradient stays
        sharded too. None (default) is a no-op."""
        cfg = self.config
        keep = shard_fn if shard_fn is not None else (lambda x: x)
        Res = nn.remat(ResnetBlock2D) if remat else ResnetBlock2D
        Attn = nn.remat(AttentionBlock2D) if remat else AttentionBlock2D
        reversed_out = list(reversed(cfg.block_out_channels))
        c = reversed_out[0]
        h = Conv3x3(c, dtype=self.dtype, name="conv_in")(z)
        h = Res(c, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype, name="mid_resnet_0")(h)
        if cfg.mid_attention:
            h = Attn(None, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype, name="mid_attn")(h)
        h = Res(c, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype, name="mid_resnet_1")(h)
        h = keep(h)
        for i, out_ch in enumerate(reversed_out):
            is_final = i == len(reversed_out) - 1
            for j in range(cfg.layers_per_block + 1):
                h = Res(
                    out_ch, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype,
                    name=f"up_{i}_resnet_{j}",
                )(h)
            if not is_final:
                h = Upsample2D(out_ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)
            h = keep(h)
        h = GroupNormLayer(cfg.norm_num_groups, cfg.norm_eps, act="silu", name="conv_norm_out")(h)
        return Conv3x3(cfg.out_channels, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """KL autoencoder. `encode` returns the distribution mode (deterministic,
    matching `latent_dist.mode()` at diffusion_classes.py:29); `decode` is
    differentiable end-to-end for guidance."""

    config: AutoencoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)
        moments_c = self.config.latent_channels * 2
        self.quant_conv = nn.Conv(moments_c, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), dtype=self.dtype)

    def encode_moments(self, x: Array) -> Tuple[Array, Array]:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x: Array) -> Array:
        mean, _ = self.encode_moments(x)
        return mean

    def encode_sample(self, x: Array, key: Array) -> Array:
        mean, logvar = self.encode_moments(x)
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape, mean.dtype)

    def decode(self, z: Array, remat: bool = False, shard_fn=None) -> Array:
        return self.decoder(self.post_quant_conv(z), remat=remat, shard_fn=shard_fn)

    def __call__(self, x: Array) -> Array:
        return self.decode(self.encode(x))


class VectorQuantizer(nn.Module):
    """Nearest-neighbour codebook quantizer with straight-through gradients."""

    num_embeddings: int
    embed_dim: int

    @nn.compact
    def __call__(self, z: Array) -> Array:
        codebook = self.param(
            "embedding",
            nn.initializers.uniform(scale=2.0 / self.num_embeddings),
            (self.num_embeddings, self.embed_dim),
        )
        flat = z.reshape(-1, self.embed_dim)
        # ||z - e||^2 = ||z||^2 - 2 z.e + ||e||^2 ; argmin over codebook
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * flat @ codebook.T
            + jnp.sum(codebook**2, axis=1)[None, :]
        )
        idx = jnp.argmin(d, axis=1)
        quantized = codebook[idx].reshape(z.shape)
        # straight-through estimator
        return z + jax.lax.stop_gradient(quantized - z)


class VQModel(nn.Module):
    """VQ autoencoder. `encode` returns pre-quantization latents and `decode`
    quantizes first — diffusers `VQModel` semantics, the codec contract of the
    reference's LDM wrapper (diffusion_classes.py:55-70)."""

    config: AutoencoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)
        self.quant_conv = nn.Conv(self.config.vq_embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), dtype=self.dtype)
        self.quantize = VectorQuantizer(
            self.config.num_vq_embeddings, self.config.vq_embed_dim
        )

    def encode(self, x: Array) -> Array:
        return self.quant_conv(self.encoder(x))

    def decode(
        self, h: Array, force_not_quantize: bool = False, remat: bool = False,
        shard_fn=None,
    ) -> Array:
        q = h if force_not_quantize else self.quantize(h)
        return self.decoder(self.post_quant_conv(q), remat=remat, shard_fn=shard_fn)

    def __call__(self, x: Array) -> Array:
        return self.decode(self.encode(x))
