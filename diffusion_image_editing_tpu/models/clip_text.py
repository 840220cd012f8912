"""CLIP text encoder in Flax (SD's prompt conditioner).

The reference delegates to `transformers.CLIPTextModel`
(`src/diffusion_classes.py:22-23`, used via `encode_text`/`prep_text` at
`src/diffusion_utils.py:34-52,136-138`). Rebuilt from scratch: causal
pre-LayerNorm transformer returning the last hidden state. Tokenization is a
host-side concern (see `host/tokenizer.py`); the encoder consumes token ids.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"


CLIP_VIT_L_14_TEXT = CLIPTextConfig()  # SD-1.x text encoder

TINY_CLIP_TEXT = CLIPTextConfig(
    vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
    intermediate_size=64, max_position_embeddings=16,
)


def _act(x: Array, name: str) -> Array:
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return jax.nn.gelu(x)
    raise ValueError(f"Unknown activation {name!r}")


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.config
        d = cfg.hidden_size
        head_dim = d // cfg.num_heads
        b, s, _ = x.shape
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x).reshape(b, s, cfg.num_heads, head_dim)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x).reshape(b, s, cfg.num_heads, head_dim)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x).reshape(b, s, cfg.num_heads, head_dim)
        out = attention(q, k, v, scale=head_dim**-0.5, causal=True)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out.reshape(b, s, d))


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(cfg, self.dtype, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(h, cfg.hidden_act)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """Returns the final-LayerNorm'd last hidden state, (B, L, hidden) — the
    `text_encoder(input_ids)[0]` contract of `encode_text`
    (diffusion_utils.py:45-52)."""

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Array) -> Array:
        cfg = self.config
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding")(
            input_ids
        )
        positions = jnp.arange(input_ids.shape[1])[None]
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype,
            name="position_embedding",
        )(positions)
        h = tok + pos
        for i in range(cfg.num_layers):
            h = CLIPEncoderLayer(cfg, self.dtype, name=f"layer_{i}")(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(h)
        return h.astype(jnp.float32)
