"""Attention ops: jnp reference + Pallas TPU flash-attention kernel.

TPU-native replacement for the reference UNets' attention layers (the
reference relies on diffusers' torch attention; here the hot path is a
blockwise online-softmax Pallas kernel that keeps the score matrix in VMEM).

Layout convention: (B, S, H, D) — batch, sequence, heads, head_dim.

The differentiable path uses `jax.custom_vjp`: Pallas forward, backward by
recomputation with the jnp reference (guidance gradients flow through the VAE
decoder's attention, never through the UNet — see SURVEY.md §3.2 — so the
backward is off the hot loop).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -1e30


def attention_reference(
    q: Array,
    k: Array,
    v: Array,
    scale: Optional[float] = None,
    causal: bool = False,
) -> Array:
    """Exact softmax attention in jnp. (B, S, H, D) in/out."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if causal:
        s_q, s_k = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((s_q, s_k), dtype=bool))
        logits = jnp.where(mask, logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v)
    return out


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int):
    """One (batch*head, q-block) program: online-softmax over k blocks.

    q_ref: (1, block_q, D); k_ref/v_ref: (1, S, D) — the full K/V for this
    head resident in VMEM. Scaling is applied to q inside the kernel.
    """
    # Matmul inputs stay in the storage dtype (bf16 runs the MXU at full
    # rate); accumulation and softmax statistics are fp32.
    q = q_ref[0]
    s_k = k_ref.shape[1]
    block_q, d = q.shape
    num_kb = s_k // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        kb = k_ref[0, pl.ds(i * block_k, block_k), :]
        vb = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (block_q, block_k) fp32
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot(
            p.astype(vb.dtype), vb, preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_attention_fwd_impl(
    q: Array, k: Array, v: Array, scale: float, interpret: bool
) -> Array:
    b, s_q, h, d = q.shape
    s_k = k.shape[1]

    # Head-dim zero-padding is always safe (adds 0 to every logit); sequence
    # lengths must divide the block sizes exactly — zero-padded K rows would
    # corrupt the softmax — so non-dividing shapes fall back to the reference.
    import os

    d_pad = _round_up(d, 128)
    bq = int(os.environ.get("DIE_TPU_ATTN_BLOCK_Q", "256"))
    bk = int(os.environ.get("DIE_TPU_ATTN_BLOCK_K", "512"))
    block_q = min(bq, _round_up(s_q, 8))
    block_k = min(bk, s_k)
    if s_q % block_q or s_k % block_k:
        raise _FallbackToReference()

    if d_pad != d:
        pad = [(0, 0), (0, 0), (0, 0), (0, d_pad - d)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    # (B, S, H, D) -> (B*H, S, D)
    qh = q.transpose(0, 2, 1, 3).reshape(b * h, s_q, d_pad)
    kh = k.transpose(0, 2, 1, 3).reshape(b * h, s_k, d_pad)
    vh = v.transpose(0, 2, 1, 3).reshape(b * h, s_k, d_pad)

    grid = (b * h, s_q // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((b * h, s_q, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, s_k, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, s_k, d_pad), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qh, kh, vh)

    out = out.reshape(b, h, s_q, d_pad).transpose(0, 2, 1, 3)
    return out[..., :d]


class _FallbackToReference(Exception):
    pass


# K+V for one head must fit comfortably in VMEM (~16MB/core) next to the
# q/score/accumulator blocks; beyond this the Mosaic kernel spills and loses
# badly to XLA (measured: SD VAE decoder attention, 4096 tokens x 512 dim).
_KV_VMEM_BUDGET_BYTES = 6 * 1024 * 1024


def _pallas_profitable(s_k: int, d: int) -> bool:
    d_pad = _round_up(d, 128)
    return 2 * s_k * d_pad * 4 <= _KV_VMEM_BUDGET_BYTES


def _supports_pallas() -> bool:
    from .flags import supports_pallas

    return supports_pallas("attn")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention(q, k, v, scale, use_pallas):
    return _attention_fwd(q, k, v, scale, use_pallas)[0]


def _attention_fwd(q, k, v, scale, use_pallas):
    if use_pallas:
        try:
            out = _flash_attention_fwd_impl(q, k, v, scale, interpret=False)
        except _FallbackToReference:
            out = attention_reference(q, k, v, scale)
    else:
        out = attention_reference(q, k, v, scale)
    return out, (q, k, v)


def _attention_bwd(scale, use_pallas, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: attention_reference(q_, k_, v_, scale), q, k, v)
    return vjp(g)


_attention.defvjp(_attention_fwd, _attention_bwd)


def attention(
    q: Array,
    k: Array,
    v: Array,
    scale: Optional[float] = None,
    causal: bool = False,
    use_pallas: Optional[bool] = None,
) -> Array:
    """Multi-head attention, (B, S, H, D). Pallas flash kernel on TPU,
    exact jnp reference elsewhere (and for causal masks)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if causal:
        return attention_reference(q, k, v, scale, causal=True)
    if use_pallas is None:
        use_pallas = _supports_pallas() and _pallas_profitable(k.shape[1], q.shape[-1])
    return _attention(q, k, v, float(scale), bool(use_pallas))
