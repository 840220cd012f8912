"""Attention ops: jnp reference + Pallas TPU flash-attention kernels.

TPU-native replacement for the reference UNets' attention layers (the
reference relies on diffusers' torch attention; here the hot path is a
blockwise online-softmax Pallas kernel).

Layout convention: (B, S, H, D) — batch, sequence, heads, head_dim.

Two forward kernel modes, picked by K/V size (measured A/B, PARITY.md):

* **resident** — K/V for one head fit in VMEM next to the q/score blocks:
  grid (B*H, q_blocks), online softmax as a `fori_loop` over K blocks inside
  the kernel. This is the fast path for every UNet attention (4096x128-pad
  bf16 K/V = 2 MB) — final round-2 dispatch A/B: 14.27 steps/s end-to-end
  with resident Pallas on the UNet attns + XLA on the decoder 4096x512,
  vs 11.29 with the streaming kernel on the decoder and 9.86 with XLA
  everywhere (PARITY.md).
* **streaming** — grid (B*H, q_blocks, k_blocks) with the K axis innermost
  and the online-softmax state (accumulator, running max/sum) in VMEM
  scratch persisting across K grid steps. K/V never need to fit in VMEM,
  which is what lets the SD VAE decoder's 4096-token x 512-dim attention
  (inside the per-step guidance VJP, SURVEY.md §3.2) run as a flash kernel
  without materialising the 4096x4096 score matrix in HBM.

Backward: `jax.custom_vjp` with two recompute-style Pallas kernels (the
standard flash-attention backward): the VJP forward also emits the per-row
log-sum-exp (the primal-only path skips it — it costs real bandwidth), and
the backward recomputes P = exp(S - lse) blockwise to form dQ (grid over K
blocks) and dK/dV (grid over Q blocks). Shapes whose sequence lengths don't
divide the block sizes (e.g. the 77-token CLIP cross-attention K) fall back
to the exact jnp reference in both directions.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -1e30
_LANES = 128
# Row statistics (lse, delta) are carried as (B*H, S, _STAT) so their Pallas
# blocks (1, block_q, _STAT) satisfy the TPU tiling rule: the last block dim
# must equal the array dim (8 here) or be a multiple of 128.
_STAT = 8
# K+V for one head must fit comfortably in VMEM (~16MB/core) next to the
# q/score/accumulator blocks for the resident kernel; beyond this the
# streaming kernel takes over. Tunable for A/B (DIE_TPU_ATTN_KV_BUDGET_MB).
def _kv_budget_bytes() -> int:
    return int(os.environ.get("DIE_TPU_ATTN_KV_BUDGET_MB", "6")) * 1024 * 1024


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


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class _Plan(NamedTuple):
    block_q: int
    block_k: int
    d_pad: int
    streaming: bool  # K/V too big for VMEM: K axis moves into the grid


def _plan(
    s_q: int,
    s_k: int,
    d: int,
    dtype_bytes: int = 4,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> Optional[_Plan]:
    """Choose kernel mode and block sizes; None when the shape can't use the
    kernels.

    Head-dim zero-padding is always safe (adds 0 to every logit); sequence
    lengths must divide the block sizes exactly — zero-padded K rows would
    corrupt the softmax — so non-dividing shapes use the jnp reference.
    """
    if block_q is None:
        block_q = int(os.environ.get("DIE_TPU_ATTN_BLOCK_Q", "256"))
    if block_k is None:
        block_k = int(os.environ.get("DIE_TPU_ATTN_BLOCK_K", "512"))
    block_q = min(block_q, _round_up(s_q, 8))
    block_k = min(block_k, s_k)
    if s_q % block_q or s_k % block_k or block_k % _LANES:
        return None
    d_pad = _round_up(d, _LANES)
    streaming = 2 * s_k * d_pad * dtype_bytes > _kv_budget_bytes()
    if streaming and not _streaming_enabled():
        return None  # over-budget K/V -> exact jnp reference (XLA)
    return _Plan(block_q, block_k, d_pad, streaming)


def _streaming_enabled() -> bool:
    """DIE_TPU_ATTN_STREAMING gates the streaming kernel for shapes whose K/V
    exceed the VMEM budget (the SD VAE decoder's 4096x512 attention). Default
    off: the measured-fast dispatch on the 512px guided edit sends that shape
    to XLA (headline A/B in PARITY.md); the kernel remains available for
    memory-bound workloads where materialising the S^2 score matrix in HBM is
    the binding constraint."""
    return os.environ.get("DIE_TPU_ATTN_STREAMING", "0").lower() in (
        "1",
        "true",
        "yes",
        "on",
    )


def _split_heads(x: Array, d_pad: int) -> Array:
    """(B, S, H, D) -> (B*H, S, D_pad)."""
    b, s, h, d = x.shape
    if d_pad != d:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, d_pad - d)])
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d_pad)


def _merge_heads(x: Array, b: int, h: int, d: int) -> Array:
    """(B*H, S, D_pad) -> (B, S, H, D)."""
    bh, s, d_pad = x.shape
    x = x.reshape(b, h, s, d_pad).transpose(0, 2, 1, 3)
    return x[..., :d]


# ---------------------------------------------------------------------------
# Resident forward kernel: grid (B*H, n_q); K/V whole in VMEM, fori_loop.
# ---------------------------------------------------------------------------


def _resident_kernel(q_ref, k_ref, v_ref, o_ref, *maybe_lse, scale, block_k):
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
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    if maybe_lse:
        lse = m + jnp.log(l)  # (block_q, 1)
        maybe_lse[0][0] = jnp.broadcast_to(lse, (block_q, _STAT))


# ---------------------------------------------------------------------------
# Streaming forward kernel: grid (B*H, n_q, n_k), K innermost; VMEM scratch.
# ---------------------------------------------------------------------------


def _streaming_kernel(
    q_ref, k_ref, v_ref, o_ref, *rest, scale, with_lse
):
    if with_lse:
        lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        lse_ref, (acc_ref, m_ref, l_ref) = None, rest
    k_idx = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    s = (
        jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # (block_q, block_k) fp32

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot(
        p.astype(vb.dtype), vb, preferred_element_type=jnp.float32
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(k_idx == n_k - 1)
    def _finalize():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)
        if with_lse:
            lse = m_ref[:, :1] + jnp.log(l)  # (block_q, 1)
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _flash_fwd(
    q: Array,
    k: Array,
    v: Array,
    scale: float,
    plan: _Plan,
    interpret: bool,
    with_lse: bool,
):
    """Returns (out BSHD, out_heads (B*H,S,Dp), lse or None)."""
    b, s_q, h, d = q.shape
    s_k = k.shape[1]
    block_q, block_k, d_pad, streaming = plan

    qh = _split_heads(q, d_pad)
    kh = _split_heads(k, d_pad)
    vh = _split_heads(v, d_pad)
    bh = b * h

    out_shape = [jax.ShapeDtypeStruct((bh, s_q, d_pad), q.dtype)]
    if with_lse:
        out_shape.append(jax.ShapeDtypeStruct((bh, s_q, _STAT), jnp.float32))
    o_spec = pl.BlockSpec((1, block_q, d_pad), lambda i, j, *_: (i, j, 0))
    lse_spec = pl.BlockSpec((1, block_q, _STAT), lambda i, j, *_: (i, j, 0))
    out_specs = [o_spec, lse_spec][: len(out_shape)]

    # Measurement note: STANDALONE single-program microbenches of the no-lse
    # resident variant through the axon relay report wildly pathological
    # per-call times (20 ms - 40 s for a 2.7 ms kernel) while the with-lse
    # variant measures normally. End-to-end the truth is the opposite: the
    # primal-only no-lse path is ~20% faster on the full guided edit (14.1 vs
    # 11.3 steps/s). Trust full-workload A/Bs only (CLAUDE.md rule 2).
    if not streaming:
        res = pl.pallas_call(
            functools.partial(_resident_kernel, scale=scale, block_k=block_k),
            out_shape=tuple(out_shape) if with_lse else out_shape[0],
            grid=(bh, s_q // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0)),
                pl.BlockSpec((1, s_k, d_pad), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, s_k, d_pad), lambda i, j: (i, 0, 0)),
            ],
            out_specs=tuple(out_specs) if with_lse else out_specs[0],
            interpret=interpret,
        )(qh, kh, vh)
    else:
        res = pl.pallas_call(
            functools.partial(_streaming_kernel, scale=scale, with_lse=with_lse),
            out_shape=tuple(out_shape) if with_lse else out_shape[0],
            grid=(bh, s_q // block_q, s_k // block_k),
            in_specs=[
                pl.BlockSpec((1, block_q, d_pad), lambda i, j, kk: (i, j, 0)),
                pl.BlockSpec((1, block_k, d_pad), lambda i, j, kk: (i, kk, 0)),
                pl.BlockSpec((1, block_k, d_pad), lambda i, j, kk: (i, kk, 0)),
            ],
            out_specs=tuple(out_specs) if with_lse else out_specs[0],
            scratch_shapes=[
                pltpu.VMEM((block_q, d_pad), jnp.float32),
                pltpu.VMEM((block_q, _LANES), jnp.float32),
                pltpu.VMEM((block_q, _LANES), jnp.float32),
            ],
            interpret=interpret,
        )(qh, kh, vh)

    if with_lse:
        out_h, lse = res
    else:
        out_h, lse = res, None
    return _merge_heads(out_h, b, h, d), out_h, lse


# ---------------------------------------------------------------------------
# Backward kernels (recompute-style): dQ over K blocks; dK/dV over Q blocks.
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc, *, scale
):
    k_idx = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]  # (block_q, 1)
    delta = delta_ref[0][:, :1]

    s = (
        jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    p = jnp.exp(s - lse)  # (block_q, block_k)
    dp = jax.lax.dot_general(
        do, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    dq_acc[...] += (
        jax.lax.dot(ds.astype(kb.dtype), kb, preferred_element_type=jnp.float32)
        * scale
    )

    @pl.when(k_idx == n_k - 1)
    def _finalize():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale
):
    q_idx = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]

    s = (
        jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    p = jnp.exp(s - lse)  # (block_q, block_k)
    # dV += P^T @ dO
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    # dK += dS^T @ Q * scale
    dk_acc[...] += (
        jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )

    @pl.when(q_idx == n_q - 1)
    def _finalize():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd(
    q: Array,
    k: Array,
    v: Array,
    out_h: Array,
    lse: Array,
    g: Array,
    scale: float,
    plan: _Plan,
    interpret: bool,
):
    b, s_q, h, d = q.shape
    s_k = k.shape[1]
    block_q, block_k, d_pad, _ = plan
    bh = b * h

    qh = _split_heads(q, d_pad)
    kh = _split_heads(k, d_pad)
    vh = _split_heads(v, d_pad)
    doh = _split_heads(g, d_pad)
    # delta_i = sum_d dO_i * O_i (one fused elementwise pass; fp32), carried
    # broadcast over the _STAT lane to satisfy TPU block tiling.
    delta = jnp.sum(doh.astype(jnp.float32) * out_h.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None], delta.shape + (_STAT,))

    q_specs = [
        pl.BlockSpec((1, block_q, d_pad), lambda i, j, kk: (i, j, 0)),  # q
        pl.BlockSpec((1, block_k, d_pad), lambda i, j, kk: (i, kk, 0)),  # k
        pl.BlockSpec((1, block_k, d_pad), lambda i, j, kk: (i, kk, 0)),  # v
        pl.BlockSpec((1, block_q, d_pad), lambda i, j, kk: (i, j, 0)),  # do
        pl.BlockSpec((1, block_q, _STAT), lambda i, j, kk: (i, j, 0)),  # lse
        pl.BlockSpec((1, block_q, _STAT), lambda i, j, kk: (i, j, 0)),  # delta
    ]
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, s_q, d_pad), q.dtype),
        grid=(bh, s_q // block_q, s_k // block_k),
        in_specs=q_specs,
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j, kk: (i, j, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        interpret=interpret,
    )(qh, kh, vh, doh, lse, delta)

    kv_specs = [
        pl.BlockSpec((1, block_q, d_pad), lambda i, kk, j: (i, j, 0)),  # q
        pl.BlockSpec((1, block_k, d_pad), lambda i, kk, j: (i, kk, 0)),  # k
        pl.BlockSpec((1, block_k, d_pad), lambda i, kk, j: (i, kk, 0)),  # v
        pl.BlockSpec((1, block_q, d_pad), lambda i, kk, j: (i, j, 0)),  # do
        pl.BlockSpec((1, block_q, _STAT), lambda i, kk, j: (i, j, 0)),  # lse
        pl.BlockSpec((1, block_q, _STAT), lambda i, kk, j: (i, j, 0)),  # delta
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((bh, s_k, d_pad), k.dtype),
            jax.ShapeDtypeStruct((bh, s_k, d_pad), v.dtype),
        ),
        grid=(bh, s_k // block_k, s_q // block_q),
        in_specs=kv_specs,
        out_specs=(
            pl.BlockSpec((1, block_k, d_pad), lambda i, kk, j: (i, kk, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda i, kk, j: (i, kk, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d_pad), jnp.float32),
            pltpu.VMEM((block_k, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qh, kh, vh, doh, lse, delta)

    return (
        _merge_heads(dq, b, h, d),
        _merge_heads(dk, b, h, d),
        _merge_heads(dv, b, h, d),
    )


# ---------------------------------------------------------------------------
# Public differentiable entry point
# ---------------------------------------------------------------------------


class _FallbackToReference(Exception):
    pass


def _plan_for(q: Array, k: Array) -> Optional[_Plan]:
    return _plan(q.shape[1], k.shape[1], q.shape[-1], q.dtype.itemsize)


def _flash_attention_fwd_impl(
    q: Array,
    k: Array,
    v: Array,
    scale: float,
    interpret: bool,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> Array:
    """Forward-only kernel entry (kept for tests/benchmarks)."""
    plan = _plan(
        q.shape[1], k.shape[1], q.shape[-1], q.dtype.itemsize, block_q, block_k
    )
    if plan is None:
        raise _FallbackToReference()
    out, _, _ = _flash_fwd(q, k, v, scale, plan, interpret, with_lse=False)
    return out


def _supports_pallas() -> bool:
    from .flags import supports_pallas

    return supports_pallas("attn")


def _interpret_mode() -> bool:
    # Interpret-mode lets the kernels (and their VJP) run on CPU in tests.
    return os.environ.get("DIE_TPU_ATTN_INTERPRET", "0").lower() in (
        "1",
        "true",
        "yes",
        "on",
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention(q, k, v, scale, use_pallas):
    # Primal-only path: skip the lse output — it is only needed by the VJP
    # and costs real HBM writes on the (stop-gradient'd) UNet hot loop.
    plan = _plan_for(q, k) if use_pallas else None
    if plan is not None:
        out, _, _ = _flash_fwd(q, k, v, scale, plan, _interpret_mode(), with_lse=False)
        return out
    return attention_reference(q, k, v, scale)


def _pallas_bwd_enabled() -> bool:
    return os.environ.get("DIE_TPU_ATTN_PALLAS_BWD", "1").lower() in (
        "1",
        "true",
        "yes",
        "on",
    )


def _attention_fwd(q, k, v, scale, use_pallas):
    plan = _plan_for(q, k) if use_pallas else None
    if plan is not None:
        if _pallas_bwd_enabled():
            out, out_h, lse = _flash_fwd(
                q, k, v, scale, plan, _interpret_mode(), with_lse=True
            )
            return out, (q, k, v, out_h, lse)
        out, _, _ = _flash_fwd(q, k, v, scale, plan, _interpret_mode(), with_lse=False)
        return out, (q, k, v, None, None)
    return attention_reference(q, k, v, scale), (q, k, v, None, None)


def _attention_bwd(scale, use_pallas, res, g):
    q, k, v, out_h, lse = res
    plan = _plan_for(q, k) if use_pallas else None
    if plan is not None and out_h is not None:
        return _flash_bwd(q, k, v, out_h, lse, g, scale, plan, _interpret_mode())
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
    """Multi-head attention, (B, S, H, D). Pallas flash kernels on TPU
    (forward AND backward), exact jnp reference elsewhere (and for causal
    masks and block-ragged sequence lengths like the 77-token CLIP context)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if causal:
        return attention_reference(q, k, v, scale, causal=True)
    if use_pallas is None:
        use_pallas = _supports_pallas()
    use_pallas = bool(use_pallas) and _plan_for(q, k) is not None
    return _attention(q, k, v, float(scale), use_pallas)
