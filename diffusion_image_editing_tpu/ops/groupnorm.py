"""Fused GroupNorm(+SiLU) for NHWC tensors: jnp reference + Pallas TPU kernels.

The UNet/VAE hot path calls GroupNorm -> SiLU before almost every conv
(reference: diffusers' torch GroupNorm; here the TPU-native design fuses the
normalize+affine+activation into a single bandwidth-bound pass).

Exact GroupNorm needs two passes over the data: a stats pass (per (n, group)
mean/var) and an apply pass. The Pallas version tiles the spatial dimension,
accumulating partial sums across the sequential TPU grid, then applies
normalize+affine+SiLU tile-by-tile. Backward is recompute-based via
`jax.custom_vjp` over the jnp reference.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def group_norm_reference(
    x: Array,
    scale: Array,
    bias: Array,
    num_groups: int,
    eps: float = 1e-6,
    act: Optional[str] = "silu",
) -> Array:
    """NHWC group norm + optional activation, computed in fp32."""
    n, h, w, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(n, h * w, g, c // g)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xhat = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xhat.reshape(n, h, w, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    out = _activate(out, act)
    return out.astype(x.dtype)


def _activate(x: Array, act: Optional[str]) -> Array:
    if act is None:
        return x
    if act == "silu":
        return x * jax.nn.sigmoid(x)
    if act == "relu":
        return jnp.maximum(x, 0.0)
    if act == "gelu":
        return jax.nn.gelu(x)
    raise ValueError(f"Unknown activation {act!r}")


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _stats_kernel(x_ref, sum_ref, sq_ref):
    """Accumulate per-channel partial sums across spatial tiles.

    Grid: (N, num_tiles). x_ref: (1, tile, C). Outputs (1, 1, C) revisited
    across the sequential j dimension — init at j == 0, accumulate after.
    """
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    part_sum = jnp.sum(x, axis=0, keepdims=True)
    part_sq = jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(j == 0)
    def _():
        sum_ref[0] = part_sum
        sq_ref[0] = part_sq

    @pl.when(j > 0)
    def _():
        sum_ref[0] += part_sum
        sq_ref[0] += part_sq


def _apply_kernel(x_ref, mean_ref, rstd_ref, scale_ref, bias_ref, o_ref, *, act):
    """Normalize+affine+activate one spatial tile. mean/rstd are per-channel
    (group stats already broadcast to channels by the host function)."""
    x = x_ref[0].astype(jnp.float32)
    mean = mean_ref[0].astype(jnp.float32)
    rstd = rstd_ref[0].astype(jnp.float32)
    out = (x - mean) * rstd * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32
    )
    o_ref[0] = _activate(out, act).astype(o_ref.dtype)


def _single_block_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups, eps, act):
    """One image fully resident in VMEM: stats + normalize + affine + act in a
    single pass — one HBM read and one write (optimal for GN, which XLA
    implements as two passes).

    The channel->group reduction runs as a matmul against a group-assignment
    matrix (lane-aligned, MXU-friendly) because cpg = C/groups is rarely a
    multiple of 128 and Mosaic rejects the (m, g, cpg) reshape."""
    x = x_ref[0].astype(jnp.float32)  # (m, C)
    m, c = x.shape
    cpg = c // num_groups
    cols = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cpg
    grps = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    gmat = (cols == grps).astype(jnp.float32)  # (C, G)

    colsum = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    colsq = jnp.sum(x * x, axis=0, keepdims=True)
    count = m * cpg
    gmean = jnp.dot(colsum, gmat, preferred_element_type=jnp.float32) / count  # (1, G)
    gsq = jnp.dot(colsq, gmat, preferred_element_type=jnp.float32) / count
    grstd = jax.lax.rsqrt(gsq - gmean * gmean + eps)
    mean_c = jnp.dot(gmean, gmat.T, preferred_element_type=jnp.float32)  # (1, C)
    rstd_c = jnp.dot(grstd, gmat.T, preferred_element_type=jnp.float32)

    out = (x - mean_c) * rstd_c * scale_ref[...].astype(jnp.float32) + bias_ref[
        ...
    ].astype(jnp.float32)
    o_ref[0] = _activate(out, act).astype(o_ref.dtype)


# Whole-image VMEM budget for the single-pass kernel (fp32 working set ~4x).
_GN_SINGLE_BLOCK_BYTES = 4 * 1024 * 1024


def group_norm_single_block(
    x: Array,
    scale: Array,
    bias: Array,
    num_groups: int,
    eps: float = 1e-6,
    act: Optional[str] = "silu",
    interpret: bool = False,
) -> Array:
    n, h, w, c = x.shape
    m = h * w
    xr = x.reshape(n, m, c)
    out = pl.pallas_call(
        functools.partial(_single_block_kernel, num_groups=num_groups, eps=eps, act=act),
        grid=(n,),
        out_shape=jax.ShapeDtypeStruct((n, m, c), x.dtype),
        in_specs=[
            pl.BlockSpec((1, m, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, m, c), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(xr, scale, bias)
    return out.reshape(n, h, w, c)


def _pick_tile(m: int) -> int:
    for t in (512, 256, 128, 64, 32, 16, 8):
        if m % t == 0:
            return t
    return 0


def group_norm_pallas(
    x: Array,
    scale: Array,
    bias: Array,
    num_groups: int,
    eps: float = 1e-6,
    act: Optional[str] = "silu",
    interpret: bool = False,
) -> Array:
    n, h, w, c = x.shape
    g = num_groups
    m = h * w
    if c % g:
        return group_norm_reference(x, scale, bias, num_groups, eps, act)
    if m * c * x.dtype.itemsize <= _GN_SINGLE_BLOCK_BYTES:
        return group_norm_single_block(x, scale, bias, num_groups, eps, act, interpret)
    tile = _pick_tile(m)
    if tile == 0 or c % 128:
        return group_norm_reference(x, scale, bias, num_groups, eps, act)

    xr = x.reshape(n, m, c)
    grid = (n, m // tile)
    sums, sqs = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ),
        in_specs=[pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0))],
        out_specs=(
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        ),
        interpret=interpret,
    )(xr)

    # Finalize group stats on-device (tiny: (N, G)).
    cpg = c // g
    gsum = sums.reshape(n, g, cpg).sum(axis=-1)
    gsq = sqs.reshape(n, g, cpg).sum(axis=-1)
    count = m * cpg
    gmean = gsum / count
    gvar = gsq / count - gmean**2
    grstd = jax.lax.rsqrt(gvar + eps)
    mean_c = jnp.repeat(gmean, cpg, axis=-1).reshape(n, 1, c)
    rstd_c = jnp.repeat(grstd, cpg, axis=-1).reshape(n, 1, c)

    out = pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((n, m, c), x.dtype),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(xr, mean_c, rstd_c, scale, bias)
    return out.reshape(n, h, w, c)


def _supports_pallas(x: Array) -> bool:
    # Auto: OFF. XLA fuses GroupNorm+SiLU into the neighbouring convs, which
    # beats BOTH standalone kernels here (measured on v5e, SD-1.5 512px edit:
    # tiled two-pass kernel 83 vs 24 ms VAE decode; single-pass whole-image
    # kernel 12.2 vs 14.2 steps/s end-to-end). The kernels stay available via
    # DIE_TPU_PALLAS_GN=1 for future shapes/hardware.
    from .flags import pallas_enabled

    return bool(pallas_enabled("gn"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _group_norm(x, scale, bias, num_groups, eps, act, use_pallas):
    return _group_norm_fwd(x, scale, bias, num_groups, eps, act, use_pallas)[0]


def _group_norm_fwd(x, scale, bias, num_groups, eps, act, use_pallas):
    if use_pallas:
        out = group_norm_pallas(x, scale, bias, num_groups, eps, act)
    else:
        out = group_norm_reference(x, scale, bias, num_groups, eps, act)
    return out, (x, scale, bias)


def _group_norm_bwd(num_groups, eps, act, use_pallas, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: group_norm_reference(x_, s_, b_, num_groups, eps, act),
        x,
        scale,
        bias,
    )
    return vjp(g)


_group_norm.defvjp(_group_norm_fwd, _group_norm_bwd)


def group_norm(
    x: Array,
    scale: Array,
    bias: Array,
    num_groups: int = 32,
    eps: float = 1e-6,
    act: Optional[str] = "silu",
    use_pallas: Optional[bool] = None,
) -> Array:
    """Fused GroupNorm + activation over NHWC. Pallas on TPU, jnp elsewhere."""
    if use_pallas is None:
        use_pallas = _supports_pallas(x)
    return _group_norm(x, scale, bias, int(num_groups), float(eps), act, bool(use_pallas))
