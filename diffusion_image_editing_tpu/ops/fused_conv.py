"""Fused GroupNorm(+temb)+SiLU -> 3x3 conv Pallas kernel (the dispatch
frontier left open by rounds 3-4).

Why this exists: the chip surveys (`scripts/conv_survey.py`, ops/conv.py
docstring) showed the 9-shifted-matmul decomposition reaches 60-96% of bf16
MXU peak on the UNet's H in {16,32,64} stages where XLA's direct conv sits
at 36-79% — yet shift9 LOSES end-to-end because XLA fuses the GroupNorm/
SiLU prologue and bias epilogue into its conv and the decomposition pays
that elementwise HBM traffic separately. The reference composes the same
prologue before almost every conv (torch GroupNorm+SiLU+Conv2d in every
ResnetBlock, `diffusers` UNet blocks used by /root/reference/src/models.py).

This kernel closes the gap by doing BOTH in one VMEM pass:

    silu(x * A + B)  ->  9 shifted matmuls, f32 accumulation  ->  + bias

where (A, B) are per-(batch, channel) affine coefficients that exactly
encode GroupNorm (and an optional per-(batch, channel) additive shift such
as the ResnetBlock's time-embedding projection):

    gn(x + t) * gamma + beta
      = x * (gamma * rstd) + ((t - mu) * gamma * rstd + beta)
      = x * A + B

`gn_affine_coeffs` computes (A, B) from per-(b, c) moments WITHOUT
materialising x + t (the shift folds into the moments analytically), so the
only HBM traffic outside the kernel is one cheap stats reduction — the same
two-pass structure XLA's fused GN+conv uses.

Backward is exact and hand-written (no full-conv forward recompute):
 - d_act via the transpose conv (flip-HW, swap-IO kernel — stride-1
   same-pad 3x3 self-transpose, same identity the int8 dgrad uses),
 - the SiLU/affine chain re-derived from a cheap elementwise recompute,
 - dw as the 9-shift wgrad einsum, DCE'd by XLA when only x is
   differentiated (the guidance-VJP case).
The moment-path gradient of A/B w.r.t. x flows through `gn_affine_coeffs`
by ordinary autodiff OUTSIDE the custom_vjp boundary.

Dispatch: opt-in via DIE_TPU_FUSED_CONV=1 (trace-time, like every DIE_TPU_*
flag) until a full-workload A/B on the chip decides `auto` — standalone
wins have lost e2e three times in this repo (shift9, Pallas GN, int8 at
gates 32/64); only interleaved end-to-end measurements promote a path.

RESULT (v5e, 2026-08-19, census-verified interleaved e2e A/B,
`AB_CONV_VARIANTS=xla,fused scripts/ab_conv_dispatch.py`): **negative #4**.
On the 512px guided edit the fused kernel (43 of 82 convs through Pallas,
all H<=64 UNet stages) runs 72.85 ms/step vs XLA's 69.87 — a 4.3% e2e
LOSS despite the chip smoke test confirming every planned shape compiles
and matches reference numerics (f32 <=6e-7, bf16 <=5e-3,
scripts/smoke_fused_conv_chip.py). The mechanism is now measured three
ways: XLA's conv epilogue fusion also covers the residual-add and the
NEXT op's prologue, which a kernel-boundary conv can never capture.
`auto` therefore stays XLA on every shape; this kernel remains opt-in.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Trace-time census (see ops/conv.py TRACE_COUNTS for the rationale: flags
# are read when a program is TRACED; A/B harnesses assert on these).
TRACE_COUNTS = {"pallas": 0, "fallback": 0}

_VMEM_BUDGET = int(os.environ.get("DIE_TPU_FUSED_CONV_VMEM", 10 * 2**20))


def fused_conv_mode() -> str:
    v = os.environ.get("DIE_TPU_FUSED_CONV", "0").lower()
    if v not in ("0", "1"):
        raise ValueError(f"DIE_TPU_FUSED_CONV must be 0|1, got {v}")
    return v


def gn_affine_coeffs(
    x: Array,
    scale: Array,
    bias: Array,
    num_groups: int,
    eps: float = 1e-6,
    shift: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Per-(batch, channel) (A, B) with silu-input == (x * A + B) equal to
    GroupNorm(x + shift) * scale + bias. f32 throughout; `shift` is
    (batch, C) (e.g. the ResnetBlock temb projection) and folds into the
    group moments analytically — x + shift is never materialised."""
    n, h, w, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32)
    # Two-pass moments (E[(x-mean)^2], the `group_norm` reference form), NOT
    # E[x^2]-E[x]^2 which cancels catastrophically for large-mean
    # activations (ADVICE r4). The per-(b,c) shift folds in exactly via the
    # law of total variance over the group: a per-channel constant moves
    # that channel's mean but not its spatial variance, so
    #   var_g = mean_c(var_c + (mean_c + t_c - mu_g)^2).
    mean_bc = jnp.mean(xf, axis=(1, 2))  # (n, c)
    var_bc = jnp.mean(jnp.square(xf - mean_bc[:, None, None, :]), axis=(1, 2))
    if shift is not None:
        mean_bc = mean_bc + shift.astype(jnp.float32)
    mu_g = jnp.mean(mean_bc.reshape(n, g, c // g), axis=2)  # (n, g)
    dev = mean_bc.reshape(n, g, c // g) - mu_g[:, :, None]
    var_g = jnp.mean(var_bc.reshape(n, g, c // g) + jnp.square(dev), axis=2)
    rstd = jax.lax.rsqrt(var_g + eps)  # (n, g)
    rstd_bc = jnp.repeat(rstd, c // g, axis=1)  # (n, c)
    mu_bc = jnp.repeat(mu_g, c // g, axis=1)
    a = scale.astype(jnp.float32)[None, :] * rstd_bc
    t_bc = 0.0 if shift is None else shift.astype(jnp.float32)
    b = bias.astype(jnp.float32)[None, :] + (t_bc - mu_bc) * a
    return a, b


# --------------------------------------------------------------------------
# Pallas kernel
# --------------------------------------------------------------------------


def _pick_tile(c: int, cap: int) -> int:
    # Lane-tiling alignment (ADVICE r4): a channel tile that only PARTIALLY
    # covers its dimension must be a multiple of 128 (Mosaic's lane width)
    # or compilation/padding breaks on the real chip — interpret-mode tests
    # can't catch it. The full dimension is always a legal (padded) block.
    if c <= cap:
        return c
    for t in (512, 384, 256, 128):
        if t <= cap and c % t == 0:
            return t
    return c  # over-cap full dim; the VMEM check in _plan decides


def _plan(shape, cin, cout, esize) -> Optional[Tuple[int, int]]:
    """(ct_in, ct_out) fitting the VMEM budget, or None -> fallback.

    Budget counts Mosaic's input double-buffering (2x per in block), the
    f32 prologue intermediates, the f32 accumulator scratch and the out
    block. Rows (h*w) must be sublane-friendly and small enough that the
    full-spatial accumulator fits — H in {8..64} covers every UNet body
    stage and the 64px VAE stage. The h > 64 rejection also guarantees
    disjointness from the int8_large window at its default/measured gate
    (H >= 128, ops/conv.py) — no shape sees both dispatchers; A/B sweeps
    that lower DIE_TPU_INT8_MIN_H below 64 must not also set
    DIE_TPU_FUSED_CONV=1 (the fused prologue path bypasses conv3x3()
    entirely, so int8 would silently never fire on those shapes)."""
    b, h, w, c = shape
    if h < 4 or w < 4 or h > 64 or w > 64 or (h * w) % 8 != 0:
        return None
    rows = h * w
    for ct_out in (_pick_tile(cout, 512), _pick_tile(cout, 256),
                   _pick_tile(cout, 128)):
        for ct_in in (_pick_tile(cin, 512), _pick_tile(cin, 256),
                      _pick_tile(cin, 128)):
            xblk = (h + 2) * (w + 2) * ct_in * esize
            pre = (h + 2) * (w + 2) * ct_in * 4  # f32 prologue
            act = (h + 2) * (w + 2) * ct_in * esize
            acc = rows * ct_out * 4
            wblk = 9 * ct_in * ct_out * esize
            oblk = rows * ct_out * esize
            tot = 2 * (xblk + wblk) + pre + act + acc + 2 * oblk
            if tot <= _VMEM_BUDGET:
                return ct_in, ct_out
    return None


def _fused_kernel(xp_ref, a_ref, b_ref, w_ref, bias_ref, o_ref, acc_ref,
                  *, h: int, wd: int, n_ci: int, mxu_dtype):
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xf = xp_ref[0].astype(jnp.float32)  # (h+2, wd+2, ct_in)
    a = a_ref[...].astype(jnp.float32).reshape(1, 1, -1)
    b = b_ref[...].astype(jnp.float32).reshape(1, 1, -1)
    pre = xf * a + b
    act = pre * jax.nn.sigmoid(pre)
    # Conv zero-pads AFTER the activation: silu(0*A + B) != 0, so the halo
    # written by the host-side jnp.pad must be masked back to zero here.
    row = jax.lax.broadcasted_iota(jnp.int32, pre.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, pre.shape, 1)
    inside = (row >= 1) & (row <= h) & (col >= 1) & (col <= wd)
    act = jnp.where(inside, act, 0.0).astype(mxu_dtype)
    for dy in range(3):
        for dx in range(3):
            win = act[dy:dy + h, dx:dx + wd, :].reshape(h * wd, -1)
            acc_ref[...] += jnp.dot(
                win, w_ref[dy, dx], preferred_element_type=jnp.float32
            )

    @pl.when(ci == n_ci - 1)
    def _emit():
        out = acc_ref[...] + bias_ref[...].astype(jnp.float32).reshape(1, -1)
        o_ref[...] = out.reshape(1, h, wd, -1).astype(o_ref.dtype)


def _pallas_fwd(x: Array, a: Array, b: Array, w: Array, bias: Array,
                plan: Tuple[int, int], interpret: bool = False) -> Array:
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    ct_in, ct_out = plan
    n_ci, n_co = cin // ct_in, cout // ct_out
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # (n, 1, c) so each block's LAST TWO dims are (1 == full dim, ct):
    # Mosaic requires block minors divide (8, 128) or equal the array dim —
    # a (1, ct) block over (n, c) is illegal for n > 1 (chip-only failure,
    # caught by scripts/smoke_fused_conv_chip.py; interpret mode can't).
    a3 = a.reshape(n, 1, cin)
    b3 = b.reshape(n, 1, cin)
    bias2 = bias.reshape(1, cout)
    mxu_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    kernel = functools.partial(
        _fused_kernel, h=h, wd=wd, n_ci=n_ci, mxu_dtype=mxu_dtype
    )
    return pl.pallas_call(
        kernel,
        grid=(n, n_co, n_ci),
        in_specs=[
            pl.BlockSpec((1, h + 2, wd + 2, ct_in),
                         lambda bi, co, ci: (bi, 0, 0, ci)),
            pl.BlockSpec((1, 1, ct_in), lambda bi, co, ci: (bi, 0, ci)),
            pl.BlockSpec((1, 1, ct_in), lambda bi, co, ci: (bi, 0, ci)),
            pl.BlockSpec((3, 3, ct_in, ct_out),
                         lambda bi, co, ci: (0, 0, ci, co)),
            pl.BlockSpec((1, ct_out), lambda bi, co, ci: (0, co)),
        ],
        out_specs=pl.BlockSpec((1, h, wd, ct_out),
                               lambda bi, co, ci: (bi, 0, 0, co)),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((h * wd, ct_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, a3, b3, w.astype(mxu_dtype), bias2)


def _jnp_fwd(x: Array, a: Array, b: Array, w: Array, bias: Array) -> Array:
    """Reference semantics (also the fallback path): f32 prologue, conv in
    x.dtype — matches what the unfused group_norm+Conv3x3 pair computes."""
    pre = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    act = (pre * jax.nn.sigmoid(pre)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        act, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(y.dtype)


@jax.custom_vjp
def affine_silu_conv3x3(x: Array, a: Array, b: Array, w: Array,
                        bias: Array) -> Array:
    """conv3x3(silu(x*A + B), w) + bias with (A, B) per-(batch, channel).

    Forward dispatches to the fused Pallas kernel when DIE_TPU_FUSED_CONV=1,
    the backend is TPU and the shape plan fits VMEM; the jnp composition
    otherwise. Backward is the exact hand-written VJP either way."""
    return _dispatch_fwd(x, a, b, w, bias)


def _dispatch_fwd(x, a, b, w, bias):
    plan = _plan(x.shape, x.shape[-1], w.shape[-1],
                 jnp.dtype(x.dtype).itemsize)
    if (fused_conv_mode() == "1" and plan is not None
            and jax.default_backend() == "tpu"):
        TRACE_COUNTS["pallas"] += 1
        return _pallas_fwd(x, a, b, w, bias, plan)
    TRACE_COUNTS["fallback"] += 1
    return _jnp_fwd(x, a, b, w, bias)


def _fused_vjp_fwd(x, a, b, w, bias):
    return _dispatch_fwd(x, a, b, w, bias), (x, a, b, w)


def _fused_vjp_bwd(res, g):
    x, a, b, w = res
    xf = x.astype(jnp.float32)
    pre = xf * a[:, None, None, :] + b[:, None, None, :]
    sig = jax.nn.sigmoid(pre)
    act = (pre * sig).astype(x.dtype)
    # d_act: transpose conv of the cotangent against the flipped, IO-swapped
    # kernel (exact for stride-1 same-pad 3x3 — ops/conv.py int8 bwd note).
    wt = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3).astype(g.dtype)
    dact = jax.lax.conv_general_dilated(
        g, wt, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    dpre = dact.astype(jnp.float32) * (sig * (1.0 + pre * (1.0 - sig)))
    dx = (dpre * a[:, None, None, :]).astype(x.dtype)
    da = jnp.sum(dpre * xf, axis=(1, 2))
    db = jnp.sum(dpre, axis=(1, 2))
    # dw: 9-shift wgrad. XLA DCEs this when only x is differentiated (the
    # guidance-VJP case), exactly like the int8 path's exact dw.
    actp = jnp.pad(act, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, wd = x.shape[1], x.shape[2]
    dws = []
    for dy in range(3):
        row = []
        for dx_ in range(3):
            win = actp[:, dy:dy + h, dx_:dx_ + wd, :]
            row.append(jnp.einsum(
                "bhwi,bhwo->io", win, g,
                preferred_element_type=jnp.float32,
            ))
        dws.append(jnp.stack(row, axis=0))
    dw = jnp.stack(dws, axis=0).astype(w.dtype)
    dbias = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(g.dtype)
    return dx, da.astype(a.dtype), db.astype(b.dtype), dw, dbias


affine_silu_conv3x3.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def fused_conv_wanted(shape, cin: int, cout: int, itemsize: int) -> bool:
    """Trace-time gate for model code: flag on AND the shape has a plan.

    Callers still get exact numerics either way (the fallback is the same
    math) — this exists so model code can skip computing (A, B) when the
    unfused path would run anyway."""
    return fused_conv_mode() == "1" and _plan(shape, cin, cout,
                                              itemsize) is not None
