"""Measured-dispatch 3x3 convolution for the UNet / VAE hot path.

Round-3 per-shape survey on the v5e (`scripts/conv_survey.py`, N-sweep slope
methodology — see CLAUDE.md rule 2) showed XLA's `conv_general_dilated` is
well off MXU peak on the small-spatial shapes diffusion lives at, while the
classic "shift9" decomposition — 9 shifted (B*H*W, Cin) x (Cin, Cout)
matmuls accumulated in f32 — reaches 60-96% of bf16 peak there:

    shape                 rows    xla %peak   shift9 %peak
    unet64  (2,64,64,320)   8192      47.6        59.8
    unet32  (2,32,32,640)   2048      78.6        94.9
    unet16  (2,16,16,1280)   512      62.3        73.6
    unet16cat (..2560->1280) 512      54.8        84.8
    vae64   (1,64,64,512)   4096      71.0        95.6
    vae128  (1,128,128,512) 16384     75.0        95.1
    unet8   (2,8,8,1280)     128      35.7        29.8   <- xla
    vae256  (1,256,256,512) 65536     76.4        47.3   <- xla
    vae512  (1,512,512,128) 262144    43.5        11.5   <- xla

The crossover is spatial size: shift9 re-reads the padded input 9x, which is
free while the working set rides VMEM/caches but loses to XLA's direct conv
once the activation spills (>= 256x256).

**End-to-end, the standalone wins DO NOT transfer** (`scripts/
ab_conv_dispatch.py`, trace-census-verified, interleaved 4x50-step passes of
the full SD-1.5 512px guided edit, one process):

    xla everywhere            70.28 ms/step   (14.23 steps/s)
    shift9 on its win window  71.63           (-2%)
    shift9 everywhere        160.11           (-56%)

In the real graph XLA fuses the GroupNorm/SiLU/bias epilogues and residual
adds into its convs; the shift9 decomposition (pad + 9 slices + 9 matmuls)
breaks those fusions and pays the elementwise traffic separately, which eats
the MXU-rate gain. Same shape of result as the round-2 GroupNorm finding
(standalone Pallas GN won, fused XLA GN+conv won end-to-end). Dispatch is
therefore measured, not assumed:

    auto  ->  XLA conv on every shape (the end-to-end winner)

`DIE_TPU_CONV` env: "shift9" forces the decomposition (A/B harnesses),
"xla" is explicit, unset/"auto" uses the measured dispatch, "int8" forces
the quantized MXU conv everywhere (opt-in, lossy fwd; chip A/B: LOSES the
headline 10.38 vs 14.31 steps/s), "int8_large" gates int8 on
H >= DIE_TPU_INT8_MIN_H (default 128 — the measured e2e WINNER: +4.4%
headline, 14.90 vs 14.28 steps/s; see the crossover note below). The
int8 forward is approximate, so int8_large stays opt-in; `auto` is always
exact. NOTE the flags are read at TRACE time — set them before the program
first runs (TRACE_COUNTS lets harnesses verify).

`Conv3x3` is a drop-in for `flax.linen.Conv` on the 3x3 stride-1 case with
IDENTICAL parameter structure ('kernel' (3,3,Cin,Cout), 'bias' (Cout,)), so
checkpoint ports (`models/port.py`) are unaffected.

The decomposition is plain jnp, so jax.grad differentiates it: dgrad is 9
transposed matmuls (same structure, same efficiency class) and wgrad is 9
(Cin, rows) x (rows, Cout) matmuls — both exercised by the guidance VJP and
the seg trainer.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

# Standalone-survey win window for shift9 (rows = B*H*W). Kept for the
# "shift9" forced mode and future A/Bs; the measured AUTO dispatch is XLA
# everywhere (see module docstring — fusion beats raw MXU rate e2e).
_ROWS_MIN = 256
_ROWS_MAX = 32768

# Trace-time dispatch census. DIE_TPU_CONV is read when a program is TRACED,
# not when it runs — an A/B harness that flips the env var after tracing
# changes nothing. These counters increment at trace time so harnesses can
# assert which path each program actually captured (see
# scripts/ab_conv_dispatch.py, which was bitten by exactly this).
TRACE_COUNTS = {"shift9": 0, "xla": 0, "int8": 0}

# Chip-measured int8 crossover. STANDALONE (CONV_SURVEY_INT8_r04.log, slope
# method): the s8xs8->s32 conv beats XLA's bf16 conv on every surveyed shape
# with H >= 32 (92-104% of bf16 peak) and loses at H in {8, 16} where
# quantize/dequantize overhead swamps the small matmuls. END-TO-END
# (interleaved headline A/B sweep, v5e 2026-08-18): gates at 32 and 64 LOSE
# (85.2 / 76.4 ms/step vs xla 70.0 — epilogue-fusion loss on the UNet convs,
# the shift9 lesson again), but H>=128 — only the guidance decode's
# huge-spatial stages — WINS: 67.1 ms/step = 14.90 steps/s vs 14.28
# (+4.4%), stable across passes and confirmed at gate 256 (67.9). Default
# gate = the measured e2e winner; DIE_TPU_INT8_MIN_H overrides (trace-time,
# like DIE_TPU_CONV) for A/B sweeps. DIE_TPU_INT8_BWD=1 additionally
# quantizes the gated dgrad (the input cotangent of a 3x3 same-pad conv is
# itself one): 63.80 ms/step = 15.67 steps/s on the same A/B (+9.4% over
# exact, +5.5% over fwd-only int8), stable across passes.
_INT8_MIN_H_DEFAULT = 128


def _int8_min_h() -> int:
    return int(os.environ.get("DIE_TPU_INT8_MIN_H", _INT8_MIN_H_DEFAULT))


def snapshot_trace_counts() -> dict:
    """Census of every conv dispatch path traced so far — including the
    fused GN+SiLU prologue convs, which enter through Conv3x3(prologue=)
    and bypass conv3x3() (ADVICE r4: harnesses asserting on this dict
    alone would not see them)."""
    from . import fused_conv

    out = dict(TRACE_COUNTS)
    out["fused_pallas"] = fused_conv.TRACE_COUNTS["pallas"]
    out["fused_fallback"] = fused_conv.TRACE_COUNTS["fallback"]
    return out


def conv_mode() -> str:
    v = os.environ.get("DIE_TPU_CONV", "auto").lower()
    if v not in ("auto", "xla", "shift9", "int8", "int8_large"):
        raise ValueError(
            f"DIE_TPU_CONV must be auto|xla|shift9|int8|int8_large, got {v}"
        )
    return v


def _use_shift9(rows: int) -> bool:
    mode = conv_mode()
    if mode == "shift9":
        return True
    # auto == xla: the end-to-end A/B (module docstring) showed XLA's
    # epilogue fusion beats shift9's higher standalone MXU rate everywhere.
    return False


def conv3x3_shift9(x: Array, w: Array) -> Array:
    """3x3 stride-1 pad-1 conv as 9 shifted matmuls, f32 accumulation."""
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            window = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, wd, cin))
            m = window.reshape(b * h * wd, cin)
            part = jax.lax.dot(m, w[dy, dx], preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    return acc.reshape(b, h, wd, cout).astype(x.dtype)


def conv3x3_xla(x: Array, w: Array) -> Array:
    # no preferred_element_type: lax.conv's TRANSPOSE rule doesn't cast the
    # f32 cotangent back against bf16 operands (breaks the guidance VJP);
    # the MXU accumulates bf16 convs in f32 internally regardless, so the
    # numerics match what nn.Conv emitted. lax.dot's transpose handles the
    # mixed case, so shift9 keeps explicit f32 accumulation.
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _quantize_int8(v: Array, axes) -> tuple[Array, Array]:
    """Symmetric max-abs int8 quantization; returns (q, scale).

    `axes`: reduction axes for the scale (per-tensor for activations,
    per-output-channel for HWIO weights). Scale is kept f32; the zero
    tensor gets scale 1 so 0/0 never appears.
    """
    a = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=axes, keepdims=True)
    scale = jnp.where(a > 0, a / 127.0, 1.0)
    q = jnp.clip(jnp.round(v.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _conv3x3_int8_fwd(x: Array, w: Array) -> Array:
    """int8 MXU conv: s8 x s8 -> s32, dequantized to x.dtype.

    Dynamic per-tensor activation scale + per-Cout weight scale (the
    standard post-training symmetric scheme). v5e's MXU runs int8 at 2x
    the bf16 FLOP rate (394 vs 197 T/s), so on the conv-bound guided
    step this is the one lever left above the measured bf16 roofline.
    """
    xq, sx = _quantize_int8(x, axes=(0, 1, 2, 3))
    wq, sw = _quantize_int8(w, axes=(0, 1, 2))  # (1,1,1,Cout)
    yi = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = yi.astype(jnp.float32) * (sx.reshape(()) * sw.reshape(1, 1, 1, -1))
    return y.astype(x.dtype)


@jax.custom_vjp
def conv3x3_int8(x: Array, w: Array) -> Array:
    """int8 forward, straight-through bf16 backward.

    The backward is EXACTLY `conv3x3_xla`'s VJP at the unquantized
    operands (straight-through estimator): guidance VJPs and training
    see the same gradients as the bf16 path, only forwards quantize.
    """
    return _conv3x3_int8_fwd(x, w)


def _conv3x3_int8_vjp_fwd(x, w):
    return _conv3x3_int8_fwd(x, w), (x, w)


def _int8_bwd_enabled() -> bool:
    # Trace-time like the other DIE_TPU_* flags (the bwd traces when the
    # surrounding grad traces).
    return os.environ.get("DIE_TPU_INT8_BWD", "0") == "1"


def _conv3x3_int8_vjp_bwd(res, g):
    x, w = res
    if not _int8_bwd_enabled():
        _, vjp = jax.vjp(conv3x3_xla, x, w)
        return vjp(g)
    # DIE_TPU_INT8_BWD=1: quantize the dgrad too. The input-cotangent of a
    # 3x3 stride-1 same-pad conv is ITSELF such a conv — of the cotangent
    # against the spatially-flipped, IO-swapped kernel — so it runs on the
    # same s8xs8->s32 MXU path (per-tensor cotangent scale, per-Cin weight
    # scale). dw stays exact bf16: it matters for training, and XLA DCEs
    # it when only x is differentiated (the guidance VJP case).
    wt = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    gq, sg = _quantize_int8(g, axes=(0, 1, 2, 3))
    wq, sw = _quantize_int8(wt, axes=(0, 1, 2))
    yi = jax.lax.conv_general_dilated(
        gq, wq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    dx = (yi.astype(jnp.float32)
          * (sg.reshape(()) * sw.reshape(1, 1, 1, -1))).astype(x.dtype)
    _, vjp_w = jax.vjp(lambda w_: conv3x3_xla(x, w_), w)
    (dw,) = vjp_w(g)
    return dx, dw


conv3x3_int8.defvjp(_conv3x3_int8_vjp_fwd, _conv3x3_int8_vjp_bwd)


def conv3x3(x: Array, w: Array) -> Array:
    """Dispatched 3x3 stride-1 conv (NHWC x HWIO -> NHWC)."""
    mode = conv_mode()
    if mode == "int8" or (mode == "int8_large" and x.shape[1] >= _int8_min_h()):
        TRACE_COUNTS["int8"] += 1
        return conv3x3_int8(x, w)
    if _use_shift9(x.shape[0] * x.shape[1] * x.shape[2]):
        TRACE_COUNTS["shift9"] += 1
        return conv3x3_shift9(x, w)
    TRACE_COUNTS["xla"] += 1
    return conv3x3_xla(x, w)


class Conv3x3(nn.Module):
    """`nn.Conv(features, (3,3), padding=1)` drop-in with measured dispatch.

    Parameter names/shapes match `nn.Conv` exactly so `models/port.py` and
    existing checkpoints are oblivious to the swap.
    """

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, prologue=None) -> Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, self.features),
        )
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        if prologue is not None:
            # (A, B) per-(batch, channel) affine+SiLU prologue fused into
            # the conv (ops/fused_conv.py): one VMEM pass does
            # silu(x*A + B) -> 9 shifted matmuls -> +bias. Caller encodes
            # GroupNorm (+temb) into (A, B) via gn_affine_coeffs.
            from .fused_conv import affine_silu_conv3x3

            a_, b_ = prologue
            if self.use_bias:
                bias = self.param(
                    "bias", nn.initializers.zeros, (self.features,)
                )
            else:
                bias = jnp.zeros((self.features,), jnp.float32)
            return affine_silu_conv3x3(x, a_, b_, kernel.astype(dtype), bias)
        y = conv3x3(x, kernel.astype(dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y
