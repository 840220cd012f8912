"""Activated Batch Norm (ABN) suite — the TPU-native equivalent of the
reference's vendored InPlace-ABN CUDA extension.

The reference ships `mean_var`, fused `forward` (normalize+affine+activation),
`edz_eydz`, `backward`, and activation-inverting leaky-ReLU/ELU backward as
CUDA/C++ kernels with a pybind dispatch layer and an NCCL-synced variant
(`src/Segmentation/modules/src/*.cu`, `modules/functions.py:77-234` in
JohanLundberg12/diffusion-image-editing). Here the same op set is a functional
`jax.custom_vjp` with explicit two-phase backward math (the edz/eydz
reductions), Pallas TPU kernels on the hot path, and the Sync variant mapped
to `jax.lax.pmean` over a named mesh axis — the XLA-collective analogue of
`torch.distributed.all_reduce` at `modules/functions.py:168-176,215-220`.

In-place aliasing does not port (JAX is functional); what is kept is the math:
fp32-accumulated moments (mirroring the half/float split of
`inplace_abn_cuda_half.cu`), |gamma| affine, and the two-phase backward.

Layout: NHWC; stats are per-channel over (N, H, W) and, when `axis_name` is
given, over the mesh axis too.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _act_forward(y: Array, activation: str, slope: float) -> Array:
    if activation == "identity":
        return y
    if activation == "leaky_relu":
        return jnp.where(y >= 0, y, y * slope)
    if activation == "elu":
        return jnp.where(y >= 0, y, jnp.expm1(y))
    raise ValueError(f"Unknown activation {activation!r}")


def _act_grad_from_linear(y_lin: Array, activation: str, slope: float) -> Array:
    """d act / d y_lin, expressed from the pre-activation value."""
    if activation == "identity":
        return jnp.ones_like(y_lin)
    if activation == "leaky_relu":
        return jnp.where(y_lin >= 0, 1.0, slope)
    if activation == "elu":
        return jnp.where(y_lin >= 0, 1.0, jnp.exp(y_lin))
    raise ValueError(f"Unknown activation {activation!r}")


def invert_activation(y_act: Array, activation: str, slope: float) -> Array:
    """Recover the pre-activation value from the activated output — the
    "in-place" trick of the reference's `inplace_abn_cpu.cpp:85-119`, kept as
    a capability (and used by tests) even though the functional custom_vjp
    saves residuals instead."""
    if activation == "identity":
        return y_act
    if activation == "leaky_relu":
        return jnp.where(y_act >= 0, y_act, y_act / slope)
    if activation == "elu":
        return jnp.where(y_act >= 0, y_act, jnp.log1p(y_act))
    raise ValueError(f"Unknown activation {activation!r}")


def mean_var(x: Array, axis_name: Optional[str] = None) -> Tuple[Array, Array]:
    """Per-channel fp32 mean/variance over all leading dims of an (..., C)
    tensor; cross-device when `axis_name` names a mesh axis (the
    `InPlaceABNSync` reduction, NCCL -> lax.pmean)."""
    xf = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    mean = jnp.mean(xf, axis=0)
    sq = jnp.mean(xf * xf, axis=0)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        sq = jax.lax.pmean(sq, axis_name)
    var = sq - mean * mean
    return mean, var


def edz_eydz(
    xhat: Array, dz: Array, axis_name: Optional[str] = None
) -> Tuple[Array, Array]:
    """Second-phase backward reductions: edz = mean(dz), eydz = mean(xhat*dz)
    per channel (reference `edz_eydz_cuda`, synced at functions.py:215-220)."""
    c = dz.shape[-1]
    dzf = dz.astype(jnp.float32).reshape(-1, c)
    xhf = xhat.astype(jnp.float32).reshape(-1, c)
    edz = jnp.mean(dzf, axis=0)
    eydz = jnp.mean(xhf * dzf, axis=0)
    if axis_name is not None:
        edz = jax.lax.pmean(edz, axis_name)
        eydz = jax.lax.pmean(eydz, axis_name)
    return edz, eydz


# ---------------------------------------------------------------------------
# Pallas forward kernel: fused normalize + |gamma| affine + activation
# ---------------------------------------------------------------------------


def _abn_apply_kernel(x_ref, mean_ref, rstd_ref, w_ref, b_ref, o_ref, *, activation, slope):
    x = x_ref[0].astype(jnp.float32)
    y = (x - mean_ref[...].astype(jnp.float32)) * rstd_ref[...].astype(jnp.float32)
    y = y * jnp.abs(w_ref[...].astype(jnp.float32)) + b_ref[...].astype(jnp.float32)
    o_ref[0] = _act_forward(y, activation, slope).astype(o_ref.dtype)


def _pick_tile(m: int) -> int:
    for t in (1024, 512, 256, 128, 64, 32, 16, 8):
        if m % t == 0:
            return t
    return 0


def _abn_apply(
    x: Array,
    mean: Array,
    rstd: Array,
    weight: Array,
    bias: Array,
    activation: str,
    slope: float,
    use_pallas: bool,
    interpret: bool = False,
) -> Array:
    c = x.shape[-1]
    m = x.size // c
    tile = _pick_tile(m)
    if not use_pallas or tile == 0 or c % 128:
        xf = x.astype(jnp.float32)
        y = (xf - mean) * rstd * jnp.abs(weight) + bias
        return _act_forward(y, activation, slope).astype(x.dtype)

    xr = x.reshape(m, c)
    out = pl.pallas_call(
        functools.partial(_abn_apply_kernel, activation=activation, slope=slope),
        grid=(m // tile,),
        out_shape=jax.ShapeDtypeStruct((1, m, c), x.dtype),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i: (0, i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda i: (0, i, 0)),
        interpret=interpret,
    )(xr.reshape(1, m, c), mean, rstd, weight, bias)
    return out.reshape(x.shape)


def _supports_pallas() -> bool:
    from .flags import supports_pallas

    return supports_pallas("abn")


# ---------------------------------------------------------------------------
# custom_vjp: training-mode fused ABN with batch (optionally synced) stats
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_abn_train(x, weight, bias, eps, activation, slope, axis_name, use_pallas):
    mean, var = mean_var(x, axis_name)
    rstd = jax.lax.rsqrt(var + eps)
    return _abn_apply(x, mean, rstd, weight, bias, activation, slope, use_pallas)


def _fused_abn_fwd(x, weight, bias, eps, activation, slope, axis_name, use_pallas):
    mean, var = mean_var(x, axis_name)
    rstd = jax.lax.rsqrt(var + eps)
    y = _abn_apply(x, mean, rstd, weight, bias, activation, slope, use_pallas)
    xhat = ((x.astype(jnp.float32) - mean) * rstd).astype(x.dtype)
    return y, (xhat, weight, bias, rstd)


def _fused_abn_bwd(eps, activation, slope, axis_name, use_pallas, res, g):
    xhat, weight, bias, rstd = res
    wabs = jnp.abs(weight.astype(jnp.float32))
    y_lin = xhat.astype(jnp.float32) * wabs + bias.astype(jnp.float32)
    dz = g.astype(jnp.float32) * _act_grad_from_linear(y_lin, activation, slope)
    edz, eydz = edz_eydz(xhat, dz, axis_name)
    # dx = (dz - E[dz] - xhat * E[xhat dz]) * |gamma| * rstd   (training mode)
    dx = (dz - edz - xhat.astype(jnp.float32) * eydz) * wabs * rstd
    sum_axes = tuple(range(dz.ndim - 1))
    dweight = jnp.sign(weight.astype(jnp.float32)) * jnp.sum(
        xhat.astype(jnp.float32) * dz, axis=sum_axes
    )
    dbias = jnp.sum(dz, axis=sum_axes)
    if axis_name is not None:
        # Replicated params ⇒ their cotangent is the cross-device sum (the
        # reference's all-reduced dweight/dbias, functions.py:215-220).
        dweight = jax.lax.psum(dweight, axis_name)
        dbias = jax.lax.psum(dbias, axis_name)
    return dx.astype(xhat.dtype), dweight.astype(weight.dtype), dbias.astype(bias.dtype)


fused_abn_train.defvjp(_fused_abn_fwd, _fused_abn_bwd)


def fused_abn(
    x: Array,
    weight: Array,
    bias: Array,
    eps: float = 1e-5,
    activation: str = "leaky_relu",
    slope: float = 0.01,
    axis_name: Optional[str] = None,
    running_mean: Optional[Array] = None,
    running_var: Optional[Array] = None,
    training: bool = True,
    use_pallas: Optional[bool] = None,
    momentum: float = 0.1,
):
    """Fused activated batch norm.

    Training: batch stats (psum-synced over `axis_name` if given), custom-vjp
    two-phase backward; returns (y, new_running_mean, new_running_var).
    Eval: normalizes with the provided running stats; returns y only.
    """
    if use_pallas is None:
        use_pallas = _supports_pallas()
    if not training:
        if running_mean is None or running_var is None:
            raise ValueError("eval mode requires running stats")
        rstd = jax.lax.rsqrt(running_var.astype(jnp.float32) + eps)
        return _abn_apply(
            x, running_mean.astype(jnp.float32), rstd, weight, bias, activation, slope, use_pallas
        )

    y = fused_abn_train(x, weight, bias, float(eps), activation, float(slope), axis_name, bool(use_pallas))
    if running_mean is None:
        return y, None, None
    mean, var = mean_var(x, axis_name)
    count = x.size // x.shape[-1]
    if axis_name is not None:
        count = count * jax.lax.psum(1, axis_name)
    unbiased = var * count / jnp.maximum(count - 1, 1)
    new_mean = (1 - momentum) * running_mean + momentum * mean
    new_var = (1 - momentum) * running_var + momentum * unbiased
    return y, new_mean, new_var


# ---------------------------------------------------------------------------
# Flax module wrapper (the `ABN`/`InPlaceABN`/`InPlaceABNSync` nn.Module layer
# of the reference, `modules/bn.py:13-128`)
# ---------------------------------------------------------------------------

from flax import linen as nn  # noqa: E402


class FusedABNorm(nn.Module):
    """Fused activated batch norm as a Flax layer with running statistics.

    `axis_name` set => cross-device synced moments (InPlaceABNSync); unset =>
    per-device (InPlaceABN). `activation="identity"` + external relu matches
    the reference's shipped `nn.BatchNorm2d` path (`Segmentation/model.py:26`).
    """

    momentum: float = 0.1
    eps: float = 1e-5
    activation: str = "leaky_relu"
    slope: float = 0.01
    axis_name: str | None = None
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))

        if train:
            y, new_mean, new_var = fused_abn(
                x, weight, bias, eps=self.eps, activation=self.activation,
                slope=self.slope, axis_name=self.axis_name,
                running_mean=ra_mean.value, running_var=ra_var.value,
                training=True, use_pallas=self.use_pallas, momentum=self.momentum,
            )
            if not self.is_initializing():
                ra_mean.value = new_mean
                ra_var.value = new_var
            return y
        return fused_abn(
            x, weight, bias, eps=self.eps, activation=self.activation,
            slope=self.slope, running_mean=ra_mean.value, running_var=ra_var.value,
            training=False, use_pallas=self.use_pallas,
        )
