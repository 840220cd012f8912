"""Morphological dilation/erosion, TPU-idiomatic.

The reference implements weighted morphology with an `nn.Unfold` patch trick
(`src/Morphology.py:47-84`) and uses `Dilation2d(1,1,7,soft_max=False)` for
mask growing (`src/mask_creator.py:15-17`). On TPU, flat (zero-weight)
morphology is exactly `lax.reduce_window` with a max/min reduction — the
compiler lowers it to fused VPU code — and the weighted/soft variants use
`lax.conv_general_dilated_patches`.

Layout: NHWC. 'same' padding matches the reference's `fixed_padding`
(asymmetric pad for even kernels).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _same_pads(kernel_size: int):
    pad_total = kernel_size - 1
    pad_beg = pad_total // 2
    return (pad_beg, pad_total - pad_beg)


def dilate(x: Array, kernel_size: int = 7) -> Array:
    """Flat grayscale/binary dilation over NHWC: window max."""
    pads = _same_pads(kernel_size)
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), pads, pads, (0, 0)),
    )


def erode(x: Array, kernel_size: int = 7) -> Array:
    """Flat erosion: window min."""
    pads = _same_pads(kernel_size)
    return jax.lax.reduce_window(
        x,
        jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).max,
        jax.lax.min,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), pads, pads, (0, 0)),
    )


def _patches(x: Array, kernel_size: int) -> Array:
    """Extract kxk patches of an NHWC tensor -> (N, H, W, C*k*k) with 'same'
    asymmetric padding, matching `fixed_padding` (Morphology.py:105-111)."""
    pads = _same_pads(kernel_size)
    return jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(kernel_size, kernel_size),
        window_strides=(1, 1),
        padding=(pads, pads),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def morphology2d(
    x: Array,
    weight: Optional[Array] = None,
    kernel_size: int = 5,
    op: str = "dilation2d",
    soft_max: bool = False,
    beta: float = 15.0,
) -> Array:
    """Weighted morphology with optional soft-max relaxation — full capability
    surface of the reference's `Morphology` module (in/out channels fold into
    the weight): out[n,h,w,o] = max_{k,c} (x_patch +/- w[o,c,k]).

    x: (N, H, W, C); weight: (O, C, k, k) or None (flat, zeros).
    """
    n, h, w, c = x.shape
    p = _patches(x, kernel_size)  # (N, H, W, C*k*k) — channel-major patches
    p = p.reshape(n, h, w, 1, c * kernel_size * kernel_size)
    if weight is None:
        weight = jnp.zeros((1, c, kernel_size, kernel_size), x.dtype)
    o = weight.shape[0]
    wf = weight.reshape(o, c * kernel_size * kernel_size)
    if op == "dilation2d":
        scores = p + wf[None, None, None, :, :]
    elif op == "erosion2d":
        scores = wf[None, None, None, :, :] - p
    else:
        raise ValueError(f"Unknown morphology op {op!r}")
    if soft_max:
        out = jax.nn.logsumexp(scores * beta, axis=-1) / beta
    else:
        out = jnp.max(scores, axis=-1)
    if op == "erosion2d":
        out = -out
    return out  # (N, H, W, O)


# ---------------------------------------------------------------------------
# Learnable morphology as a Flax layer (`src/Morphology.py:10-102` parity:
# trainable per-offset weights, soft-max relaxation option)
# ---------------------------------------------------------------------------

from flax import linen as nn  # noqa: E402


class Morphology2D(nn.Module):
    """Trainable morphological layer (zero-init weights == flat morphology)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 5
    soft_max: bool = True
    beta: float = 15.0
    op: str = "dilation2d"  # or "erosion2d"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        weight = self.param(
            "weight",
            nn.initializers.zeros,
            (self.out_channels, self.in_channels, self.kernel_size, self.kernel_size),
        )
        return morphology2d(
            x, weight, self.kernel_size, self.op, self.soft_max, self.beta
        )


class Dilation2D(Morphology2D):
    op: str = "dilation2d"


class Erosion2D(Morphology2D):
    op: str = "erosion2d"
