"""Image resizing / normalization ops (device-side, NHWC).

Replaces the reference's torchvision `transforms.Resize` usages
(`src/models.py:90-95`, `src/mask_creator.py:50-55`) with `jax.image.resize`
wrappers, including the hard-threshold mask resize semantics."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def resize_bilinear(x: Array, height: int, width: int) -> Array:
    """NHWC bilinear resize (antialiasing off, matching torch default)."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, height, width, c), method="bilinear")


def resize_nearest(x: Array, height: int, width: int) -> Array:
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, height, width, c), method="nearest")


def resize_mask_hard(mask: Array, height: int, width: int) -> Array:
    """Bilinear resize then hard-threshold to {0,1}: only exactly-1 pixels
    survive (`src/mask_creator.py:50-55`: mask[mask<1]=0; mask[mask>1]=1)."""
    resized = resize_bilinear(mask.astype(jnp.float32), height, width)
    return jnp.where(resized >= 1.0, 1.0, 0.0).astype(mask.dtype)


def imagenet_normalize(x01: Array) -> Array:
    """Normalize a [0,1] NHWC image with ImageNet statistics
    (`src/models.py:94`)."""
    mean = jnp.asarray(IMAGENET_MEAN, x01.dtype)
    std = jnp.asarray(IMAGENET_STD, x01.dtype)
    return (x01 - mean) / std


def to_unit_range(x: Array) -> Array:
    """[-1,1] -> [0,1], clipped (`src/transforms.py:8-9`)."""
    return jnp.clip(x / 2 + 0.5, 0.0, 1.0)


def to_symmetric_range(x: Array) -> Array:
    """[0,1] -> [-1,1] (`src/transforms.py:44-45`)."""
    return x * 2 - 1
