"""LPIPS perceptual metric in Flax (VGG16 backbone).

The reference depends on the `lpips` pip package (`src/attr_functions.py:59-66`
uses LPIPS(net='vgg') both as guidance regulariser and metric; the wrapper in
`src/metrics.py:14-27` is broken by a self-shadowing import — fixed here by
construction). Implemented from scratch: VGG16 feature stack, per-channel
unit normalization, learned 1x1 linear heads, spatial mean, layer sum.
Weights port from torchvision VGG16 + lpips lin checkpoints via
`port_vgg16_lpips`; random-init falls back to a deterministic (untrained)
perceptual distance, still usable as a relative metric in tests.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

# torchvision VGG16 conv layout; M = maxpool
_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
# feature taps after the ReLU of these conv indices (relu1_2 ... relu5_3)
_TAP_AFTER_CONV = [1, 3, 6, 9, 12]
_TAP_CHANNELS = [64, 128, 256, 512, 512]

# lpips input scaling (Zhang et al. 2018 released constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv stack returning the five LPIPS feature taps."""

    width_mult: float = 1.0  # shrink for tests

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        taps = []
        conv_idx = 0
        for v in _VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                c = max(int(v * self.width_mult), 1)
                x = nn.Conv(c, (3, 3), padding=1, name=f"conv_{conv_idx}")(x)
                x = nn.relu(x)
                if conv_idx in _TAP_AFTER_CONV:
                    taps.append(x)
                conv_idx += 1
        return taps


class LPIPS(nn.Module):
    """lpips(a, b) for NHWC images in [-1, 1]; returns (B,) distances."""

    width_mult: float = 1.0
    use_lin: bool = True

    @nn.compact
    def __call__(self, a: Array, b: Array) -> Array:
        net = VGG16Features(self.width_mult, name="vgg")
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        fa = net((a - shift) / scale)
        fb = net((b - shift) / scale)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa * jax.lax.rsqrt(jnp.sum(xa**2, axis=-1, keepdims=True) + 1e-10)
            nb = xb * jax.lax.rsqrt(jnp.sum(xb**2, axis=-1, keepdims=True) + 1e-10)
            diff = (na - nb) ** 2
            if self.use_lin:
                w = self.param(
                    f"lin_{i}", nn.initializers.constant(1.0 / diff.shape[-1]),
                    (diff.shape[-1],),
                )
                val = jnp.sum(diff * jnp.abs(w), axis=-1)
            else:
                val = jnp.mean(diff, axis=-1)
            total = total + jnp.mean(val, axis=(1, 2))
        return total


def make_lpips_fn(params, width_mult: float = 1.0):
    """Returns lpips(a, b) -> (B,) closure usable as AttrFunc.metric_fn."""
    module = LPIPS(width_mult)

    def fn(a: Array, b: Array) -> Array:
        if a.ndim == 3:
            a = a[None]
        if b.ndim == 3:
            b = b[None]
        return module.apply(params, a, b)

    return fn


def port_vgg16_lpips(
    vgg_state_dict: Dict[str, np.ndarray],
    lpips_state_dict: Dict[str, np.ndarray] | None = None,
) -> Dict:
    """torchvision vgg16 `features.*` + lpips `lin{i}.model.1.weight` -> LPIPS
    params. (Weights not bundled; supply local files.)"""
    params: Dict = {"vgg": {}}
    # torchvision indices of conv layers inside features.*
    conv_positions = []
    pos = 0
    for v in _VGG16_CFG:
        if v == "M":
            pos += 1
        else:
            conv_positions.append(pos)
            pos += 2  # conv + relu
    for i, p in enumerate(conv_positions):
        w = np.asarray(vgg_state_dict[f"features.{p}.weight"])
        b = np.asarray(vgg_state_dict[f"features.{p}.bias"])
        params["vgg"][f"conv_{i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)), "bias": b,
        }
    if lpips_state_dict is not None:
        for i in range(5):
            w = np.asarray(lpips_state_dict[f"lin{i}.model.1.weight"])
            params[f"lin_{i}"] = w.reshape(-1)
    else:
        for i, c in enumerate(_TAP_CHANNELS):
            params[f"lin_{i}"] = np.full((c,), 1.0 / c, np.float32)
    return {"params": params}
