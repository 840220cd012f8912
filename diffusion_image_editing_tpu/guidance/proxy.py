"""Linear latent->RGB proxy codec for gradient guidance (opt-in accel).

The guided edit step's dominant cost is the guidance VJP through the full
VAE decoder — 49.5 of ~70 ms/step on the SD-1.5 512px edit (PARITY.md round
2 component breakdown; the reference backprops the same full decode,
`src/attr_functions.py:104-118`). But the guidance LOSSES are low-frequency
colour / region statistics of the decoded image, and SD-style latents are
famously well-approximated per-pixel by an affine map to RGB (the standard
"latent preview" trick used across the diffusion ecosystem). So: fit, once
per model, a least-squares affine map latent-pixel -> mean RGB of its
decoded patch, and run the guidance gradient through THAT instead of the
decoder. The proxy's VJP is a single tiny matmul — the decode VJP term
vanishes from the step entirely.

Strictly opt-in (`EditPipeline.edit_image(guidance_codec="proxy")`): the
gradient is an approximation of the full-decode gradient, exact only for an
affine decoder (pinned by test). The final output image is always produced
by the REAL decoder — the proxy only steers the nudges.

TPU notes: the fit is a 5x5 normal-equation solve (no lstsq on device); the
proxy's upsample back to image resolution is the gather-free
broadcast+reshape form (`models/layers.py::upsample_nearest` — CLAUDE.md
rule 9: `jax.image.resize` gathers don't partition and scatter-add in VJPs).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..models.layers import upsample_nearest

Array = jax.Array


class ProxyDecodeClosure(struct.PyTreeNode):
    """Affine latent->image codec: y = upsample_nearest(z @ w + b).

    A drop-in `DecodeFn` (same call signature as
    `engine.denoise.DecodeClosure`), so every guidance surface — masks at
    image resolution, background regularisers, NetAttrFunc's parsing net —
    works unchanged on top of it."""

    w: Array = None  # (C_latent, C_image)
    b: Array = None  # (C_image,)
    up: int = struct.field(pytree_node=False, default=1)

    def __call__(self, z: Array) -> Array:
        y = z @ self.w + self.b
        if self.up > 1:
            n, h, wd, c = y.shape
            y = upsample_nearest(y, h * self.up, wd * self.up)
        return y


@jax.jit
def _decode_batch(decode_fn, z: Array) -> Array:
    # decode_fn enters as a pytree ARGUMENT (CLAUDE.md rule 1: closing a
    # jitted fn over VAE params would bake them into the HLO as literals).
    return decode_fn(z)


def fit_decode_proxy(
    decode_fn,
    latent_shape: tuple,
    key: Optional[Array] = None,
    n: int = 8,
    latent_scale: float = 1.0,
    ridge: float = 1e-6,
) -> ProxyDecodeClosure:
    """Least-squares fit of the affine proxy against the real decoder.

    Decodes `n` random latents (one jitted batched call), average-pools each
    image to the latent grid (so region/colour means — what the guidance
    losses measure — are matched), and solves the ridge-regularised normal
    equations for the shared per-pixel affine map. Cost: one n-batch decode
    forward at setup; the solve is (C+1)x(C+1).

    latent_shape: (h, w, c) of ONE latent, in the units `decode_fn` takes
    (i.e. post-VAE-scaling — the closure divides internally).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    h, w, c = latent_shape
    z = jax.random.normal(key, (n, h, w, c), jnp.float32) * latent_scale
    imgs = _decode_batch(decode_fn, z)
    _, H, W, ci = imgs.shape
    if H % h or W % w:
        raise ValueError(f"decoded {H}x{W} not an integer multiple of latent {h}x{w}")
    up = H // h
    # mean RGB of each latent pixel's decoded patch
    tgt = imgs.reshape(n, h, up, w, W // w, ci).mean(axis=(2, 4))
    A = z.reshape(-1, c).astype(jnp.float32)
    A = jnp.concatenate([A, jnp.ones((A.shape[0], 1), jnp.float32)], axis=-1)
    B = tgt.reshape(-1, ci).astype(jnp.float32)
    G = A.T @ A + ridge * jnp.eye(c + 1, dtype=jnp.float32)
    sol = jnp.linalg.solve(G, A.T @ B)  # (c+1, ci)
    return ProxyDecodeClosure(w=sol[:c], b=sol[c], up=up)
