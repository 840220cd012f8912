"""Denoising loops as jitted `lax.scan` programs.

TPU-native redesign of the reference's Python-level hot loop
(`src/base_diffusion.py:49-97` + `src/diffusion_utils.py:55-133`): one traced
scan step = UNet forward (CFG as a batched-2 call) + schedule update; the whole
trajectory runs on-device with no host round-trips. Trajectory outputs
(model outputs / pred-x0s) come back as scan-stacked ys in HBM.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import schedule as S

Array = jax.Array
EpsFn = Callable[[Array, Array], Array]  # (x_t NHWC, t int32) -> eps


def make_eps_fn(apply_fn: Callable, params) -> EpsFn:
    """Unconditional denoiser: eps = unet(x, t)."""

    def eps_fn(x, t):
        return apply_fn(params, x, t)

    return eps_fn


def make_cfg_eps_fn(
    apply_fn: Callable,
    params,
    text_emb: Array,
    cfg_scale: float = 3.5,
) -> EpsFn:
    """Classifier-free-guidance denoiser.

    `text_emb` is [uncond; cond] stacked on the batch axis, (2, L, D) — the
    normalized ordering (the reference mixes [uncond,cond] and [cond,uncond]
    between `prep_text` and `ddim_inversion`; see SURVEY.md §3.3). The two
    UNet evaluations run as one batched-2 call to keep the MXU fed
    (`src/diffusion_utils.py:55-73` semantics).
    """

    def eps_fn(x, t):
        b = x.shape[0]
        latents = jnp.concatenate([x, x], axis=0)
        ctx = jnp.repeat(text_emb, b, axis=0)  # (2B, L, D) uncond-first
        eps = apply_fn(params, latents, t, ctx)
        eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
        return eps_uncond + cfg_scale * (eps_text - eps_uncond)

    return eps_fn


class Trajectory(NamedTuple):
    """Final latent plus optional per-step traces (stacked on axis 0)."""

    x0: Array
    xts: Optional[Array] = None
    model_outputs: Optional[Array] = None
    pred_original_samples: Optional[Array] = None


def generate(
    sched: S.Schedule,
    eps_fn: EpsFn,
    xt: Array,
    eta: float = 0.0,
    zs: Optional[Array] = None,
    num_steps: Optional[int] = None,
    step_rule: str = "ddim",
    collect: bool = False,
) -> Trajectory:
    """Run the denoising loop x_T -> x_0.

    Mirrors `Diffusion.generate_image` (`src/base_diffusion.py:49-97`): when
    `zs` is shorter than the schedule (or `num_steps` is given), only the
    last `len(zs)` timesteps run — the `diffusion_loop` truncation semantics
    (`src/diffusion_utils.py:112-133`).

    zs: (S', B, H, W, C) per-step variance noise, required when eta > 0.
    """
    if eta > 0 and zs is None:
        raise ValueError("eta > 0 requires zs")
    n = num_steps if num_steps is not None else (
        zs.shape[0] if zs is not None else sched.num_inference_steps
    )
    timesteps = sched.timesteps[-n:]
    if zs is None:
        zs_in = jnp.zeros((n,) + xt.shape, xt.dtype)
    else:
        zs_in = zs[-n:]
    step = S.ddim_step if step_rule == "ddim" else S.reverse_step

    def body(x, inputs):
        t, z = inputs
        eps = eps_fn(x, t)
        x_new, px0 = step(sched, x, eps, t, eta=eta, noise=z if eta > 0 else None)
        ys = (x_new, eps, px0) if collect else None
        return x_new, ys

    x_final, ys = jax.lax.scan(body, xt, (timesteps, zs_in))
    if collect:
        return Trajectory(x_final, xts=ys[0], model_outputs=ys[1], pred_original_samples=ys[2])
    return Trajectory(x_final)
