"""Denoising loops as jitted `lax.scan` programs.

TPU-native redesign of the reference's Python-level hot loop
(`src/base_diffusion.py:49-97` + `src/diffusion_utils.py:55-133`): one traced
scan step = UNet forward (CFG as a batched-2 call) + schedule update; the whole
trajectory runs on-device with no host round-trips. Trajectory outputs
(model outputs / pred-x0s) come back as scan-stacked ys in HBM.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..core import schedule as S

Array = jax.Array
EpsFn = Callable[[Array, Array], Array]  # (x_t NHWC, t int32) -> eps


class EpsClosure(struct.PyTreeNode):
    """Unconditional denoiser as a *pytree callable*: eps = unet(x, t).

    Being a pytree (params are leaves, apply_fn is static) it crosses
    jit/scan/vmap boundaries as an argument, so multi-GB weights are traced
    inputs rather than constants baked into the HLO — closing a plain Python
    closure over params would embed them as literals (multi-GB programs that
    crush the compiler)."""

    apply_fn: Callable = struct.field(pytree_node=False)
    params: Any = None

    def __call__(self, x: Array, t: Array) -> Array:
        return self.apply_fn(self.params, x, t)


class EpsFeatClosure(struct.PyTreeNode):
    """`EpsClosure` with encoder propagation (see `CfgEpsFeatClosure`)."""

    apply_fn: Callable = struct.field(pytree_node=False)
    params: Any = None

    def full(self, x: Array, t: Array):
        return self.apply_fn(self.params, x, t, return_encoder_features=True)

    def reuse(self, x: Array, t: Array, feats) -> Array:
        return self.apply_fn(self.params, x, t, encoder_features=feats)

    def __call__(self, x: Array, t: Array) -> Array:
        return self.apply_fn(self.params, x, t)


class CfgEpsClosure(struct.PyTreeNode):
    """Classifier-free-guidance denoiser (pytree callable).

    `text_emb` is [uncond; cond] stacked on the batch axis, (2, L, D) — the
    normalized ordering (the reference mixes [uncond,cond] and [cond,uncond]
    between `prep_text` and `ddim_inversion`; see SURVEY.md §3.3). The two
    UNet evaluations run as one batched-2 call to keep the MXU fed
    (`src/diffusion_utils.py:55-73` semantics)."""

    apply_fn: Callable = struct.field(pytree_node=False)
    params: Any = None
    text_emb: Array = None
    cfg_scale: Array = 3.5

    def __call__(self, x: Array, t: Array) -> Array:
        b = x.shape[0]
        latents = jnp.concatenate([x, x], axis=0)
        if jnp.ndim(t) == 1:  # per-sample timesteps: tile for the CFG pair
            t = jnp.concatenate([t, t], axis=0)
        ctx = jnp.repeat(self.text_emb, b, axis=0)  # (2B, L, D) uncond-first
        eps = self.apply_fn(self.params, latents, t, ctx)
        eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
        return eps_uncond + self.cfg_scale * (eps_text - eps_uncond)


class CfgEpsFeatClosure(struct.PyTreeNode):
    """`CfgEpsClosure` with encoder propagation (Faster Diffusion,
    arXiv 2312.09608 — PAPERS.md): `full` also returns the UNet's down-path
    activations; `reuse` consumes them and recomputes only mid+up with the
    current timestep embedding (~35-40% fewer FLOPs per non-key step).
    Approximate by design — opt-in via `encoder_reuse` in the loops;
    `reuse` with the SAME (x, t)'s features equals `full`'s eps exactly."""

    apply_fn: Callable = struct.field(pytree_node=False)
    params: Any = None
    text_emb: Array = None
    cfg_scale: Array = 3.5

    def _pair(self, x: Array, t: Array):
        b = x.shape[0]
        latents = jnp.concatenate([x, x], axis=0)
        if jnp.ndim(t) == 1:
            t = jnp.concatenate([t, t], axis=0)
        ctx = jnp.repeat(self.text_emb, b, axis=0)
        return latents, t, ctx

    def _mix(self, eps: Array) -> Array:
        eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
        return eps_uncond + self.cfg_scale * (eps_text - eps_uncond)

    def full(self, x: Array, t: Array):
        latents, t, ctx = self._pair(x, t)
        eps, feats = self.apply_fn(
            self.params, latents, t, ctx, return_encoder_features=True
        )
        return self._mix(eps), feats

    def reuse(self, x: Array, t: Array, feats) -> Array:
        latents, t, ctx = self._pair(x, t)
        eps = self.apply_fn(self.params, latents, t, ctx, encoder_features=feats)
        return self._mix(eps)

    def __call__(self, x: Array, t: Array) -> Array:
        latents, t, ctx = self._pair(x, t)
        return self._mix(self.apply_fn(self.params, latents, t, ctx))


class DecodeClosure(struct.PyTreeNode):
    """Latent->image codec as a pytree callable (VAE weights are traced jit
    inputs). `apply_fn is None` means the identity codec (DDPM pixel space)."""

    apply_fn: Optional[Callable] = struct.field(pytree_node=False, default=None)
    params: Any = None
    scale: Any = 1.0  # latent is divided by this before decoding (SD 0.18215)

    def __call__(self, z: Array) -> Array:
        if self.apply_fn is None:
            return z
        return self.apply_fn(self.params, z / self.scale)


class EncodeClosure(struct.PyTreeNode):
    apply_fn: Optional[Callable] = struct.field(pytree_node=False, default=None)
    params: Any = None
    scale: Any = 1.0  # latent multiplied by this after encoding

    def __call__(self, x: Array) -> Array:
        if self.apply_fn is None:
            return x
        return self.apply_fn(self.params, x) * self.scale


def make_eps_fn(apply_fn: Callable, params) -> EpsFn:
    return EpsClosure(apply_fn, params)


def make_cfg_eps_fn(
    apply_fn: Callable,
    params,
    text_emb: Array,
    cfg_scale: float = 3.5,
) -> EpsFn:
    return CfgEpsClosure(apply_fn, params, text_emb, cfg_scale)


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
    encoder_reuse: int = 1,
) -> Trajectory:
    """Run the denoising loop x_T -> x_0.

    Mirrors `Diffusion.generate_image` (`src/base_diffusion.py:49-97`): when
    `zs` is shorter than the schedule (or `num_steps` is given), only the
    last `len(zs)` timesteps run — the `diffusion_loop` truncation semantics
    (`src/diffusion_utils.py:112-133`).

    zs: (S', B, H, W, C) per-step variance noise, required when eta > 0.
    encoder_reuse=k>1: encoder propagation (see `engine.edit.edit`) — needs
    a feature-capable eps_fn; opt-in approximation, k=1 exact.
    """
    if eta > 0 and zs is None:
        raise ValueError("eta > 0 requires zs")
    if encoder_reuse > 1 and not hasattr(eps_fn, "reuse"):
        raise ValueError("encoder_reuse > 1 needs a feature-capable eps_fn")
    n = num_steps if num_steps is not None else (
        zs.shape[0] if zs is not None else sched.num_inference_steps
    )
    timesteps = sched.timesteps[-n:]
    if zs is None:
        zs_in = jnp.zeros((n,) + xt.shape, xt.dtype)
    else:
        zs_in = zs[-n:]
    step = S.ddim_step if step_rule == "ddim" else S.reverse_step

    def body(carry, inputs):
        x, feats = carry
        idx, t, z = inputs
        if encoder_reuse > 1:
            eps, feats = jax.lax.cond(
                idx % encoder_reuse == 0,
                lambda op: eps_fn.full(*op),
                lambda op: (eps_fn.reuse(*op, feats), feats),
                (x, t),
            )
        else:
            eps = eps_fn(x, t)
        x_new, px0 = step(sched, x, eps, t, eta=eta, noise=z if eta > 0 else None)
        ys = (x_new, eps, px0) if collect else None
        return (x_new, feats), ys

    if encoder_reuse > 1:
        feats_shape = jax.eval_shape(
            lambda x_, t_: eps_fn.full(x_, t_)[1], xt, timesteps[0]
        )
        feats0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), feats_shape)
    else:
        feats0 = ()
    (x_final, _), ys = jax.lax.scan(
        body, (xt, feats0), (jnp.arange(n), timesteps, zs_in)
    )
    if collect:
        return Trajectory(x_final, xts=ys[0], model_outputs=ys[1], pred_original_samples=ys[2])
    return Trajectory(x_final)
