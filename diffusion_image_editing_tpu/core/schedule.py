"""Diffusion schedule algebra as pure, scannable JAX functions.

This module is the TPU-native redesign of the reference's scheduler layer
(`src/diffusion_utils.py`, `src/ddim_inversion.py:13-48`,
`src/ddpm_inversion.py:16-77,203-240` in JohanLundberg12/diffusion-image-editing):
instead of a stateful `diffusers.DDIMScheduler` object driven from Python loops,
the whole schedule is a small pytree of precomputed arrays (`Schedule`) and every
update rule is a pure `(x_t, eps, t) -> x_{t +/- 1}` function. All functions are
shape-polymorphic over NHWC batches, traceable under `jax.jit`, and usable inside
`lax.scan` bodies with dynamic timestep gathers.

Semantics intentionally preserved from the reference:
  * `ddim_step` follows diffusers' `DDIMScheduler.step` (direction term uses
    eta^2 * variance, i.e. std_dev_t**2).
  * `reverse_step` follows the edit-friendly DDPM-inversion variant
    (`src/ddpm_inversion.py:203-240`), whose direction term uses eta * variance
    (NOT eta^2) — a deliberate quirk of arXiv 2304.06140's released code.
  * `next_step` (DDIM inversion, `src/ddim_inversion.py:13-48`) clamps the
    lower timestep at 999 and routes t<0 through `final_alpha_cumprod`.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array


def _betas(
    num_train_timesteps: int,
    beta_start: float,
    beta_end: float,
    beta_schedule: str,
) -> Array:
    if beta_schedule == "linear":
        return jnp.linspace(beta_start, beta_end, num_train_timesteps, dtype=jnp.float32)
    if beta_schedule == "scaled_linear":
        return (
            jnp.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=jnp.float32
            )
            ** 2
        )
    if beta_schedule == "squaredcos_cap_v2":
        # Glide cosine schedule ("betas_for_alpha_bar").
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = [
            min(
                1 - alpha_bar((i + 1) / num_train_timesteps) / alpha_bar(i / num_train_timesteps),
                0.999,
            )
            for i in range(num_train_timesteps)
        ]
        return jnp.asarray(betas, dtype=jnp.float32)
    raise ValueError(f"Unknown beta schedule: {beta_schedule!r}")


def _inference_timesteps(
    num_train_timesteps: int,
    num_inference_steps: int,
    timestep_spacing: str,
    steps_offset: int,
) -> np.ndarray:
    """HOST (numpy) by design: the step list is control-flow data — it drives
    host loops (`engine/edit.py`, `engine/invert.py`) and chunking decisions,
    never device compute. Keeping it in HBM made every `np.asarray(
    sched.timesteps)` in those loops a device-to-host readback, which through
    the axon relay costs the fixed ~23.5 ms sync latency per call (CLAUDE.md
    rule 2) — pure waste on the e2e paths. Inside jit (sched as argument or
    captured) a numpy leaf traces/constant-folds exactly like a jnp one."""
    if timestep_spacing == "leading":
        step_ratio = num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1]
        ts = ts.astype(np.int32) + steps_offset
    elif timestep_spacing == "trailing":
        step_ratio = num_train_timesteps / num_inference_steps
        ts = np.round(np.arange(num_train_timesteps, 0, -step_ratio)).astype(np.int32)
        ts = ts - 1
    elif timestep_spacing == "linspace":
        ts = np.linspace(0, num_train_timesteps - 1, num_inference_steps)
        ts = np.round(ts)[::-1].astype(np.int32)
    else:
        raise ValueError(f"Unknown timestep spacing: {timestep_spacing!r}")
    return np.ascontiguousarray(ts)


class Schedule(struct.PyTreeNode):
    """Precomputed diffusion schedule: a pytree, safe to close over or pass to jit.

    `timesteps` is descending (noisiest first), matching the denoising order of
    the reference's `diffusion_loop` (`src/diffusion_utils.py:112-133`), and
    lives on the HOST (numpy int32) — see `_inference_timesteps` for why.
    """

    alphas_cumprod: Array  # (T,) float32
    final_alpha_cumprod: Array  # () float32 — used when prev_timestep < 0
    timesteps: Array  # (S,) int32, descending — HOST numpy (see _inference_timesteps)
    num_train_timesteps: int = struct.field(pytree_node=False)
    num_inference_steps: int = struct.field(pytree_node=False)
    clip_sample: bool = struct.field(pytree_node=False)
    clip_sample_range: float = struct.field(pytree_node=False)
    # Remembered so `with_num_inference_steps` regenerates timesteps with the
    # preset's own spacing (e.g. SD's steps_offset=1), not silent defaults.
    steps_offset: int = struct.field(pytree_node=False, default=0)
    timestep_spacing: str = struct.field(pytree_node=False, default="leading")

    @property
    def step_ratio(self) -> int:
        return self.num_train_timesteps // self.num_inference_steps

    def with_clip_sample(self, clip_sample: bool) -> "Schedule":
        return self.replace(clip_sample=clip_sample)

    def with_num_inference_steps(
        self,
        num_inference_steps: int,
        timestep_spacing: Optional[str] = None,
        steps_offset: Optional[int] = None,
    ) -> "Schedule":
        spacing = self.timestep_spacing if timestep_spacing is None else timestep_spacing
        offset = self.steps_offset if steps_offset is None else steps_offset
        ts = _inference_timesteps(
            self.num_train_timesteps, num_inference_steps, spacing, offset
        )
        return self.replace(
            timesteps=ts,
            num_inference_steps=num_inference_steps,
            steps_offset=offset,
            timestep_spacing=spacing,
        )


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
    beta_schedule: str = "linear",
    num_inference_steps: int = 50,
    steps_offset: int = 0,
    timestep_spacing: str = "leading",
    set_alpha_to_one: bool = True,
    clip_sample: bool = True,
    clip_sample_range: float = 1.0,
) -> Schedule:
    betas = _betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
    alphas_cumprod = jnp.cumprod(1.0 - betas)
    final = jnp.float32(1.0) if set_alpha_to_one else alphas_cumprod[0]
    ts = _inference_timesteps(
        num_train_timesteps, num_inference_steps, timestep_spacing, steps_offset
    )
    return Schedule(
        alphas_cumprod=alphas_cumprod,
        final_alpha_cumprod=final,
        timesteps=ts,
        num_train_timesteps=num_train_timesteps,
        num_inference_steps=num_inference_steps,
        clip_sample=clip_sample,
        clip_sample_range=clip_sample_range,
        steps_offset=steps_offset,
        timestep_spacing=timestep_spacing,
    )


# ---------------------------------------------------------------------------
# Scalar schedule lookups (all accept traced int32 timesteps)
# ---------------------------------------------------------------------------


def alpha_bar(s: Schedule, t: Array) -> Array:
    """alphas_cumprod[t], routing t < 0 to final_alpha_cumprod."""
    safe_t = jnp.clip(t, 0, s.num_train_timesteps - 1)
    return jnp.where(t >= 0, s.alphas_cumprod[safe_t], s.final_alpha_cumprod)


def prev_timestep(s: Schedule, t: Array) -> Array:
    """t - T // S  (reference `get_previous_timestep`, diffusion_utils.py:76-81)."""
    return t - s.step_ratio


def variance(s: Schedule, t: Array) -> Array:
    """sigma_t^2(eta=1): DDIM eq. 16 (reference `calculate_variance`)."""
    a_t = alpha_bar(s, t)
    a_prev = alpha_bar(s, prev_timestep(s, t))
    beta_t = 1.0 - a_t
    beta_prev = 1.0 - a_prev
    return (beta_prev / beta_t) * (1.0 - a_t / a_prev)


def _bcast(scalar: Array, like: Array) -> Array:
    """Broadcast a () scalar — or a (B,) per-sample vector — against an NHWC
    sample. Vector support lets every step function take a different timestep
    per batch element (used by the timestep-parallel DDPM inversion).

    Schedule algebra is f32 BY CONTRACT: never downcast the coefficient to
    the sample's dtype. A bf16 sample (e.g. a latent straight from the bf16
    VAE encoder) used to drag alpha_bar/variance to bf16 by promotion, where
    near t=0 the rounded direction radicand 1 - a_prev - eta*var went
    NEGATIVE -> sqrt -> NaN (caught by the e2e seg bench; step outputs are
    f32 for bf16 inputs now — models cast to their compute dtype on entry)."""
    scalar = scalar.astype(jnp.promote_types(like.dtype, jnp.float32))
    if scalar.ndim == 1 and like.ndim > 1:
        scalar = scalar.reshape((-1,) + (1,) * (like.ndim - 1))
    return scalar


def pred_original_sample(s: Schedule, sample: Array, eps: Array, t: Array) -> Array:
    """Predicted x0 — DDIM paper eq. 12 (reference `compute_predicted_original_sample`)."""
    a_t = _bcast(alpha_bar(s, t), sample)
    x0 = (sample - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    if s.clip_sample:
        x0 = jnp.clip(x0, -s.clip_sample_range, s.clip_sample_range)
    return x0


# ---------------------------------------------------------------------------
# Update rules
# ---------------------------------------------------------------------------


def ddim_step(
    s: Schedule,
    sample: Array,
    eps: Array,
    t: Array,
    eta: float = 0.0,
    noise: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """One denoising step with diffusers `DDIMScheduler.step` semantics.

    Returns (prev_sample, pred_original_sample) — the `single_step` contract of
    the reference (`src/diffusion_utils.py:90-109`).
    """
    a_prev = _bcast(alpha_bar(s, prev_timestep(s, t)), sample)
    x0 = pred_original_sample(s, sample, eps, t)
    var = _bcast(variance(s, t), sample)
    std_dev = eta * jnp.sqrt(var)
    # clamp: the radicand is >= 0 analytically but fp rounding can push it
    # fractionally negative at the t~0 boundary (sqrt(neg) = NaN)
    direction = jnp.sqrt(jnp.maximum(1.0 - a_prev - std_dev**2, 0.0)) * eps
    prev = jnp.sqrt(a_prev) * x0 + direction
    if eta > 0:
        if noise is None:
            raise ValueError("eta > 0 requires variance noise")
        prev = prev + std_dev * noise
    return prev, x0


def reverse_step(
    s: Schedule,
    sample: Array,
    eps: Array,
    t: Array,
    eta: float = 0.0,
    noise: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Edit-friendly DDPM-inversion reverse step (`src/ddpm_inversion.py:203-240`).

    Differs from `ddim_step` in the direction term: (1 - a_prev - eta*var)
    instead of (1 - a_prev - (eta*sqrt(var))**2). Identical at eta in {0, 1}.
    """
    a_t = _bcast(alpha_bar(s, t), sample)
    a_prev = _bcast(alpha_bar(s, prev_timestep(s, t)), sample)
    x0 = (sample - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    var = _bcast(variance(s, t), sample)
    direction = jnp.sqrt(jnp.maximum(1.0 - a_prev - eta * var, 0.0)) * eps
    prev = jnp.sqrt(a_prev) * x0 + direction
    if eta > 0:
        if noise is None:
            raise ValueError("eta > 0 requires variance noise")
        prev = prev + eta * jnp.sqrt(var) * noise
    return prev, x0


def next_step(s: Schedule, sample: Array, eps: Array, t: Array) -> Array:
    """DDIM-inversion step x_t -> x_{t+1} (`src/ddim_inversion.py:13-48`)."""
    cur_t = jnp.minimum(t - s.step_ratio, s.num_train_timesteps - 1)
    a_t = _bcast(alpha_bar(s, cur_t), sample)
    a_next = _bcast(alpha_bar(s, t), sample)
    x0 = (sample - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    return jnp.sqrt(a_next) * x0 + jnp.sqrt(1.0 - a_next) * eps


def forward_step(s: Schedule, sample: Array, eps: Array, t: Array) -> Array:
    """eta=0 forward step of the DDPM inversion (`src/ddpm_inversion.py:58-77`)."""
    next_t = jnp.minimum(t + s.step_ratio, s.num_train_timesteps - 2)
    a_t = _bcast(alpha_bar(s, t), sample)
    x0 = (sample - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    return add_noise(s, x0, eps, next_t)


def add_noise(s: Schedule, x0: Array, noise: Array, t: Array) -> Array:
    """q(x_t | x_0) mean path: sqrt(a_t) x0 + sqrt(1-a_t) noise."""
    a_t = _bcast(alpha_bar(s, t), x0)
    return jnp.sqrt(a_t) * x0 + jnp.sqrt(1.0 - a_t) * noise


def mu_tilde(s: Schedule, xt: Array, x0: Array, t: Array) -> Array:
    """Posterior mean mu~(x_t, x_0), DDPM paper eq. 7 (`src/ddpm_inversion.py:16-28`)."""
    a_t = _bcast(alpha_bar(s, t), xt)
    a_prev = _bcast(alpha_bar(s, prev_timestep(s, t)), xt)
    beta_t = 1.0 - a_t
    return (jnp.sqrt(a_prev) * beta_t / (1.0 - a_t)) * x0 + (
        jnp.sqrt(a_t) * (1.0 - a_prev) / (1.0 - a_t)
    ) * xt


def posterior_mean_from_eps(
    s: Schedule, sample: Array, eps: Array, t: Array, eta: float
) -> Tuple[Array, Array]:
    """mu_hat(x_t) and sigma = eta*sqrt(var): the noise-map extraction pieces of
    `inversion_forward_process` (`src/ddpm_inversion.py:134-160`)."""
    a_t = _bcast(alpha_bar(s, t), sample)
    a_prev = _bcast(alpha_bar(s, prev_timestep(s, t)), sample)
    x0 = (sample - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    var = _bcast(variance(s, t), sample)
    direction = jnp.sqrt(jnp.maximum(1.0 - a_prev - eta * var, 0.0)) * eps
    mu = jnp.sqrt(a_prev) * x0 + direction
    sigma = eta * jnp.sqrt(var)
    return mu, sigma
