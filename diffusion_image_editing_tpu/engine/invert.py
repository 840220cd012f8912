"""Inversion loops (DDIM and edit-friendly DDPM) as jitted `lax.scan` programs.

Rebuilds `src/ddim_inversion.py` and `src/ddpm_inversion.py:31-176` of the
reference as pure on-device scans:

  * `ddim_invert`   — deterministic x0 -> xT.
  * `ddpm_invert`   — arXiv 2304.06140: samples the full forward trajectory
    x_1:T independently per t, then extracts per-step noise maps
    z_t = (x_{t-1} - mu_hat_t) / (eta sigma_t) with the error-accumulation
    correction, as a CARRY-FREE scan streaming the trajectory through the
    scan's xs/ys (the steps are independent; see the body comment).

RNG is threaded `jax.random` keys (replacing the reference's global torch
Generator); parity with the torch implementation is defined at fixed noise
inputs, so `sample_xts` also accepts precomputed noise.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import schedule as S
from .denoise import EpsFn

Array = jax.Array


def ddim_invert(
    sched: S.Schedule,
    eps_fn: EpsFn,
    x0: Array,
    num_steps: Optional[int] = None,
    refine_iters: int = 0,
) -> Array:
    """x_T <- x_0 via DDIM inversion (`src/ddim_inversion.py:52-75`).

    refine_iters=m>0: fixed-point refinement toward EXACT inversion. The
    generate-direction step uses eps(x_t, t), but the standard inversion
    approximates it with eps(x_{t-1}, t); iterating
    eps <- eps_fn(x_t_est, t); x_t_est <- next_step(x_{t-1}, eps, t)
    converges to the x_t whose forward DDIM step reproduces x_{t-1} exactly
    (`core.schedule.next_step` is the algebraic inverse of `ddim_step` at
    equal eps). m extra UNet calls per step; measurably higher roundtrip
    PSNR (tests)."""
    n = num_steps or sched.num_inference_steps
    timesteps = sched.timesteps[-n:][::-1]  # ascending

    def body(x, t):
        eps = eps_fn(x, t)
        x_next = S.next_step(sched, x, eps, t)
        for _ in range(refine_iters):
            eps = eps_fn(x_next, t)
            x_next = S.next_step(sched, x, eps, t)
        return x_next, None

    xT, _ = jax.lax.scan(body, x0, timesteps)
    return xT


class InversionResult(NamedTuple):
    xt: Array  # inverted latent x_T, (B, H, W, C)
    zs: Optional[Array]  # per-step noise maps, (S, B, H, W, C); None at eta=0
    xts: Optional[Array]  # trajectory incl. x0 at the end, (S+1, B, H, W, C)


def sample_xts(
    sched: S.Schedule, x0: Array, key: Array
) -> Array:
    """Forward diffusion sampling P(x_1:T | x_0), independent per timestep
    (`src/ddpm_inversion.py:31-55`). Returns (S+1, B, H, W, C) with
    xts[idx] matching timesteps[idx] (idx 0 noisiest) and xts[S] = x0."""
    n = sched.num_inference_steps
    x0 = x0.astype(jnp.float32)  # trajectory algebra is f32 by contract:
    # near t~0, sqrt(1-a) in bf16 rounds to 0 and the extracted noise maps
    # degenerate (same family of bug as core.schedule._bcast — see there)
    noise = jax.random.normal(key, (n,) + x0.shape, jnp.float32)
    a = S.alpha_bar(sched, sched.timesteps)  # (S,), f32
    a = a.reshape((n,) + (1,) * x0.ndim)
    xts = jnp.sqrt(a) * x0[None] + jnp.sqrt(1.0 - a) * noise
    return jnp.concatenate([xts, x0[None]], axis=0)


def ddpm_invert(
    sched: S.Schedule,
    eps_fn: EpsFn,
    x0: Array,
    eta: float = 1.0,
    key: Optional[Array] = None,
    xts: Optional[Array] = None,
) -> InversionResult:
    """Edit-friendly DDPM inversion (`src/ddpm_inversion.py:80-201`).

    eta == 0 degenerates to the deterministic forward-step loop; eta > 0
    extracts noise maps zs and returns the (corrected) trajectory xts.
    Either `key` (to sample the forward trajectory) or a precomputed `xts`
    must be given when eta > 0.
    """
    n = sched.num_inference_steps
    timesteps = sched.timesteps

    if eta == 0:
        def body0(x, t):
            eps = eps_fn(x, t)
            return S.forward_step(sched, x, eps, t), None

        xT, _ = jax.lax.scan(body0, x0, timesteps[::-1])
        return InversionResult(xT, None, None)

    if xts is None:
        if key is None:
            raise ValueError("eta > 0 requires key or precomputed xts")
        xts = sample_xts(sched, x0, key)

    # Carry-free scan. The reference's sequential loop reads only the ORIGINAL
    # sampled trajectory (iteration idx reads xts[idx], xts[idx+1]; earlier
    # iterations wrote rows >= idx+2) and its eq.-3 "correction" write
    # mu + sigma*((x_{t-1}-mu)/sigma) is algebraically the identity — so every
    # step is independent. Streaming the trajectory as scan xs and emitting
    # (z, corrected x_{t-1}) as ys removes the 51-frame carry whose per-step
    # dynamic slice/update made the old carry form 12x slower than the split
    # host loop (311 vs 25 ms/step on v5e, PARITY.md round 2). Measured after
    # the restructure (round-3 interleaved A/B, scripts/ab_inversion_scan.py):
    # fused 21.34 vs split 22.81 ms/step — the pathology is gone and the
    # fused scan is now the faster single-dispatch form (timestep-parallel
    # `ddpm_invert_batched` remains fastest at 20.4, PARITY.md).
    def body(_, inputs):
        xt, xtm1, t = inputs
        eps = eps_fn(xt, t)
        mu, sigma = S.posterior_mean_from_eps(sched, xt, eps, t, eta)
        z = (xtm1 - mu) / sigma
        # eq.-3 correction (identity in exact arithmetic; keeps (mu, sigma,
        # z) and the stored trajectory bit-consistent):
        return (), (z, mu + sigma * z)

    _, (zs, xtm1_new) = jax.lax.scan(body, (), (xts[:-1], xts[1:], timesteps))
    zs = zs.at[-1].set(jnp.zeros_like(zs[-1]))  # ddpm_inversion.py:172
    xts_out = jnp.concatenate([xts[:1], xtm1_new], axis=0)
    return InversionResult(xts_out[0], zs, xts_out)


def ddpm_sample(
    sched: S.Schedule,
    eps_fn: EpsFn,
    zs: Array,
    xts: Array,
    t_skip: int = 36,
    eta: float = 1.0,
    collect: bool = False,
) -> Array | Tuple[Array, Array]:
    """Re-generate from extracted noise maps (`src/ddpm_inversion.py:280-313`):
    start at xts[t_skip], consume zs[t_skip:], reverse_step each timestep.
    `t_skip` must be static (it sets the scan length).

    Note: the roundtrip reproduces the inversion trajectory exactly at every
    step except the last — sigma_{t_min} == 0 when final_alpha_cumprod == 1,
    so zs[-1] is zeroed (`ddpm_inversion.py:172`) and the final step returns
    the model's pred-x0 instead of x0. Same behaviour as the reference."""
    zs_used = zs[t_skip:]
    xT = xts[t_skip]
    timesteps = sched.timesteps[-zs_used.shape[0]:]

    def body(x, inputs):
        t, z = inputs
        eps = eps_fn(x, t)
        x_new, _ = S.reverse_step(sched, x, eps, t, eta=eta, noise=z if eta > 0 else None)
        return x_new, x_new if collect else None

    x_final, traj = jax.lax.scan(body, xT, (timesteps, zs_used))
    if collect:
        return x_final, traj
    return x_final


# ---------------------------------------------------------------------------
# Split-mode inversion: host loop of small per-step jitted programs.
#
# Same math as the scan versions above; on this TPU stack the split form is
# the production-fast path (Pallas kernels inside `lax.scan` lose pipelining —
# see CLAUDE.md rule 7 / PARITY.md perf notes), mirroring
# `pipeline.edit_image(mode="split")`. Module-level jits keep function
# identity stable so nothing retraces across calls.
# ---------------------------------------------------------------------------

import numpy as _np


@functools.partial(jax.jit, static_argnames=("refine_iters",))
def _ddim_invert_step(sched, eps_fn, x, t, refine_iters=0):
    eps = eps_fn(x, t)
    x_next = S.next_step(sched, x, eps, t)
    for _ in range(refine_iters):  # fixed-point exactness (see ddim_invert)
        eps = eps_fn(x_next, t)
        x_next = S.next_step(sched, x, eps, t)
    return x_next


def ddim_invert_split(
    sched: S.Schedule, eps_fn: EpsFn, x0: Array, num_steps: Optional[int] = None,
    refine_iters: int = 0,
) -> Array:
    """`ddim_invert` as a host loop over one jitted step (identical math)."""
    n = num_steps or sched.num_inference_steps
    ts = _np.asarray(sched.timesteps[-n:][::-1])  # ascending
    x = x0
    for t in ts:
        x = _ddim_invert_step(sched, eps_fn, x, jnp.int32(t),
                              refine_iters=refine_iters)
    return x


@jax.jit
def _ddpm_forward_step(sched, eps_fn, x, t):
    eps = eps_fn(x, t)
    return S.forward_step(sched, x, eps, t)


@jax.jit
def _ddpm_invert_step_traj(sched, eps_fn, xts, idx, t, eta):
    """One inversion step over the full trajectory array: slice x_t/x_{t-1},
    extract z, write the corrected x_{t-1} back — all INSIDE one jitted
    program. Indexing with a host Python int instead compiles a fresh
    throwaway program per (op, index) pair: 100+ eager remote compiles,
    measured 1027 s of warmup for a 50-step inversion on the v5e relay."""
    xt = jax.lax.dynamic_index_in_dim(xts, idx, keepdims=False)
    xtm1 = jax.lax.dynamic_index_in_dim(xts, idx + 1, keepdims=False)
    eps = eps_fn(xt, t)
    mu, sigma = S.posterior_mean_from_eps(sched, xt, eps, t, eta)
    z = (xtm1 - mu) / sigma
    xts = jax.lax.dynamic_update_index_in_dim(xts, mu + sigma * z, idx + 1, axis=0)
    return xts, z


def ddpm_invert_split(
    sched: S.Schedule,
    eps_fn: EpsFn,
    x0: Array,
    eta: float = 1.0,
    key: Optional[Array] = None,
    xts: Optional[Array] = None,
    start: int = 0,
) -> InversionResult:
    """`ddpm_invert` as a host loop over one jitted step (identical math:
    same read-ahead-of-write update order as the scan carry). `start=k`
    extracts z only for timestep indices >= k (see `ddpm_invert_batched`);
    the returned `zs[:k]` are zeros and `xts[1:k+1]` stay raw-sampled."""
    n = sched.num_inference_steps
    ts = _np.asarray(sched.timesteps)
    start = int(start)
    if not 0 <= start < n:
        raise ValueError(f"start must be in [0, {n}), got {start}")

    if eta == 0:
        x = x0
        for t in ts[::-1]:
            x = _ddpm_forward_step(sched, eps_fn, x, jnp.int32(t))
        return InversionResult(x, None, None)

    if xts is None:
        if key is None:
            raise ValueError("eta > 0 requires key or precomputed xts")
        xts = sample_xts(sched, x0, key)

    zs_rev = []
    for idx in range(n - 1, start - 1, -1):
        xts, z = _ddpm_invert_step_traj(
            sched, eps_fn, xts, jnp.int32(idx), jnp.int32(ts[idx]), jnp.float32(eta)
        )
        zs_rev.append(z)
    zs = jnp.stack(zs_rev[::-1])
    zs = zs.at[-1].set(jnp.zeros_like(zs[-1]))  # ddpm_inversion.py:172
    if start:
        zs = jnp.concatenate(
            [jnp.zeros((start,) + zs.shape[1:], zs.dtype), zs], axis=0)
    return InversionResult(xts[0], zs, xts)


@functools.partial(jax.jit, static_argnames=("eta", "group"))
def _ddpm_invert_group(sched, eps_fn, x_flat, xnext_flat, ts_flat, gidx, eta, group):
    """z-extraction for ONE group of `group` (timestep, sample) pairs as a
    single flat-batched UNet call with per-sample timesteps. The group is
    dynamically sliced inside the program so the host loop over groups hits
    one compilation (host-index slicing compiles a throwaway program per
    index on the relay; a vmap-over-chunk form measured far worse than this
    flat batch, though single-program timings through the relay carry large
    run-to-run variance — see PARITY.md measurement notes)."""
    start = gidx * group
    x = jax.lax.dynamic_slice_in_dim(x_flat, start, group, axis=0)
    xn = jax.lax.dynamic_slice_in_dim(xnext_flat, start, group, axis=0)
    t = jax.lax.dynamic_slice_in_dim(ts_flat, start, group, axis=0)
    eps = eps_fn(x, t)
    mu, sigma = S.posterior_mean_from_eps(sched, x, eps, t, eta)
    z = (xn - mu) / sigma
    # eq. 3 correction (identity in exact arithmetic; keeps (mu, sigma, z)
    # and the stored trajectory bit-consistent):
    return z, mu + sigma * z


def ddpm_invert_batched(
    sched: S.Schedule,
    eps_fn: EpsFn,
    x0: Array,
    eta: float = 1.0,
    key: Optional[Array] = None,
    xts: Optional[Array] = None,
    chunk: int = 10,
    start: int = 0,
) -> InversionResult:
    """Edit-friendly DDPM inversion with the z-extraction PARALLELIZED across
    timesteps — the TPU-first form of `inversion_forward_process`
    (`src/ddpm_inversion.py:80-176`).

    Key observation: the reference's sequential loop reads only the ORIGINAL
    sampled trajectory — iteration idx reads xts[idx] and xts[idx+1], while
    prior iterations (larger idx) wrote rows >= idx+2, and the eq.-3
    "correction" write (mu + sigma*z with z = (xtm1-mu)/sigma) is
    algebraically the identity. Every timestep's z is therefore independent,
    and the S sequential batch-1 UNet calls become ceil(S/chunk) flat-batched
    calls of chunk*B samples (x2 under CFG) with per-sample timesteps —
    MXU-efficient batching instead of a serial chain. Identical math to
    `ddpm_invert`; numerically equal up to fp reassociation (batched convs
    regroup reductions, ~1e-4 relative).

    `chunk` bounds UNet activation memory (group batch = chunk * B).

    `start=k` extracts z only for timestep indices >= k — the t_skip
    editing flow (`SegDiffEditPipeline.py:202-213`) consumes only
    `zs[t_skip:]` and `xts[t_skip]`, and timestep independence (above)
    makes the skipped rows pure waste: k/S of the inversion UNet work
    (20% at the reference's t_skip=10, S=50) vanishes EXACTLY. Returned
    `zs[:k]` are zeros (never read by an edit with t_skip >= k) and
    `xts[1:k+1]` keep their raw sampled values instead of the eq.-3
    identity-corrected ones (equal in exact arithmetic; suffix rows > k
    match a full run's up to batch-regrouping fp reassociation, the same
    ~1e-4 bound as batched-vs-split).

    Status: math-parity tested against `ddpm_invert` (CPU, fp-reassociation
    tolerance). On the current v5e relay, end-to-end timings of this program
    were NOT reproducibly better than the split host loop (single-program
    measurements vary by >2x run to run), so `prepare_real_image_edit`
    keeps the split default; this form is the one to prefer on hardware
    where batch-B UNet scaling is measured to hold.
    """
    n = sched.num_inference_steps
    if eta == 0:
        return ddpm_invert_split(sched, eps_fn, x0, eta=0.0)
    if xts is None:
        if key is None:
            raise ValueError("eta > 0 requires key or precomputed xts")
        xts = sample_xts(sched, x0, key)

    b = x0.shape[0]
    sample_shape = x0.shape[1:]
    start = int(start)
    if not 0 <= start < n:
        raise ValueError(f"start must be in [0, {n}), got {start}")
    n_ext = n - start  # timestep pairs actually extracted
    if int(chunk) < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    chunk = min(int(chunk), n_ext)
    group = chunk * b
    total = n_ext * b
    pad = (-total) % group

    # (S, B, ...) -> (S*B, ...) with per-pair timesteps; pad the tail group
    # by repeating row 0 (results discarded).
    x_flat = xts[start:-1].reshape((total,) + sample_shape)
    xn_flat = xts[start + 1:].reshape((total,) + sample_shape)
    ts_flat = jnp.repeat(jnp.asarray(sched.timesteps[start:]), b)
    if pad:
        x_flat = jnp.concatenate([x_flat, jnp.repeat(x_flat[:1], pad, axis=0)])
        xn_flat = jnp.concatenate([xn_flat, jnp.repeat(xn_flat[:1], pad, axis=0)])
        ts_flat = jnp.concatenate([ts_flat, jnp.repeat(ts_flat[:1], pad)])

    zs_parts, xtm1_parts = [], []
    for g in range((total + pad) // group):
        z_g, xtm1_g = _ddpm_invert_group(
            sched, eps_fn, x_flat, xn_flat, ts_flat, jnp.int32(g),
            eta=float(eta), group=group,
        )
        zs_parts.append(z_g)
        xtm1_parts.append(xtm1_g)
    zs = jnp.concatenate(zs_parts, axis=0)[:total].reshape(
        (n_ext, b) + sample_shape)
    xtm1 = jnp.concatenate(xtm1_parts, axis=0)[:total].reshape(
        (n_ext, b) + sample_shape)

    zs = zs.at[-1].set(jnp.zeros_like(zs[-1]))  # ddpm_inversion.py:172
    if start:
        zs = jnp.concatenate(
            [jnp.zeros((start, b) + sample_shape, zs.dtype), zs], axis=0)
    xts_out = jnp.concatenate([xts[: start + 1], xtm1], axis=0)
    return InversionResult(xts_out[0], zs, xts_out)
