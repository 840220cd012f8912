"""Sharded guided editing: multi-chip latency for ONE image.

The reference has no multi-GPU inference at all (its only distribution is the
BiSeNet DDP trainer, `src/Segmentation/train.py:47-52`); sweeps
(`parallel/sweep.py`) shard a *grid* of edits. This module is the other
direction — making a SINGLE 50-step inversion+edit faster than one chip by
partitioning the step itself over a mesh (the north-star target in
BASELINE.md is per-image latency on a v5e-8):

* **CFG-pair sharding** ('cfg' axis, size 2): the classifier-free-guidance
  UNet call is naturally a batched-2 program ([uncond; cond], see
  `engine.denoise.CfgEpsClosure`); sharding that axis runs the two branches
  on different chips. The only cross-chip traffic is the eps mix at the end
  of each step (one all-gather of a 64x64x4 latent over ICI).
* **Spatial sharding** ('sp' axis): latents/images are sharded along H;
  XLA GSPMD partitions the convs (halo exchange) and attention einsums.
  This is what scales the heavy VAE-decode VJP inside the guidance step.

Everything is expressed as `with_sharding_constraint` inside the closures, so
the same jitted step programs run unsharded on one chip (constraints with a
1-device mesh are no-ops) and sharded on a mesh — no separate code path.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.denoise import DecodeClosure

Array = jax.Array


def cfg_mesh(devices=None, cfg: int = 2, sp: Optional[int] = None) -> Mesh:
    """Mesh with a size-2 'cfg' axis (uncond/cond) and an 'sp' spatial axis
    over the remaining devices."""
    import numpy as np

    devices = np.asarray(devices if devices is not None else jax.devices())
    if sp is None:
        sp = devices.size // cfg
    return Mesh(devices[: cfg * sp].reshape(cfg, sp), ("cfg", "sp"))


class ShardedCfgEpsClosure(struct.PyTreeNode):
    """CFG denoiser whose batched-2 UNet call is sharded over the mesh.

    Identical math to `CfgEpsClosure` (same [uncond; cond] ordering); the
    pair axis is constrained to the 'cfg' mesh axis and H to 'sp', so the
    uncond and cond UNet forwards execute on different chips concurrently.
    """

    apply_fn: Callable = struct.field(pytree_node=False)
    params: Any = None
    text_emb: Array = None
    cfg_scale: Array = 3.5
    mesh: Mesh = struct.field(pytree_node=False, default=None)

    def _constrain(self, x: Array, spec: P) -> Array:
        if self.mesh is None:
            return x
        return jax.lax.with_sharding_constraint(x, NamedSharding(self.mesh, spec))

    def __call__(self, x: Array, t: Array) -> Array:
        b = x.shape[0]
        latents = jnp.concatenate([x, x], axis=0)
        if jnp.ndim(t) == 1:  # per-sample timesteps: tile for the CFG pair
            t = jnp.concatenate([t, t], axis=0)
        ctx = jnp.repeat(self.text_emb, b, axis=0)
        latents = self._constrain(latents, P("cfg", "sp"))
        ctx = self._constrain(ctx, P("cfg"))
        eps = self.apply_fn(self.params, latents, t, ctx)
        eps = self._constrain(eps, P("cfg", "sp"))
        eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
        return eps_uncond + self.cfg_scale * (eps_text - eps_uncond)


class ShardedEpsClosure(struct.PyTreeNode):
    """Unconditional denoiser (no CFG pair) with activations' H constrained
    over the given mesh axes — the DDPM/LDM counterpart of
    `ShardedCfgEpsClosure` (batch 1 has no pair axis, so H takes the whole
    mesh). Same math as `engine.denoise.EpsClosure`."""

    apply_fn: Callable = struct.field(pytree_node=False)
    params: Any = None
    mesh: Mesh = struct.field(pytree_node=False, default=None)
    axes: Any = struct.field(pytree_node=False, default=None)  # None = all

    def _spec(self) -> P:
        axes = self.axes if self.axes is not None else tuple(self.mesh.axis_names)
        return P(None, axes)

    def __call__(self, x: Array, t: Array) -> Array:
        if self.mesh is not None:
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, self._spec())
            )
        eps = self.apply_fn(self.params, x, t)
        if self.mesh is not None:
            eps = jax.lax.with_sharding_constraint(
                eps, NamedSharding(self.mesh, self._spec())
            )
        return eps


class SpatialEncodeClosure(struct.PyTreeNode):
    """Encode closure (image -> scaled latent) with input/output H constrained
    over the mesh axes — `engine.denoise.EncodeClosure` math."""

    apply_fn: Optional[Callable] = struct.field(pytree_node=False, default=None)
    params: Any = None
    scale: Any = 1.0  # latent multiplied by this after encoding
    mesh: Mesh = struct.field(pytree_node=False, default=None)
    axes: Any = struct.field(pytree_node=False, default="sp")

    def __call__(self, x: Array) -> Array:
        if self.mesh is not None:
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, P(None, self.axes))
            )
        if self.apply_fn is None:
            return x
        out = self.apply_fn(self.params, x) * self.scale
        if self.mesh is not None:
            out = jax.lax.with_sharding_constraint(
                out, NamedSharding(self.mesh, P(None, self.axes))
            )
        return out


class SpatialDecodeClosure(struct.PyTreeNode):
    """Decode closure whose input latent (and therefore the decoder convs and
    their VJP) is sharded along H over the given mesh axes.

    `axes` defaults to 'sp'; pass ("cfg", "sp") to split H over BOTH axes —
    the decode runs on a batch-1 latent (no CFG pair), so on a cfg x sp mesh
    an 'sp'-only split leaves the 'cfg' axis idle and duplicates the whole
    decode fwd+VJP per cfg group (measured: 1.78x per-device FLOP overhead
    vs the unsharded step, MULTICHIP_PROJECTION_r04.json; 8-way H fixes it).
    """

    apply_fn: Optional[Callable] = struct.field(pytree_node=False, default=None)
    params: Any = None
    scale: Any = 1.0
    mesh: Mesh = struct.field(pytree_node=False, default=None)
    axes: Any = struct.field(pytree_node=False, default="sp")

    def __call__(self, z: Array) -> Array:
        if self.mesh is not None:
            z = jax.lax.with_sharding_constraint(
                z, NamedSharding(self.mesh, P(None, self.axes))
            )
        if self.apply_fn is None:
            return z
        out = self.apply_fn(self.params, z / self.scale)
        if self.mesh is not None:
            out = jax.lax.with_sharding_constraint(
                out, NamedSharding(self.mesh, P(None, self.axes))
            )
        return out


def make_sharded_cfg_eps_fn(
    apply_fn: Callable,
    params,
    text_emb: Array,
    cfg_scale: float,
    mesh: Mesh,
) -> ShardedCfgEpsClosure:
    return ShardedCfgEpsClosure(apply_fn, params, text_emb, cfg_scale, mesh)


def spatial_shard(mesh: Mesh, axis="sp") -> Callable[[Array], Array]:
    """Activation re-sharding hook: constrain an NHWC activation's H to the
    spatial mesh axis (a name or a tuple of names, e.g. ("cfg", "sp") for an
    H split over the whole mesh). Pass as `shard_fn` to `Decoder`/`decode` —
    GSPMD propagation from the decoder boundary alone loses the partitioning
    at the middle resolutions (measured; see `models.vae.Decoder`)."""

    def keep(x: Array) -> Array:
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(None, axis))
        )

    return keep


def shard_decode_fn(
    decode_fn: DecodeClosure, mesh: Mesh, apply_fn: Optional[Callable] = None,
    axes="sp",
) -> SpatialDecodeClosure:
    """Lift a wrapper's DecodeClosure onto the mesh (same params). `apply_fn`
    optionally overrides the decode invocation — use one that threads
    `spatial_shard(mesh, axes)` into the decoder (e.g.
    `lambda p, z: vae.apply(p, z, method="decode", shard_fn=spatial_shard(mesh))`)
    so every decoder stage stays partitioned, not just the boundary. On a
    cfg x sp mesh pass axes=("cfg", "sp") so the batch-1 decode+VJP splits
    over ALL devices instead of duplicating per cfg group."""
    return SpatialDecodeClosure(
        apply_fn if apply_fn is not None else decode_fn.apply_fn,
        decode_fn.params, decode_fn.scale, mesh, axes,
    )
