"""Sharded batched edit sweeps: guidance-scale / seed grids over the mesh.

The reference runs edits serially, one Python iteration per configuration
(`src/base_diffusion.py:123-141`, `src/metrics.py:79,170`). TPU-native, a
sweep is a single program: `vmap` over the grid dimension (guidance params
are pytree leaves of AttrFunc, so they vectorize directly) + `jit` with the
grid axis sharded over the mesh — BASELINE.json config 5 ("batched SD-1.5
edit sweep, guidance-scale grid").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.schedule import Schedule
from ..engine.denoise import EpsFn
from ..engine.edit import edit
from ..guidance.attr_functions import AttrFunc, DecodeFn

Array = jax.Array


def _attr_axes(attr_func: AttrFunc, swept_fields: Sequence[str]):
    """vmap in_axes pytree for AttrFunc: 0 on swept leaves, None elsewhere."""
    axes = jax.tree.map(lambda _: None, attr_func)
    return axes.replace(**{f: 0 for f in swept_fields})


def sweep_attr_func(attr_func: AttrFunc, **grids) -> AttrFunc:
    """Broadcast AttrFunc leaves to a grid: sweep_attr_func(af, loss_scale=[...])."""
    return attr_func.replace(**{k: jnp.asarray(v) for k, v in grids.items()})


def guided_edit_sweep(
    sched: Schedule,
    eps_fn: EpsFn,
    xt: Array,
    attr_func: AttrFunc,
    swept_fields: Sequence[str] = ("loss_scale",),
    eta: float = 0.0,
    zs: Optional[Array] = None,
    decode_fn: Optional[DecodeFn] = None,
    mask: Optional[Array] = None,
    x0_ref: Optional[Array] = None,
    step_rule: str = "ddim",
    mesh: Optional[Mesh] = None,
    axis: str = "data",
) -> Array:
    """Run the guided edit for every grid point of the swept AttrFunc fields.

    `attr_func` must already hold (G,)-shaped leaves in `swept_fields` (see
    `sweep_attr_func`). The same xt/zs feed every grid point. Returns
    (G, B, H, W, C) final latents, sharded over the mesh when given.
    """

    def one(af: AttrFunc, eps_fn_, dec_fn_, xt_, zs_) -> Array:
        return edit(
            sched, eps_fn_, xt_, eta=eta, zs=zs_, attr_func=af, decode_fn=dec_fn_,
            mask=mask, x0_ref=x0_ref, step_rule=step_rule, collect=False,
        ).x0

    # eps_fn/decode_fn/xt/zs enter the jit as arguments (weights as traced
    # inputs); only the attr grid is vmapped.
    vm = jax.vmap(
        one, in_axes=(_attr_axes(attr_func, swept_fields), None, None, None, None)
    )
    args = (attr_func, eps_fn, decode_fn, xt, zs)
    if mesh is None:
        return jax.jit(vm)(*args)

    grid_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    # swept leaves are the 1-D grids; everything else replicates
    af_shardings = jax.tree.map(
        lambda leaf: grid_sharding if getattr(leaf, "ndim", 0) == 1 else repl,
        attr_func,
    )
    out = jax.jit(
        vm, in_shardings=(af_shardings, repl, repl, repl, repl),
        out_shardings=grid_sharding,
    )(*args)
    return out


def seed_sweep_generate(
    sched: Schedule,
    eps_fn: EpsFn,
    latent_shape,
    seeds: Sequence[int],
    eta: float = 0.0,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
) -> Array:
    """Batch-generate one image per seed, the seed axis sharded over the mesh
    (replaces the serial loop of `base_diffusion.py:123-141`)."""
    from ..engine.denoise import generate

    keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])

    def one(key, eps_fn_):
        kx, kz = jax.random.split(key)
        xt = jax.random.normal(kx, latent_shape)
        zs = (
            jax.random.normal(kz, (sched.num_inference_steps,) + latent_shape)
            if eta > 0 else None
        )
        return generate(sched, eps_fn_, xt, eta=eta, zs=zs).x0

    vm = jax.vmap(one, in_axes=(0, None))
    if mesh is None:
        return jax.jit(vm)(keys, eps_fn)
    grid = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return jax.jit(vm, in_shardings=(grid, repl), out_shardings=grid)(keys, eps_fn)
