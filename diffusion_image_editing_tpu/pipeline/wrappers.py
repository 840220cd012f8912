"""Model-family wrappers: the codec boundary + generation API.

Rebuild of `src/base_diffusion.py` + `src/diffusion_classes.py`: a wrapper
holds the Flax UNet (apply + params), the Schedule, and the codec
(identity / VQModel / AutoencoderKL with 0.18215 scaling). The per-sample
Python loop of `generate_images` (`base_diffusion.py:99-148`) becomes a
batched, jitted scan; RNG is jax.random keys instead of a global torch
Generator. Gradient flow through `decode` is caller-controlled (the
reference's `no_grad` flag disappears in functional JAX).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.schedule import Schedule
from ..engine import denoise as D
from ..engine.denoise import DecodeClosure, EncodeClosure, EpsFn

Array = jax.Array


@jax.jit
def _jit_decode(dec_fn, latent):
    """Module-level jitted decode: stable identity, codec params as traced
    arguments (used by the split generation path)."""
    return dec_fn(latent)


class DiffusionWrapper:
    """Base wrapper (`src/base_diffusion.py:29-47` parity)."""

    family = "base"

    def __init__(self, unet_module, unet_params, sched: Schedule):
        self.unet = unet_module
        self.unet_params = unet_params
        self.schedule = sched
        self.data_dimensionality = unet_module.config.sample_size
        self.latent_channels = unet_module.config.in_channels
        self._jit_cache: Dict[Any, Callable] = {}
        self._mesh = None
        # Bound-method / lambda identities must be stable across calls or the
        # static fields of the pytree closures defeat the jit cache.
        self._unet_apply = unet_module.apply
        # set inline, NOT via the virtual _setup_codec: subclass overrides
        # reference attributes (vae/vqvae) that don't exist yet at this point
        self._encode_closure = EncodeClosure()
        self._decode_closure = DecodeClosure()
        self._decode_closure_remat = DecodeClosure()
        self._decode_proxy = None

    def _setup_codec(self) -> None:
        if self._mesh is not None:
            from ..parallel.edit_shard import SpatialDecodeClosure, SpatialEncodeClosure

            axes = tuple(self._mesh.axis_names)
            # pixel space: identity codec, but keep the latents H-sharded
            self._encode_closure = SpatialEncodeClosure(mesh=self._mesh, axes=axes)
            self._decode_closure = SpatialDecodeClosure(mesh=self._mesh, axes=axes)
            self._decode_closure_remat = self._decode_closure
            return
        self._encode_closure = EncodeClosure()
        self._decode_closure = DecodeClosure()
        self._decode_closure_remat = DecodeClosure()

    def to_mesh(self, mesh) -> "DiffusionWrapper":
        """A shallow copy whose denoiser/codec closures carry the single-image
        latency sharding (`parallel/edit_shard.py`): the CFG pair splits over
        a 'cfg' mesh axis when present, activations shard along H, and the
        batch-1 decode+VJP splits H over the WHOLE mesh. Constraints only —
        sharded == unsharded numerically (tests + driver dryrun). The same
        EditPipeline / generate / invert code then runs partitioned:

            mesh = parallel.cfg_mesh(cfg=2, sp=4)
            pipe = EditPipeline(wrapper.to_mesh(mesh), seg_model)
        """
        import copy

        w = copy.copy(self)
        w._mesh = mesh
        w._jit_cache = {}
        w._decode_proxy = None
        w._setup_codec()
        return w

    # ---- codec boundary --------------------------------------------------
    def encode_fn(self) -> EncodeClosure:
        return self._encode_closure

    def decode_fn(self, remat_blocks: bool = False) -> DecodeClosure:
        """Differentiable latent->image pytree callable for guidance.

        `remat_blocks=True` returns a decode whose VJP checkpoints each
        decoder block (same params; see `models.vae.Decoder`) — required for
        batch>=2 512px guided edits on a 16GB chip."""
        return self._decode_closure_remat if remat_blocks else self._decode_closure

    def guidance_decode_proxy(self, key=None, n: int = 8, refresh: bool = False):
        """Fitted affine latent->RGB proxy codec for guidance
        (`guidance/proxy.py`): the guidance VJP runs through a per-pixel
        affine map instead of the full decoder — opt-in accel, fitted once
        per wrapper (one n-batch decode forward) and cached."""
        if self._decode_proxy is None or refresh:
            from ..guidance.proxy import fit_decode_proxy

            d = self.data_dimensionality
            self._decode_proxy = fit_decode_proxy(
                self.decode_fn(), (d, d, self.latent_channels), key=key, n=n
            )
        return self._decode_proxy

    def encode(self, sample: Array) -> Array:
        return self.encode_fn()(sample)

    def decode(self, latent: Array) -> Array:
        return self.decode_fn()(latent)

    # ---- denoiser --------------------------------------------------------
    def prep_text(self, prompt_ids: Optional[Array]) -> Optional[Array]:
        """Returns stacked [uncond; cond] embeddings, or None (uncond models).
        `src/diffusion_utils.py:136-138` / `diffusion_classes.py:43-44`."""
        return None

    def eps_fn(self, text_emb: Optional[Array] = None, cfg_scale: float = 3.5,
               features: bool = False) -> EpsFn:
        """features=True returns the encoder-propagation closure (full/reuse
        pair — Faster Diffusion, arXiv 2312.09608; `edit_image`'s
        encoder_reuse). Not combined with a mesh (approximation + sharding
        stay orthogonal until measured together)."""
        if features:
            if self._mesh is not None:
                raise ValueError("encoder propagation + to_mesh not supported")
            if text_emb is None:
                return D.EpsFeatClosure(self._unet_apply, self.unet_params)
            return D.CfgEpsFeatClosure(
                self._unet_apply, self.unet_params, text_emb, cfg_scale
            )
        if self._mesh is not None:
            from ..parallel.edit_shard import (
                ShardedEpsClosure,
                make_sharded_cfg_eps_fn,
            )

            if text_emb is None:
                return ShardedEpsClosure(self._unet_apply, self.unet_params, self._mesh)
            return make_sharded_cfg_eps_fn(
                self._unet_apply, self.unet_params, text_emb, cfg_scale, self._mesh
            )
        if text_emb is None:
            return D.make_eps_fn(self._unet_apply, self.unet_params)
        return D.make_cfg_eps_fn(self._unet_apply, self.unet_params, text_emb, cfg_scale)

    # ---- sampling helpers --------------------------------------------------
    def latent_shape(self, batch: int = 1) -> Tuple[int, ...]:
        d = self.data_dimensionality
        return (batch, d, d, self.latent_channels)

    def initialize_random_samples(
        self, key: Array, num_inference_steps: int, eta: float, batch: int = 1
    ) -> Tuple[Array, Optional[Array]]:
        """xt (and zs when eta > 0) — `src/utils.py:40-74`, without the
        hardcoded `.to("cuda")`."""
        k_x, k_z = jax.random.split(key)
        xt = jax.random.normal(k_x, self.latent_shape(batch))
        zs = None
        if eta > 0:
            zs = jax.random.normal(
                k_z, (num_inference_steps,) + self.latent_shape(batch)
            )
        return xt, zs

    # ---- generation API ----------------------------------------------------
    def generate_image(
        self,
        xt: Array,
        eta: float = 0.0,
        zs: Optional[Array] = None,
        num_inference_steps: int = 50,
        prompt_ids: Optional[Array] = None,
        cfg_scale: float = 3.5,
        collect: bool = False,
        mode: str = "fused",
        encoder_reuse: int = 1,
    ) -> Tuple[Array, D.Trajectory]:
        """One denoising run; returns (decoded image NHWC [-1,1], Trajectory).
        `src/base_diffusion.py:49-97` parity.

        mode="fused" (default) runs the whole loop as ONE jitted lax.scan —
        measured faster than the split host loop at the final dispatch
        (round-3 interleaved A/B, `scripts/ab_generation_loop.py`: fused
        21.51 vs split 22.47 ms/step on the SD 512px CFG loop, PARITY.md).
        mode="split" host-loops one jitted step per timestep; it compiles in
        seconds instead of minutes — the right trade for interactive
        one-off runs.

        encoder_reuse=k>1: encoder propagation (Faster Diffusion,
        arXiv 2312.09608; opt-in approximation — k=1 exact)."""
        sched = self._sched_for(num_inference_steps)
        text_emb = self.prep_text(prompt_ids)
        eps_fn = self.eps_fn(text_emb, cfg_scale, features=encoder_reuse > 1)
        dec_fn = self.decode_fn()

        if mode == "split":
            from ..engine.edit import edit_split

            res = edit_split(
                sched, eps_fn, xt, eta=eta, zs=zs, attr_func=None,
                step_rule="ddim", collect=collect, encoder_reuse=encoder_reuse,
            )
            traj = D.Trajectory(
                res.x0, xts=res.xts, model_outputs=res.model_outputs,
                pred_original_samples=res.pred_original_samples,
            )
            return _jit_decode(dec_fn, res.x0), traj

        # eps_fn / dec_fn are pytree callables passed as jit ARGUMENTS so the
        # model weights are traced inputs, never captured constants. The
        # Schedule is likewise a jit argument: its static fields (clip_sample,
        # steps_offset, ...) live in the treedef, so swapping the wrapper's
        # schedule (e.g. with_clip_sample(False)) recompiles instead of
        # silently reusing a stale compilation.
        key = ("gen", eta, zs is not None, collect, encoder_reuse)
        if key not in self._jit_cache:
            def run(sched_, eps_fn_, dec_fn_, xt_, zs_):
                traj = D.generate(sched_, eps_fn_, xt_, eta=eta, zs=zs_,
                                  collect=collect, encoder_reuse=encoder_reuse)
                return dec_fn_(traj.x0), traj

            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key](sched, eps_fn, dec_fn, xt, zs)

    def generate_images(
        self,
        num_images: int = 1,
        eta: float = 0.0,
        num_inference_steps: int = 50,
        seed: Optional[int] = None,
        prompt_ids: Optional[Array] = None,
        cfg_scale: float = 3.5,
        collect: bool = False,
        encoder_reuse: int = 1,
    ):
        """Multi-sample driver (`src/base_diffusion.py:99-148`) — one batched
        call instead of the reference's serial per-image loop."""
        key = jax.random.PRNGKey(0 if seed is None else seed)
        xt, zs = self.initialize_random_samples(
            key, num_inference_steps, eta, batch=num_images
        )
        img, traj = self.generate_image(
            xt, eta=eta, zs=zs, num_inference_steps=num_inference_steps,
            prompt_ids=prompt_ids, cfg_scale=cfg_scale, collect=collect,
            encoder_reuse=encoder_reuse,
        )
        return img, traj, xt, zs

    def _sched_for(self, num_inference_steps: int) -> Schedule:
        if num_inference_steps == self.schedule.num_inference_steps:
            return self.schedule
        return self.schedule.with_num_inference_steps(num_inference_steps)


class DDPM(DiffusionWrapper):
    """Pixel-space model: identity codec (`src/diffusion_classes.py:73-81`)."""

    family = "ddpm"


class LDM(DiffusionWrapper):
    """VQ latent model (`src/diffusion_classes.py:47-70`)."""

    family = "ldm"

    def __init__(self, unet_module, unet_params, sched, vqvae_module, vqvae_params):
        super().__init__(unet_module, unet_params, sched)
        self.vqvae = vqvae_module
        self.vqvae_params = vqvae_params
        self._setup_codec()

    def _setup_codec(self) -> None:
        apply = self.vqvae.apply
        if self._mesh is not None:
            from ..parallel.edit_shard import (
                SpatialDecodeClosure,
                SpatialEncodeClosure,
                spatial_shard,
            )

            axes = tuple(self._mesh.axis_names)
            keep = spatial_shard(self._mesh, axes)
            self._encode_closure = SpatialEncodeClosure(
                lambda p, x: apply(p, x, method="encode"), self.vqvae_params,
                1.0, self._mesh, axes,
            )
            self._decode_closure = SpatialDecodeClosure(
                lambda p, z: apply(p, z, method="decode", shard_fn=keep),
                self.vqvae_params, 1.0, self._mesh, axes,
            )
            self._decode_closure_remat = SpatialDecodeClosure(
                lambda p, z: apply(p, z, remat=True, method="decode", shard_fn=keep),
                self.vqvae_params, 1.0, self._mesh, axes,
            )
            return
        self._encode_closure = EncodeClosure(
            lambda p, x: apply(p, x, method="encode"), self.vqvae_params
        )
        self._decode_closure = DecodeClosure(
            lambda p, z: apply(p, z, method="decode"), self.vqvae_params
        )
        self._decode_closure_remat = DecodeClosure(
            lambda p, z: apply(p, z, remat=True, method="decode"), self.vqvae_params
        )


class SD(DiffusionWrapper):
    """Stable Diffusion: KL-VAE codec with 0.18215 scaling + CLIP text prep
    (`src/diffusion_classes.py:15-44`)."""

    family = "sd"

    def __init__(
        self, unet_module, unet_params, sched, vae_module, vae_params,
        text_module=None, text_params=None, tokenizer=None,
    ):
        super().__init__(unet_module, unet_params, sched)
        self.vae = vae_module
        self.vae_params = vae_params
        self.text_encoder = text_module
        self.text_params = text_params
        self.tokenizer = tokenizer
        self._setup_codec()

    def _setup_codec(self) -> None:
        apply = self.vae.apply
        sf = self.vae.config.scaling_factor
        if self._mesh is not None:
            from ..parallel.edit_shard import (
                SpatialDecodeClosure,
                SpatialEncodeClosure,
                spatial_shard,
            )

            axes = tuple(self._mesh.axis_names)
            # per-stage re-anchor (shard_fn): boundary constraints alone lose
            # the partitioning at the middle decoder stages (PARITY.md r3)
            keep = spatial_shard(self._mesh, axes)
            self._encode_closure = SpatialEncodeClosure(
                lambda p, x: apply(p, x, method="encode"), self.vae_params,
                sf, self._mesh, axes,
            )
            self._decode_closure = SpatialDecodeClosure(
                lambda p, z: apply(p, z, method="decode", shard_fn=keep),
                self.vae_params, sf, self._mesh, axes,
            )
            self._decode_closure_remat = SpatialDecodeClosure(
                lambda p, z: apply(p, z, remat=True, method="decode", shard_fn=keep),
                self.vae_params, sf, self._mesh, axes,
            )
            return
        self._encode_closure = EncodeClosure(
            lambda p, x: apply(p, x, method="encode"), self.vae_params, scale=sf
        )
        self._decode_closure = DecodeClosure(
            lambda p, z: apply(p, z, method="decode"), self.vae_params, scale=sf
        )
        self._decode_closure_remat = DecodeClosure(
            lambda p, z: apply(p, z, remat=True, method="decode"),
            self.vae_params,
            scale=sf,
        )

    def encode_text_ids(self, input_ids: Array) -> Array:
        return self.text_encoder.apply(self.text_params, input_ids)

    def prep_text(self, prompt_ids: Optional[Array]) -> Optional[Array]:
        """prompt_ids: (L,) or (2, L) token ids. A single sequence is paired
        with the unconditional (empty-prompt) encoding, normalized ordering
        [uncond; cond]."""
        if prompt_ids is None:
            return None
        if prompt_ids.ndim == 1:
            if self.tokenizer is None:
                raise ValueError("pairing with the empty prompt requires a tokenizer")
            uncond_ids = jnp.asarray(self.tokenizer.encode(""), jnp.int32)
            prompt_ids = jnp.stack([uncond_ids, prompt_ids])
        return self.encode_text_ids(prompt_ids)
