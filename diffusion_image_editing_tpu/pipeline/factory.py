"""Model factory — `create_diffusion_model` parity (`src/models.py:17-54`).

Builds a DDPM / LDM / SD wrapper from a model-family name, loading weights
from an HF-layout checkpoint directory when given (via `models/port.py`) or
random-initializing the architecture otherwise (smoke/benchmark mode — this
environment has no network egress; the reference downloads from the HF hub).
Also fixes the reference's LDM scheduler-config bug (`models.py:40` passes a
model-id string to `DDIMScheduler.from_config`).
"""

from __future__ import annotations

import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp

from ..core import schedule_for_model
from ..models import (
    CLIP_VIT_L_14_TEXT,
    DDPM_CELEBAHQ_256,
    LDM_CELEBAHQ_256_UNET,
    LDM_CELEBAHQ_VQVAE,
    SD15_UNET,
    SD_VAE,
    AutoencoderKL,
    BiSeNet,
    CLIPTextEncoder,
    ResNet50,
    SegmentationModel,
    UNet2D,
    UNet2DCondition,
    VQModel,
)
from .wrappers import DDPM, LDM, SD, DiffusionWrapper


def create_diffusion_model(
    name: str,
    sample_clipping: bool = True,
    checkpoint_dir: Optional[str] = None,
    num_inference_steps: int = 50,
    dtype=jnp.float32,
) -> DiffusionWrapper:
    """`create_diffusion_model("ddpm"|"ldm"|"sd", sample_clipping)` parity.

    clip_sample semantics follow `src/models.py:28-31,43`: True for synthetic
    DDPM generation, False for real-image editing and LDM; SD never clips.
    """
    clip = sample_clipping if name in ("ddpm", "ldm") else None
    sched = schedule_for_model(name, num_inference_steps, clip)

    def load(kind, subdir, default_cfg):
        if checkpoint_dir is None:
            return default_cfg, None
        from ..models.port import load_checkpoint_dir

        return load_checkpoint_dir(os.path.join(checkpoint_dir, subdir), kind)

    key = jax.random.PRNGKey(0)
    if name == "ddpm":
        cfg, params = load("unet2d", "unet", DDPM_CELEBAHQ_256)
        model = UNet2D(cfg, dtype=dtype)
        if params is None:
            _warn_random_init()
            d = cfg.sample_size
            params = model.init(key, jnp.zeros((1, d, d, cfg.in_channels)), jnp.int32(0))
        return DDPM(model, _as_jnp(params), sched)

    if name == "ldm":
        ucfg, uparams = load("unet2d", "unet", LDM_CELEBAHQ_256_UNET)
        vcfg, vparams = load("vq", "vqvae", LDM_CELEBAHQ_VQVAE)
        unet = UNet2D(ucfg, dtype=dtype)
        vq = VQModel(vcfg, dtype=dtype)
        if uparams is None:
            _warn_random_init()
            d = ucfg.sample_size
            uparams = unet.init(key, jnp.zeros((1, d, d, ucfg.in_channels)), jnp.int32(0))
            vparams = vq.init(key, jnp.zeros((1, vcfg.sample_size, vcfg.sample_size, 3)))
        return LDM(unet, _as_jnp(uparams), sched, vq, _as_jnp(vparams))

    if name == "sd":
        ucfg, uparams = load("unet2d_cond", "unet", SD15_UNET)
        vcfg, vparams = load("vae", "vae", SD_VAE)
        tcfg, tparams = load("clip_text", "text_encoder", CLIP_VIT_L_14_TEXT)
        unet = UNet2DCondition(ucfg, dtype=dtype)
        vae = AutoencoderKL(vcfg, dtype=dtype)
        text = CLIPTextEncoder(tcfg, dtype=dtype)
        tokenizer = None
        if checkpoint_dir is not None:
            from ..host.tokenizer import CLIPTokenizer

            tok_dir = os.path.join(checkpoint_dir, "tokenizer")
            if os.path.isdir(tok_dir):
                tokenizer = CLIPTokenizer.from_pretrained(tok_dir)
        if uparams is None:
            _warn_random_init()
            d = ucfg.sample_size
            uparams = unet.init(
                key, jnp.zeros((1, d, d, 4)), jnp.int32(0),
                jnp.zeros((1, 77, ucfg.cross_attention_dim)),
            )
            vparams = vae.init(key, jnp.zeros((1, 64, 64, 3)))
            tparams = text.init(key, jnp.zeros((1, 77), jnp.int32))
        return SD(
            unet, _as_jnp(uparams), sched, vae, _as_jnp(vparams), text,
            _as_jnp(tparams), tokenizer,
        )
    raise ValueError(f"Unknown model name: {name}")


def create_segmentation_model(
    checkpoint_path: Optional[str] = None, n_classes: int = 19, width: int = 64
) -> SegmentationModel:
    """`SegmentationModel(ckpt)` parity (`src/models.py:80-118`)."""
    module = BiSeNet(n_classes=n_classes, width=width)
    if checkpoint_path is not None:
        from ..models.port import load_bisenet_checkpoint

        variables = jax.tree.map(jnp.asarray, load_bisenet_checkpoint(checkpoint_path))
    else:
        _warn_random_init()
        variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)))
    return SegmentationModel(module, variables)


def get_pretrained_anygan(checkpoint_path: Optional[str] = None, width: int = 64):
    """`get_pretrained_anyGAN()` parity (`src/models.py:57-77`): the ResNet-50
    attribute predictor. Returns (apply_fn(params, imgs)->logits, params)."""
    module = ResNet50(num_outputs=80, width=width)
    if checkpoint_path is not None:
        from ..models.port import load_anygan_checkpoint

        variables = jax.tree.map(jnp.asarray, load_anygan_checkpoint(checkpoint_path))
    else:
        _warn_random_init()
        variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    def apply_fn(params, imgs):
        return module.apply(params, imgs, train=False)

    return apply_fn, variables


def _as_jnp(tree):
    return jax.tree.map(jnp.asarray, tree)


def _warn_random_init():
    print("WARNING: random-init weights (no checkpoint given)", file=sys.stderr)


def save_wrapper_params(wrapper, ckpt_dir: str) -> None:
    """Persist a wrapper's parameter pytrees with Orbax (the `save_pretrained`
    counterpart; reload with `load_wrapper_params`)."""
    import orbax.checkpoint as ocp

    tree = {"unet": wrapper.unet_params}
    if hasattr(wrapper, "vae_params"):
        tree["vae"] = wrapper.vae_params
    if hasattr(wrapper, "vqvae_params"):
        tree["vqvae"] = wrapper.vqvae_params
    if getattr(wrapper, "text_params", None) is not None:
        tree["text"] = wrapper.text_params
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        mgr.save(0, args=ocp.args.PyTreeSave(tree))


def load_wrapper_params(wrapper, ckpt_dir: str):
    """Restore parameter pytrees saved by `save_wrapper_params` into a
    freshly-constructed wrapper (architectures must match)."""
    import orbax.checkpoint as ocp

    template = {"unet": wrapper.unet_params}
    if hasattr(wrapper, "vae_params"):
        template["vae"] = wrapper.vae_params
    if hasattr(wrapper, "vqvae_params"):
        template["vqvae"] = wrapper.vqvae_params
    if getattr(wrapper, "text_params", None) is not None:
        template["text"] = wrapper.text_params
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        restored = mgr.restore(mgr.latest_step(), args=ocp.args.PyTreeRestore(template))
    wrapper.unet_params = restored["unet"]
    if "vae" in restored:
        wrapper.vae_params = restored["vae"]
        wrapper._setup_codec()
    if "vqvae" in restored:
        wrapper.vqvae_params = restored["vqvae"]
        wrapper._setup_codec()
    if "text" in restored:
        wrapper.text_params = restored["text"]
    wrapper._jit_cache.clear()
    return wrapper
