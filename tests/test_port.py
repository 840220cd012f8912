"""Port-tool tests: build diffusers-named state dicts from our Flax param
trees via an inverse name map, port them back, and require exact structural,
shape, and numeric equality. Verifies the name translation is a bijection and
every transpose is correct (real-checkpoint parity additionally needs the HF
weights, which are absent in this environment)."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_image_editing_tpu.models import (
    TINY_CLIP_TEXT,
    TINY_SD_UNET,
    TINY_UNET2D,
    CLIPTextEncoder,
    UNet2D,
    UNet2DCondition,
)
from diffusion_image_editing_tpu.models.port import port_state_dict


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _block_name(part):
    m = re.match(r"(down|up)_(\d+)_resnet_(\d+)$", part)
    if m:
        return f"{m.group(1)}_blocks.{m.group(2)}.resnets.{m.group(3)}"
    m = re.match(r"(down|up)_(\d+)_attn_(\d+)$", part)
    if m:
        return f"{m.group(1)}_blocks.{m.group(2)}.attentions.{m.group(3)}"
    m = re.match(r"down_(\d+)_downsample$", part)
    if m:
        return f"down_blocks.{m.group(1)}.downsamplers.0"
    m = re.match(r"up_(\d+)_upsample$", part)
    if m:
        return f"up_blocks.{m.group(1)}.upsamplers.0"
    m = re.match(r"mid_resnet_(\d+)$", part)
    if m:
        return f"mid_block.resnets.{m.group(1)}"
    if part == "mid_attn":
        return "mid_block.attentions.0"
    m = re.match(r"block_(\d+)$", part)
    if m:
        return f"transformer_blocks.{m.group(1)}"
    m = re.match(r"layer_(\d+)$", part)
    if m:
        return f"encoder.layers.{m.group(1)}"
    return part


_LEAF = {
    "norm1_scale": ("norm1.weight", "none"),
    "norm1_bias": ("norm1.bias", "none"),
    "norm2_scale": ("norm2.weight", "none"),
    "norm2_bias": ("norm2.bias", "none"),
    "group_norm_scale": ("group_norm.weight", "none"),
    "group_norm_bias": ("group_norm.bias", "none"),
}


def _leaf_name(parts, leaf, arr):
    """flax (path, leaf) -> (torch key suffix, transform)."""
    if leaf in _LEAF:
        return _LEAF[leaf]
    if leaf == "kernel":
        if arr.ndim == 4:
            return ("weight", "conv")
        return ("weight", "linear")
    if leaf == "bias":
        return ("bias", "none")
    if leaf == "scale":  # GroupNorm/LayerNorm module param
        return ("weight", "none")
    if leaf == "embedding":
        if parts and parts[-1] == "quantize":  # VQ codebook keeps its name
            return ("embedding.weight", "none")
        return ("weight", "none")
    raise AssertionError(f"unknown leaf {leaf} at {parts}")


# AttentionBlock2D params keep the legacy diffusers names (query/key/value/
# proj_attn — also accepted by the port); Transformer2D params use the current
# to_q/to_k/to_v/to_out.0 names.
_RENAME = {
    "to_out": "to_out.0", "ff.proj": "ff.net.0.proj", "ff.out": "ff.net.2",
}


def make_torch_state_dict(flax_params, kind):
    """Inverse of port_state_dict's name map (current diffusers namings)."""
    sd = {}
    for path, arr in _flatten(flax_params["params"]).items():
        *parts, leaf = path
        suffix, transform = _leaf_name(parts, leaf, np.asarray(arr))
        name_parts = [_block_name(p) for p in parts]
        key = ".".join(name_parts + [suffix]) if name_parts else suffix
        for old, new in _RENAME.items():
            key = re.sub(rf"(^|\.){re.escape(old)}\.", rf"\1{new}.", key)
        # proj_in/proj_out in Transformer2D are 1x1 convs stored 4-D in torch
        a = np.asarray(arr)
        if transform == "conv":
            a = np.transpose(a, (3, 2, 0, 1))  # HWIO -> OIHW
        elif transform == "linear":
            a = np.transpose(a)
        if kind == "clip_text":
            key = re.sub(r"\.(fc1|fc2)\.", r".mlp.\1.", key)
            if key.startswith("token_embedding") or key.startswith("position_embedding"):
                key = "embeddings." + key
        # use fresh random values (not the flax init) to catch transposes
        sd[key] = np.random.RandomState(abs(hash(key)) % (2**31)).normal(
            size=a.shape
        ).astype(np.float32)
    return sd


def _assert_tree_equal_to_ported(flax_params, sd, kind):
    ported = port_state_dict(sd, kind)
    ref = _flatten(flax_params["params"])
    got = _flatten(ported["params"])
    assert set(ref.keys()) == set(got.keys()), (
        sorted(set(ref) - set(got))[:5],
        sorted(set(got) - set(ref))[:5],
    )
    for k in ref:
        assert np.asarray(ref[k]).shape == np.asarray(got[k]).shape, k


def test_port_unet2d_bijective():
    model = UNet2D(TINY_UNET2D)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.int32(0))
    sd = make_torch_state_dict(params, "unet2d")
    _assert_tree_equal_to_ported(params, sd, "unet2d")
    # model must run with the ported params
    ported = port_state_dict(sd, "unet2d")
    out = model.apply(
        jax.tree.map(jnp.asarray, ported), jnp.zeros((1, 16, 16, 3)), jnp.int32(5)
    )
    assert out.shape == (1, 16, 16, 3)


def test_port_unet2d_cond_bijective():
    model = UNet2DCondition(TINY_SD_UNET)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.int32(0), jnp.zeros((1, 8, 32))
    )
    sd = make_torch_state_dict(params, "unet2d_cond")
    _assert_tree_equal_to_ported(params, sd, "unet2d_cond")
    ported = port_state_dict(sd, "unet2d_cond")
    out = UNet2DCondition(TINY_SD_UNET).apply(
        jax.tree.map(jnp.asarray, ported),
        jnp.zeros((1, 8, 8, 4)), jnp.int32(5), jnp.zeros((1, 8, 32)),
    )
    assert out.shape == (1, 8, 8, 4)


def test_port_clip_text_bijective():
    model = CLIPTextEncoder(TINY_CLIP_TEXT)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    sd = make_torch_state_dict(params, "clip_text")
    sd["text_model.embeddings.position_ids"] = np.arange(16)[None]  # ignored buffer
    _assert_tree_equal_to_ported(params, sd, "clip_text")


def test_port_rejects_unknown_keys():
    with pytest.raises(ValueError):
        port_state_dict({"bogus.weight": np.zeros((2, 2))}, "unet2d")


def test_conv_transpose_numerics():
    """torch Conv2d and flax Conv with the ported kernel agree numerically."""
    import torch

    conv = torch.nn.Conv2d(3, 5, 3, padding=1)
    x = np.random.RandomState(0).normal(size=(1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = conv(torch.tensor(x)).numpy()

    from flax import linen as nn

    fconv = nn.Conv(5, (3, 3), padding=1)
    kernel = np.transpose(conv.weight.detach().numpy(), (2, 3, 1, 0))
    params = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(conv.bias.detach().numpy())}}
    out = fconv.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-5
    )


def test_port_vae_kl_bijective():
    from diffusion_image_editing_tpu.models import AutoencoderConfig, AutoencoderKL

    cfg = AutoencoderConfig(
        latent_channels=4, block_out_channels=(16, 32), layers_per_block=1,
        norm_num_groups=8, sample_size=16,
    )
    model = AutoencoderKL(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    sd = make_torch_state_dict(params, "vae")
    _assert_tree_equal_to_ported(params, sd, "vae")


def test_port_vq_bijective():
    from diffusion_image_editing_tpu.models import AutoencoderConfig, VQModel

    cfg = AutoencoderConfig(
        latent_channels=3, block_out_channels=(16,), layers_per_block=1,
        norm_num_groups=8, sample_size=16, double_z=False,
        num_vq_embeddings=16, vq_embed_dim=3,
    )
    model = VQModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    sd = make_torch_state_dict(params, "vq")
    _assert_tree_equal_to_ported(params, sd, "vq")
