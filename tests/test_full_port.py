"""Full-scale weight-port proof (VERDICT r1 item 1).

Two layers of evidence that `models/port.py` will load the real checkpoints
(google/ddpm-celebahq-256, CompVis/ldm-celebahq-256, runwayml SD-1.5 —
reference `src/models.py:17-54`) unchanged the day they are mountable:

1. Structural (always on): build the config-driven torch mirrors
   (`tests/torch_mirrors.py`) for the FULL production configs on the meta
   device, port their exact diffusers key sets with strict=True, and require
   the resulting pytree to match `jax.eval_shape(model.init)` exactly — key
   coverage in both directions at full topology, a few seconds, no FLOPs.

2. Numeric (DIE_TPU_FULL_PORT=1, slow): real random weights, full-size
   forward through both frameworks, allclose. Run via `make test-full-port`;
   measured tolerances are recorded in PARITY.md.

transformers IS installed, so CLIP uses the real `CLIPTextModel` with the
SD-1.5 text config — exact upstream keys and semantics, not a mirror.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusion_image_editing_tpu.models import (
    CLIP_VIT_L_14_TEXT,
    DDPM_CELEBAHQ_256,
    LDM_CELEBAHQ_256_UNET,
    LDM_CELEBAHQ_VQVAE,
    SD15_UNET,
    SD_VAE,
    AutoencoderKL,
    CLIPTextEncoder,
    UNet2D,
    UNet2DCondition,
    VQModel,
)
from diffusion_image_editing_tpu.models.port import port_state_dict

import torch_mirrors as tm

full_port = pytest.mark.skipif(
    not os.environ.get("DIE_TPU_FULL_PORT"),
    reason="full-size numeric parity is slow; set DIE_TPU_FULL_PORT=1",
)


def _flat_shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat_shapes(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = tuple(v.shape)
    return out


def _meta_state_shapes(module):
    return {k: np.zeros(tuple(v.shape), np.float32)
            for k, v in module.state_dict().items()}


def _assert_port_covers_init(sd, kind, init_shapes):
    ported = port_state_dict(sd, kind, strict=True)  # no unmapped torch keys
    got = _flat_shapes(ported["params"])
    ref = _flat_shapes(init_shapes["params"])
    missing = sorted(set(ref) - set(got))
    extra = sorted(set(got) - set(ref))
    assert not missing and not extra, {"missing": missing[:8], "extra": extra[:8]}
    mismatched = {k: (ref[k], got[k]) for k in ref if ref[k] != got[k]}
    assert not mismatched, dict(list(mismatched.items())[:8])


# --------------------------------------------------------------------------
# structural: full production configs, meta device, shape-only
# --------------------------------------------------------------------------


def test_full_ddpm_celebahq_unet_key_coverage():
    with torch.device("meta"):
        mirror = tm.TorchUNet2D(DDPM_CELEBAHQ_256, attn_naming="legacy")
    model = UNet2D(DDPM_CELEBAHQ_256)
    init_shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    _assert_port_covers_init(_meta_state_shapes(mirror), "unet2d", init_shapes)


def test_full_ldm_celebahq_unet_key_coverage():
    # multi-head legacy attention (attention_head_dim=32) + modern naming too
    for naming in ("legacy", "modern"):
        with torch.device("meta"):
            mirror = tm.TorchUNet2D(LDM_CELEBAHQ_256_UNET, attn_naming=naming)
        model = UNet2D(LDM_CELEBAHQ_256_UNET)
        init_shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jax.ShapeDtypeStruct((1, 16, 16, 3), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.int32),
        )
        _assert_port_covers_init(_meta_state_shapes(mirror), "unet2d", init_shapes)


def test_full_sd15_unet_key_coverage():
    with torch.device("meta"):
        mirror = tm.TorchUNet2DCondition(SD15_UNET)
    model = UNet2DCondition(SD15_UNET)
    init_shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 16, 16, 4), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((1, 77, 768), jnp.float32),
    )
    _assert_port_covers_init(_meta_state_shapes(mirror), "unet2d_cond", init_shapes)


def test_full_sd_vae_key_coverage():
    for naming in ("modern", "legacy"):
        with torch.device("meta"):
            mirror = tm.TorchAutoencoderKL(SD_VAE, attn_naming=naming)
        model = AutoencoderKL(SD_VAE)
        init_shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32),
        )
        _assert_port_covers_init(_meta_state_shapes(mirror), "vae", init_shapes)


def test_full_ldm_vqvae_key_coverage():
    with torch.device("meta"):
        mirror = tm.TorchVQModel(LDM_CELEBAHQ_VQVAE, attn_naming="legacy")
    model = VQModel(LDM_CELEBAHQ_VQVAE)
    init_shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32),
    )
    _assert_port_covers_init(_meta_state_shapes(mirror), "vq", init_shapes)


def _hf_clip_sd15():
    from transformers import CLIPTextConfig as HFCLIPTextConfig
    from transformers import CLIPTextModel

    hf_cfg = HFCLIPTextConfig(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    return CLIPTextModel(hf_cfg).eval()


def test_full_clip_text_key_coverage_and_numerics():
    """Real transformers CLIPTextModel (SD-1.5 text config): exact upstream
    keys AND full-size numeric forward parity (fast enough to always run)."""
    hf = _hf_clip_sd15()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = port_state_dict(sd, "clip_text", strict=True)

    model = CLIPTextEncoder(CLIP_VIT_L_14_TEXT)
    init_shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 77), jnp.int32),
    )
    got = _flat_shapes(params["params"])
    ref = _flat_shapes(init_shapes["params"])
    assert set(got) == set(ref) and all(got[k] == ref[k] for k in ref)

    ids = np.zeros((2, 77), np.int64)
    ids[0, :5] = [49406, 320, 1125, 539, 49407]
    ids[1, :3] = [49406, 1125, 49407]
    with torch.no_grad():
        ref_out = hf(torch.tensor(ids)).last_hidden_state.numpy()
    out = np.asarray(
        model.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(ids, jnp.int32))
    )
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-4)


# --------------------------------------------------------------------------
# numeric: full-size forwards (slow; DIE_TPU_FULL_PORT=1)
# --------------------------------------------------------------------------


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


@full_port
def test_full_ddpm_celebahq_unet_numeric_parity():
    torch.manual_seed(0)
    mirror = tm.TorchUNet2D(DDPM_CELEBAHQ_256, attn_naming="legacy").eval()
    params = port_state_dict(
        {k: v.numpy() for k, v in mirror.state_dict().items()}, "unet2d"
    )
    x = np.random.RandomState(0).normal(size=(1, 3, 256, 256)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = mirror(torch.tensor(x), torch.tensor([501])).numpy()
    out = UNet2D(DDPM_CELEBAHQ_256).apply(
        jax.tree.map(jnp.asarray, params), _nhwc(x), jnp.int32(501)
    )
    np.testing.assert_allclose(_nchw(out), ref, rtol=1e-2, atol=1e-3)


@full_port
def test_full_ldm_celebahq_unet_numeric_parity():
    torch.manual_seed(1)
    mirror = tm.TorchUNet2D(LDM_CELEBAHQ_256_UNET, attn_naming="legacy").eval()
    params = port_state_dict(
        {k: v.numpy() for k, v in mirror.state_dict().items()}, "unet2d"
    )
    x = np.random.RandomState(1).normal(size=(1, 3, 64, 64)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = mirror(torch.tensor(x), torch.tensor([501])).numpy()
    out = UNet2D(LDM_CELEBAHQ_256_UNET).apply(
        jax.tree.map(jnp.asarray, params), _nhwc(x), jnp.int32(501)
    )
    np.testing.assert_allclose(_nchw(out), ref, rtol=1e-2, atol=1e-3)


@full_port
def test_full_sd15_unet_numeric_parity_via_sharded_checkpoint_dir(tmp_path):
    """Full SD-1.5 UNet through the ENTIRE loading path: mirror state dict ->
    sharded safetensors + index.json + config.json (HF layout) ->
    load_checkpoint_dir -> forward parity."""
    from safetensors.numpy import save_file

    from diffusion_image_editing_tpu.models.port import load_checkpoint_dir

    torch.manual_seed(2)
    mirror = tm.TorchUNet2DCondition(SD15_UNET).eval()
    sd = {k: v.numpy() for k, v in mirror.state_dict().items()}

    model_dir = tmp_path / "unet"
    model_dir.mkdir()
    cfg_json = dict(
        sample_size=64, in_channels=4, out_channels=4,
        block_out_channels=[320, 640, 1280, 1280],
        down_block_types=["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"],
        up_block_types=["UpBlock2D"] + ["CrossAttnUpBlock2D"] * 3,
        layers_per_block=2, attention_head_dim=8, cross_attention_dim=768,
        norm_num_groups=32, norm_eps=1e-5, flip_sin_to_cos=True, freq_shift=0,
    )
    (model_dir / "config.json").write_text(json.dumps(cfg_json))
    keys = sorted(sd)
    half = len(keys) // 2
    shards = {
        "diffusion_pytorch_model-00001-of-00002.safetensors": keys[:half],
        "diffusion_pytorch_model-00002-of-00002.safetensors": keys[half:],
    }
    weight_map = {}
    for fname, ks in shards.items():
        save_file({k: sd[k] for k in ks}, str(model_dir / fname))
        weight_map.update({k: fname for k in ks})
    (model_dir / "diffusion_pytorch_model.safetensors.index.json").write_text(
        json.dumps({"weight_map": weight_map})
    )

    cfg, params = load_checkpoint_dir(str(model_dir), "unet2d_cond")
    assert cfg.block_out_channels == (320, 640, 1280, 1280)

    x = np.random.RandomState(2).normal(size=(1, 4, 64, 64)).astype(np.float32) * 0.5
    ctx = np.random.RandomState(3).normal(size=(1, 77, 768)).astype(np.float32)
    with torch.no_grad():
        ref = mirror(torch.tensor(x), torch.tensor([501]), torch.tensor(ctx)).numpy()
    out = UNet2DCondition(cfg).apply(
        jax.tree.map(jnp.asarray, params), _nhwc(x), jnp.int32(501), jnp.asarray(ctx)
    )
    np.testing.assert_allclose(_nchw(out), ref, rtol=1e-2, atol=1e-3)


@full_port
def test_full_sd_vae_numeric_parity():
    torch.manual_seed(3)
    mirror = tm.TorchAutoencoderKL(SD_VAE, attn_naming="modern").eval()
    params = port_state_dict(
        {k: v.numpy() for k, v in mirror.state_dict().items()}, "vae"
    )
    model = AutoencoderKL(SD_VAE)
    jp = jax.tree.map(jnp.asarray, params)
    x = np.random.RandomState(4).normal(size=(1, 3, 256, 256)).astype(np.float32) * 0.5
    with torch.no_grad():
        z_ref = mirror.encode_mode(torch.tensor(x))
        rec_ref = mirror.decode(z_ref).numpy()
        z_ref = z_ref.numpy()
    z = model.apply(jp, _nhwc(x), method="encode")
    np.testing.assert_allclose(_nchw(z), z_ref, rtol=1e-2, atol=1e-3)
    rec = model.apply(jp, z, method="decode")
    np.testing.assert_allclose(_nchw(rec), rec_ref, rtol=1e-2, atol=1e-3)


@full_port
def test_full_ldm_vqvae_numeric_parity():
    torch.manual_seed(4)
    mirror = tm.TorchVQModel(LDM_CELEBAHQ_VQVAE, attn_naming="legacy").eval()
    params = port_state_dict(
        {k: v.numpy() for k, v in mirror.state_dict().items()}, "vq"
    )
    model = VQModel(LDM_CELEBAHQ_VQVAE)
    jp = jax.tree.map(jnp.asarray, params)
    x = np.random.RandomState(5).normal(size=(1, 3, 128, 128)).astype(np.float32) * 0.5
    with torch.no_grad():
        z_ref = mirror.encode(torch.tensor(x))
        rec_ref = mirror.decode(z_ref).numpy()
        z_ref = z_ref.numpy()
    z = model.apply(jp, _nhwc(x), method="encode")
    np.testing.assert_allclose(_nchw(z), z_ref, rtol=1e-2, atol=1e-3)
    rec = model.apply(jp, jnp.asarray(_nhwc(z_ref)), method="decode")
    np.testing.assert_allclose(_nchw(rec), rec_ref, rtol=1e-2, atol=1e-3)
