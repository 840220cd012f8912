"""CFG-pair + spatial sharding of the single-image guided edit step.

Runs on the 8-virtual-device CPU mesh (conftest). The sharded closures must
be numerically identical to the unsharded ones — sharding constraints change
placement, never math.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_image_editing_tpu.core import make_schedule
from diffusion_image_editing_tpu.engine import make_cfg_eps_fn
from diffusion_image_editing_tpu.engine.edit import edit_split
from diffusion_image_editing_tpu.guidance import SingleColorAttrFunc
from diffusion_image_editing_tpu.models import (
    AutoencoderConfig,
    AutoencoderKL,
    UNet2DCondition,
    UNet2DConditionConfig,
)
from diffusion_image_editing_tpu.engine.denoise import DecodeClosure
from diffusion_image_editing_tpu.parallel import (
    cfg_mesh,
    make_sharded_cfg_eps_fn,
    shard_decode_fn,
)

STEPS = 3


def _setup():
    ucfg = UNet2DConditionConfig(
        sample_size=16,
        block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1,
        attention_head_dim=2,
        cross_attention_dim=16,
        norm_num_groups=8,
    )
    vcfg = AutoencoderConfig(
        latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
        norm_num_groups=4, sample_size=32,
    )
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(vcfg)
    k = jax.random.PRNGKey(0)
    uparams = unet.init(k, jnp.zeros((1, 16, 16, 4)), jnp.int32(0), jnp.zeros((1, 7, 16)))
    vparams = vae.init(jax.random.fold_in(k, 1), jnp.zeros((1, 32, 32, 3)))
    text_emb = jax.random.normal(jax.random.fold_in(k, 2), (2, 7, 16))
    sched = make_schedule(num_inference_steps=STEPS, clip_sample=False)
    vae_apply = vae.apply
    decode_fn = DecodeClosure(
        lambda p, z: vae_apply(p, z, method="decode"), vparams, scale=0.18215
    )
    return unet, uparams, vae, vparams, text_emb, sched, decode_fn


def test_cfg_pair_sharded_eps_matches_unsharded():
    unet, uparams, _, _, text_emb, _, _ = _setup()
    mesh = cfg_mesh(cfg=2, sp=4)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 4))
    t = jnp.int32(500)

    plain = make_cfg_eps_fn(unet.apply, uparams, text_emb, cfg_scale=3.5)
    sharded = make_sharded_cfg_eps_fn(unet.apply, uparams, text_emb, 3.5, mesh)

    e0 = jax.jit(lambda f, x_, t_: f(x_, t_))(plain, x, t)
    e1 = jax.jit(lambda f, x_, t_: f(x_, t_))(sharded, x, t)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), rtol=2e-5, atol=2e-5)


def test_sharded_guided_edit_step_parity():
    """Full guided edit (denoise + VAE-grad guidance) over the cfg x sp mesh
    equals the single-device run — the flagship SD-architecture edit under a
    mesh (VERDICT item 3)."""
    unet, uparams, _, _, text_emb, sched, decode_fn = _setup()
    mesh = cfg_mesh(cfg=2, sp=4)
    xt = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 4))
    attr = SingleColorAttrFunc(target=0.8, color_idx=0, loss_scale=5.0, t1=0, t2=STEPS)

    plain_eps = make_cfg_eps_fn(unet.apply, uparams, text_emb, cfg_scale=3.5)
    out_plain = edit_split(
        sched, plain_eps, xt, attr_func=attr, decode_fn=decode_fn
    ).x0

    sharded_eps = make_sharded_cfg_eps_fn(unet.apply, uparams, text_emb, 3.5, mesh)
    sharded_dec = shard_decode_fn(decode_fn, mesh)
    out_sharded = edit_split(
        sched, sharded_eps, xt, attr_func=attr, decode_fn=sharded_dec
    ).x0

    assert np.isfinite(np.asarray(out_sharded)).all()
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_sharded), rtol=5e-5, atol=5e-5
    )


def test_shard_fn_threaded_decoder_parity():
    """Per-stage `spatial_shard` re-anchoring inside the decoder (the fix for
    GSPMD dropping 'sp' at the middle decoder resolutions, PARITY.md r3) is a
    placement-only change: decode and its VJP must match the unsharded run."""
    from diffusion_image_editing_tpu.parallel import spatial_shard

    _, _, vae, vparams, _, _, decode_fn = _setup()
    mesh = cfg_mesh(cfg=2, sp=4)
    vae_apply = vae.apply
    keep = spatial_shard(mesh)
    sharded_dec = shard_decode_fn(
        decode_fn, mesh,
        apply_fn=lambda p, z: vae_apply(p, z, method="decode", shard_fn=keep),
    )
    z = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 16, 4))

    out_plain = jax.jit(lambda f, z_: f(z_))(decode_fn, z)
    out_sharded = jax.jit(lambda f, z_: f(z_))(sharded_dec, z)
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_sharded), rtol=2e-5, atol=2e-5
    )

    def loss_plain(z_):
        return jnp.sum(decode_fn(z_) ** 2)

    def loss_sharded(z_):
        return jnp.sum(sharded_dec(z_) ** 2)

    g0 = jax.jit(jax.grad(loss_plain))(z)
    g1 = jax.jit(jax.grad(loss_sharded))(z)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=5e-5, atol=5e-5)


def test_full_mesh_decode_parity():
    """H split over BOTH mesh axes (the batch-1 decode has no CFG pair; an
    'sp'-only split leaves 'cfg' idle and duplicates the decode fwd+VJP per
    cfg group — 1.78x per-device FLOPs at real shapes, r04 projection).
    Placement-only: decode and its VJP must match the unsharded run."""
    from diffusion_image_editing_tpu.parallel import spatial_shard

    _, _, vae, vparams, _, _, decode_fn = _setup()
    mesh = cfg_mesh(cfg=2, sp=4)
    vae_apply = vae.apply
    axes = tuple(mesh.axis_names)
    keep = spatial_shard(mesh, axes)
    sharded_dec = shard_decode_fn(
        decode_fn, mesh,
        apply_fn=lambda p, z: vae_apply(p, z, method="decode", shard_fn=keep),
        axes=axes,
    )
    z = jax.random.normal(jax.random.PRNGKey(9), (1, 16, 16, 4))

    out_plain = jax.jit(lambda f, z_: f(z_))(decode_fn, z)
    out_sharded = jax.jit(lambda f, z_: f(z_))(sharded_dec, z)
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_sharded), rtol=2e-5, atol=2e-5
    )

    def loss_plain(z_):
        return jnp.sum(decode_fn(z_) ** 2)

    def loss_sharded(z_):
        return jnp.sum(sharded_dec(z_) ** 2)

    g0 = jax.jit(jax.grad(loss_plain))(z)
    g1 = jax.jit(jax.grad(loss_sharded))(z)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=5e-5, atol=5e-5)


def test_to_mesh_pipeline_parity_sd():
    """`wrapper.to_mesh(mesh)` makes the PUBLIC pipeline API run sharded
    (CFG pair over 'cfg', activations/codec H over the mesh) with closures
    swapped under the hood — prepare_real_image_edit + edit_image must equal
    the unsharded wrapper bit-for-tolerance."""
    from diffusion_image_editing_tpu.models import CLIPTextEncoder
    from diffusion_image_editing_tpu.models.clip_text import CLIPTextConfig
    from diffusion_image_editing_tpu.pipeline import EditPipeline
    from diffusion_image_editing_tpu.pipeline.wrappers import SD

    unet, uparams, vae, vparams, _, sched, _ = _setup()
    tcfg = CLIPTextConfig(vocab_size=64, hidden_size=16, num_layers=1,
                          num_heads=2, intermediate_size=32,
                          max_position_embeddings=16)
    text = CLIPTextEncoder(tcfg)
    tparams = text.init(jax.random.PRNGKey(5), jnp.zeros((1, 7), jnp.int32))
    sd = SD(unet, uparams, sched, vae, vparams, text, tparams)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, (2, 7)), jnp.int32
    )
    img = jax.random.normal(jax.random.PRNGKey(6), (1, 32, 32, 3)) * 0.2

    def run(wrapper):
        pipe = EditPipeline(wrapper)
        xt, _, _, _, _ = pipe.prepare_real_image_edit(
            img, eta=0.0, inversion_method="ddim", prompt_ids=ids, cfg_scale=2.0
        )
        attr = SingleColorAttrFunc(target=0.9, color_idx=0, loss_scale=5.0,
                                   t1=0, t2=STEPS)
        out = pipe.edit_image(xt, attr_func=attr, prompt_ids=ids,
                              cfg_scale=2.0, collect=False)
        return out.imgs

    plain = run(sd)
    sharded = run(sd.to_mesh(cfg_mesh(cfg=2, sp=4)))
    assert np.isfinite(np.asarray(sharded)).all()
    np.testing.assert_allclose(np.asarray(plain), np.asarray(sharded),
                               rtol=2e-4, atol=2e-5)


def test_to_mesh_pipeline_parity_ddpm_uncond():
    """DDPM (no CFG pair): to_mesh shards H over the whole mesh via
    ShardedEpsClosure + identity spatial codec; masked resynthesis edit
    through the public API must match unsharded."""
    from jax.sharding import Mesh

    from diffusion_image_editing_tpu.core import make_schedule
    from diffusion_image_editing_tpu.models import TINY_UNET2D, UNet2D
    from diffusion_image_editing_tpu.pipeline import DDPM, EditPipeline

    sched = make_schedule(num_inference_steps=STEPS, clip_sample=False)
    model = UNet2D(TINY_UNET2D)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.int32(0))
    ddpm = DDPM(model, params, sched)
    img = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 16, 3)) * 0.2

    def run(wrapper):
        pipe = EditPipeline(wrapper)
        xt, zs, xts, _, _ = pipe.prepare_real_image_edit(
            img, eta=1.0, inversion_method="ddpm", key=jax.random.PRNGKey(8)
        )
        attr = SingleColorAttrFunc(target=0.9, color_idx=0, loss_scale=5.0,
                                   t1=0, t2=STEPS)
        out = pipe.edit_image(xt, eta=1.0, zs=zs, xts=xts, attr_func=attr,
                              inversion_method="ddpm", t_skip=1, collect=False)
        return out.imgs

    plain = run(ddpm)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("sp",))
    sharded = run(ddpm.to_mesh(mesh))
    assert np.isfinite(np.asarray(sharded)).all()
    np.testing.assert_allclose(np.asarray(plain), np.asarray(sharded),
                               rtol=2e-4, atol=2e-5)
