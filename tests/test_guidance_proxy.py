"""Proxy guidance codec (guidance/proxy.py) + cond-gated window/stride.

The proxy is an opt-in accel: the guidance VJP runs through a fitted affine
latent->RGB map instead of the full VAE decoder (exact for an affine
decoder — pinned here). The cond-gated window is numerically identical to
the reference's masked nudge (`src/attr_functions.py:120-163`) but skips
the VJP compute entirely outside [t1, t2) / on strided-off steps.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_image_editing_tpu.core import make_schedule
from diffusion_image_editing_tpu.engine.denoise import DecodeClosure
from diffusion_image_editing_tpu.guidance import (
    MultiColorAttrFunc,
    ProxyDecodeClosure,
    SingleColorAttrFunc,
    fit_decode_proxy,
)

STEPS = 6


def _affine_decoder(key, c_in=4, c_out=3, up=2):
    kw, kb = jax.random.split(key)
    w = jax.random.normal(kw, (c_in, c_out)) * 0.3
    b = jax.random.normal(kb, (c_out,)) * 0.1
    return ProxyDecodeClosure(w=w, b=b, up=up)


def test_fit_recovers_affine_decoder_exactly():
    true = _affine_decoder(jax.random.PRNGKey(0))
    fit = fit_decode_proxy(true, (8, 8, 4), key=jax.random.PRNGKey(1), n=4)
    assert fit.up == 2
    np.testing.assert_allclose(np.asarray(fit.w), np.asarray(true.w), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fit.b), np.asarray(true.b), atol=1e-4)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4))
    np.testing.assert_allclose(
        np.asarray(fit(z)), np.asarray(true(z)), atol=1e-4
    )


def test_proxy_guidance_matches_full_for_affine_decoder():
    sched = make_schedule(num_inference_steps=STEPS)
    true = _affine_decoder(jax.random.PRNGKey(3))
    fit = fit_decode_proxy(true, (8, 8, 4), key=jax.random.PRNGKey(4), n=4)
    attr = MultiColorAttrFunc(
        r_target=0.8, g_target=0.1, b_target=0.1, loss_scale=10.0, t1=0, t2=STEPS
    )
    xt = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(6), (1, 8, 8, 4))
    t = sched.timesteps[2]
    a, _ = attr.apply(xt, None, eps, t, jnp.int32(2), sched, true)
    b, _ = attr.apply(xt, None, eps, t, jnp.int32(2), sched, fit)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    # and the nudge actually moved xt
    assert float(jnp.max(jnp.abs(a - xt))) > 0


def test_cond_window_skips_outside_and_strides():
    sched = make_schedule(num_inference_steps=STEPS)
    dec = DecodeClosure()  # identity codec (pixel space)
    attr = SingleColorAttrFunc(
        target=1.0, color_idx=0, loss_scale=5.0, t1=1, t2=4, stride=2
    )
    xt = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 3))
    eps = jax.random.normal(jax.random.PRNGKey(8), (1, 8, 8, 3))
    t = sched.timesteps[2]
    for idx, active in [(0, False), (1, False), (2, True), (3, False), (4, False)]:
        out, _ = attr.apply(xt, None, eps, t, jnp.int32(idx), sched, dec)
        moved = float(jnp.max(jnp.abs(out - xt))) > 0
        assert moved == active, f"idx={idx}: moved={moved}, want {active}"
    # stride=1 cond form == the reference masked form on an in-window step
    ref = SingleColorAttrFunc(target=1.0, color_idx=0, loss_scale=5.0, t1=1, t2=4)
    a, _ = ref.apply(xt, None, eps, t, jnp.int32(2), sched, dec)
    b, _ = attr.apply(xt, None, eps, t, jnp.int32(2), sched, dec)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_batched_window_leaves_still_broadcast():
    # t1/t2 passed as (B,) leaves directly to `apply` (not apply_batched):
    # the where-mask fallback path must keep working
    sched = make_schedule(num_inference_steps=STEPS)
    dec = DecodeClosure()
    t1 = jnp.array([0, 3])
    attr = SingleColorAttrFunc(
        target=1.0, color_idx=0, loss_scale=5.0,
        t1=t1[:, None, None, None], t2=STEPS,
    )
    xt = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 8, 3))
    eps = jax.random.normal(jax.random.PRNGKey(10), (2, 8, 8, 3))
    out, _ = attr.apply(xt, None, eps, sched.timesteps[2], jnp.int32(1), sched, dec)
    # sample 0 in window (t1=0), sample 1 not (t1=3)
    assert float(jnp.max(jnp.abs(out[0] - xt[0]))) > 0
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(xt[1]))


def test_pipeline_guidance_codec_proxy_runs_and_caches():
    from tests.test_pipeline import fake_segmentation, make_sd
    from diffusion_image_editing_tpu.pipeline import EditPipeline

    w = make_sd()
    pipe = EditPipeline(w, fake_segmentation)
    img = jax.random.normal(jax.random.PRNGKey(11), (1, 32, 32, 3)) * 0.1
    prompt_ids = jnp.zeros((2, 8), jnp.int32)
    xt, zs, xts, mask, _ = pipe.prepare_real_image_edit(
        img, eta=0.0, inversion_method="ddim", classes=[17], prompt_ids=prompt_ids
    )
    attr = SingleColorAttrFunc(target=1.0, color_idx=0, loss_scale=5.0, t1=0, t2=STEPS)
    out = pipe.edit_image(
        xt, eta=0.0, mask=mask, attr_func=attr, prompt_ids=prompt_ids,
        guidance_codec="proxy", mode="split",
    )
    assert out.imgs.shape == (1, 32, 32, 3)
    assert not bool(jnp.any(jnp.isnan(out.imgs)))
    p1 = w.guidance_decode_proxy()
    p2 = w.guidance_decode_proxy()
    assert p1 is p2  # fitted once, cached
    assert p1.up == 4  # 32px image / 8px latent


def test_netattrfunc_composes_with_proxy_codec():
    # seg guidance through the proxy codec: BiSeNet consumes proxy-decoded
    # images; only the decode-VJP term is replaced (the fast e2e_seg
    # operating point in bench.phase_e2e_seg(fast=True))
    from diffusion_image_editing_tpu.core import make_schedule
    from diffusion_image_editing_tpu.guidance import NetAttrFunc
    from diffusion_image_editing_tpu.models.bisenet import BiSeNet

    sched = make_schedule(num_inference_steps=STEPS)
    true = _affine_decoder(jax.random.PRNGKey(20), up=2)
    proxy = fit_decode_proxy(true, (8, 8, 4), key=jax.random.PRNGKey(21), n=4)
    seg = BiSeNet(n_classes=19, width=8)
    sparams = seg.init(jax.random.PRNGKey(22), jnp.zeros((1, 16, 16, 3)))
    attr = NetAttrFunc(
        loss_scale=10.0, t1=0, t2=STEPS, seg_params=sparams,
        seg_apply_fn=lambda p, img: seg.apply(p, img)[0], idx_for_class=(17,),
    )
    xt = jax.random.normal(jax.random.PRNGKey(23), (1, 8, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(24), (1, 8, 8, 4))
    out, _ = attr.apply(xt, None, eps, sched.timesteps[2], jnp.int32(2), sched, proxy)
    assert out.shape == xt.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(jnp.max(jnp.abs(out - xt))) > 0
