import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_image_editing_tpu.core import (
    add_noise,
    alpha_bar,
    ddim_step,
    forward_step,
    make_schedule,
    mu_tilde,
    next_step,
    posterior_mean_from_eps,
    reverse_step,
    schedule_for_model,
    variance,
)


def np_alphas_cumprod(beta_start, beta_end, T, schedule="linear"):
    if schedule == "linear":
        betas = np.linspace(beta_start, beta_end, T, dtype=np.float64)
    else:
        betas = np.linspace(beta_start**0.5, beta_end**0.5, T, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def test_alphas_cumprod_matches_numpy():
    s = make_schedule(beta_start=0.0001, beta_end=0.02, beta_schedule="linear")
    ref = np_alphas_cumprod(0.0001, 0.02, 1000)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), ref, rtol=2e-4)


def test_leading_timesteps():
    s = make_schedule(num_inference_steps=50)
    ts = np.asarray(s.timesteps)
    assert ts[0] == 980 and ts[-1] == 0 and len(ts) == 50
    assert np.all(np.diff(ts) == -20)

    sd = schedule_for_model("sd", num_inference_steps=50)
    ts = np.asarray(sd.timesteps)
    assert ts[0] == 981 and ts[-1] == 1


def test_final_alpha_cumprod():
    s1 = make_schedule(set_alpha_to_one=True)
    assert float(alpha_bar(s1, jnp.int32(-20))) == 1.0
    s2 = schedule_for_model("sd")
    assert float(alpha_bar(s2, jnp.int32(-19))) == pytest.approx(
        float(s2.alphas_cumprod[0])
    )


def test_variance_formula():
    s = make_schedule()
    t = jnp.int32(980)
    a_t = float(s.alphas_cumprod[980])
    a_prev = float(s.alphas_cumprod[960])
    expected = ((1 - a_prev) / (1 - a_t)) * (1 - a_t / a_prev)
    assert float(variance(s, t)) == pytest.approx(expected, rel=1e-5)
    assert float(variance(s, t)) > 0


def test_ddim_step_eta0_manual():
    s = make_schedule(clip_sample=False)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 8, 8, 3))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 8, 3))
    t = jnp.int32(500)
    prev, x0 = ddim_step(s, x, eps, t, eta=0.0)
    a_t = float(s.alphas_cumprod[500])
    a_prev = float(s.alphas_cumprod[480])
    x0_ref = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    prev_ref = np.sqrt(a_prev) * x0_ref + np.sqrt(1 - a_prev) * eps
    np.testing.assert_allclose(np.asarray(prev), np.asarray(prev_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x0_ref), rtol=1e-5, atol=1e-5)


def test_clip_sample_clamps_pred_x0():
    s = make_schedule(clip_sample=True)
    x = jnp.full((1, 4, 4, 3), 5.0)
    eps = jnp.zeros((1, 4, 4, 3))
    _, x0 = ddim_step(s, x, eps, jnp.int32(980), eta=0.0)
    assert float(jnp.max(jnp.abs(x0))) <= 1.0


def test_ddim_invert_roundtrip_single_step():
    """next_step then ddim_step(eta=0) at matched timesteps is near-identity."""
    s = make_schedule(clip_sample=False)
    key = jax.random.PRNGKey(42)
    x = jax.random.normal(key, (1, 8, 8, 3)) * 0.5
    eps = jax.random.normal(jax.random.fold_in(key, 7), (1, 8, 8, 3))
    t = jnp.int32(500)  # invert x_{t-ratio} -> x_t, then denoise back
    x_up = next_step(s, x, eps, t)
    x_back, _ = ddim_step(s, x_up, eps, t, eta=0.0)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), rtol=1e-4, atol=1e-4)


def test_reverse_step_mu_sigma_consistency():
    s = make_schedule(clip_sample=False)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (1, 8, 8, 3))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 8, 3))
    z = jax.random.normal(jax.random.fold_in(key, 2), (1, 8, 8, 3))
    t = jnp.int32(700)
    eta = 1.0
    mu, sigma = posterior_mean_from_eps(s, x, eps, t, eta)
    prev, _ = reverse_step(s, x, eps, t, eta=eta, noise=z)
    np.testing.assert_allclose(
        np.asarray(prev), np.asarray(mu + sigma * z), rtol=1e-5, atol=1e-5
    )


def test_reverse_vs_ddim_eta1_equal():
    """At eta in {0,1} the two step rules coincide (eta^2 == eta)."""
    s = make_schedule(clip_sample=False)
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (1, 8, 8, 3))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 8, 3))
    z = jax.random.normal(jax.random.fold_in(key, 2), (1, 8, 8, 3))
    t = jnp.int32(400)
    a, _ = ddim_step(s, x, eps, t, eta=1.0, noise=z)
    b, _ = reverse_step(s, x, eps, t, eta=1.0, noise=z)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_forward_step_and_add_noise():
    s = make_schedule(clip_sample=False)
    x0 = jnp.ones((1, 4, 4, 3)) * 0.3
    eps = jnp.ones((1, 4, 4, 3)) * 0.1
    t = jnp.int32(0)
    nxt = forward_step(s, add_noise(s, x0, eps, t), eps, t)
    a_next = float(s.alphas_cumprod[20])
    # x0 recovered exactly at eta=0, then renoised at t+ratio
    expected = np.sqrt(a_next) * 0.3 + np.sqrt(1 - a_next) * 0.1
    np.testing.assert_allclose(np.asarray(nxt), expected, rtol=1e-5)


def test_mu_tilde_formula():
    s = make_schedule(clip_sample=False)
    xt = jnp.ones((1, 2, 2, 3)) * 0.7
    x0 = jnp.ones((1, 2, 2, 3)) * 0.2
    t = jnp.int32(500)
    a_t = float(s.alphas_cumprod[500])
    a_prev = float(s.alphas_cumprod[480])
    beta_t = 1 - a_t
    expected = (np.sqrt(a_prev) * beta_t / (1 - a_t)) * 0.2 + (
        np.sqrt(a_t) * (1 - a_prev) / (1 - a_t)
    ) * 0.7
    np.testing.assert_allclose(np.asarray(mu_tilde(s, xt, x0, t)), expected, rtol=1e-5)


def test_schedule_is_jittable_pytree():
    s = make_schedule(clip_sample=False)

    @jax.jit
    def f(sched, x, eps, t):
        return ddim_step(sched, x, eps, t, eta=0.0)[0]

    x = jnp.ones((1, 4, 4, 3))
    eps = jnp.zeros_like(x)
    out = f(s, x, eps, jnp.int32(980))
    assert out.shape == x.shape


def test_with_num_inference_steps_preserves_spacing():
    # SD preset uses steps_offset=1; regenerating at 25 steps must keep it
    # (diffusers' set_timesteps semantics), yielding [961..1] not [960..0].
    s = schedule_for_model("sd", num_inference_steps=50)
    assert s.steps_offset == 1
    s25 = s.with_num_inference_steps(25)
    ts = np.asarray(s25.timesteps)
    assert ts[0] == 961 and ts[-1] == 1
    # explicit override still wins
    s25b = s.with_num_inference_steps(25, steps_offset=0)
    assert np.asarray(s25b.timesteps)[0] == 960


def test_schedule_static_fields_key_jit_cache():
    # clip_sample is a static treedef field: jit must recompile, not reuse.
    s_clip = make_schedule(clip_sample=True)
    s_raw = s_clip.with_clip_sample(False)

    @jax.jit
    def step(sched, x, eps, t):
        return ddim_step(sched, x, eps, t, eta=0.0)[0]

    x = jnp.ones((1, 4, 4, 3)) * 5.0  # big enough that clipping matters
    eps = jnp.zeros_like(x)
    a = step(s_clip, x, eps, jnp.int32(980))
    b = step(s_raw, x, eps, jnp.int32(980))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_bf16_sample_keeps_schedule_algebra_f32_and_finite():
    """Regression: a bf16 sample (e.g. a latent straight from the bf16 VAE
    encoder, the CLI real-image path) used to drag alpha_bar/variance to
    bf16 via `_bcast`, where at the t~0 boundary the rounded direction
    radicand 1 - a_prev - eta*var went negative -> sqrt -> NaN. Schedule
    algebra is f32 by contract; outputs are f32 even for bf16 inputs."""
    s = schedule_for_model("sd", num_inference_steps=50)
    key = jax.random.PRNGKey(0)
    for t in [int(s.timesteps[-1]), int(s.timesteps[-2]), int(s.timesteps[0])]:
        x = jax.random.normal(key, (1, 8, 8, 4), jnp.bfloat16) * 3
        eps = jax.random.normal(jax.random.fold_in(key, t), x.shape, jnp.bfloat16)
        noise = jax.random.normal(jax.random.fold_in(key, t + 1), x.shape)
        for fn in (
            lambda: reverse_step(s, x, eps, jnp.int32(t), eta=1.0, noise=noise)[0],
            lambda: ddim_step(s, x, eps, jnp.int32(t), eta=1.0, noise=noise)[0],
            lambda: posterior_mean_from_eps(s, x, eps, jnp.int32(t), 1.0)[0],
        ):
            out = fn()
            assert out.dtype == jnp.float32
            assert bool(jnp.isfinite(out).all())


def test_bf16_x0_ddpm_inversion_finite():
    """End-to-end regression at the engine level: bf16 x0 through the
    edit-friendly inversion produces finite zs/xts (sample_xts + every
    reverse-step term computed f32)."""
    from diffusion_image_editing_tpu.engine import ddpm_invert_batched
    from diffusion_image_editing_tpu.engine.denoise import EpsClosure

    s = schedule_for_model("sd", num_inference_steps=50)
    eps_fn = EpsClosure(lambda p, x, t: (0.3 * x).astype(jnp.float32), None)

    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4), jnp.bfloat16)
    res = ddpm_invert_batched(s, eps_fn, x0, eta=1.0, key=jax.random.PRNGKey(2))
    assert bool(jnp.isfinite(res.zs).all())
    assert bool(jnp.isfinite(res.xts).all())
    assert res.xts.dtype == jnp.float32
