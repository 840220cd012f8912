import jax
import jax.numpy as jnp
import numpy as np

from diffusion_image_editing_tpu.core import make_schedule, ddim_step
from diffusion_image_editing_tpu.engine import (
    ddim_invert,
    ddpm_invert,
    ddpm_sample,
    edit,
    generate,
    make_cfg_eps_fn,
    make_eps_fn,
)
from diffusion_image_editing_tpu.guidance import SingleColorAttrFunc
from diffusion_image_editing_tpu.models import TINY_UNET2D, UNet2D

STEPS = 10


def _setup(clip=False):
    sched = make_schedule(num_inference_steps=STEPS, clip_sample=clip)
    model = UNet2D(TINY_UNET2D)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.int32(0))
    eps_fn = make_eps_fn(model.apply, params)
    return sched, eps_fn


def test_generate_matches_python_loop():
    sched, eps_fn = _setup()
    xt = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    out = generate(sched, eps_fn, xt, eta=0.0)

    x = xt
    for t in np.asarray(sched.timesteps):
        eps = eps_fn(x, jnp.int32(t))
        x, _ = ddim_step(sched, x, eps, jnp.int32(t), eta=0.0)
    np.testing.assert_allclose(np.asarray(out.x0), np.asarray(x), rtol=1e-3, atol=1e-3)


def test_generate_with_eta_and_collect():
    sched, eps_fn = _setup()
    key = jax.random.PRNGKey(2)
    xt = jax.random.normal(key, (1, 16, 16, 3))
    zs = jax.random.normal(jax.random.fold_in(key, 1), (STEPS, 1, 16, 16, 3))
    out = generate(sched, eps_fn, xt, eta=1.0, zs=zs, collect=True)
    assert out.xts.shape == (STEPS, 1, 16, 16, 3)
    assert out.model_outputs.shape == (STEPS, 1, 16, 16, 3)
    assert not bool(jnp.any(jnp.isnan(out.x0)))


def test_generate_truncated_by_zs_length():
    sched, eps_fn = _setup()
    key = jax.random.PRNGKey(3)
    xt = jax.random.normal(key, (1, 16, 16, 3))
    zs = jax.random.normal(jax.random.fold_in(key, 1), (4, 1, 16, 16, 3))
    out = generate(sched, eps_fn, xt, eta=1.0, zs=zs, collect=True)
    assert out.xts.shape[0] == 4  # diffusion_loop truncation semantics


def test_ddpm_inversion_roundtrip_exact():
    """The core property of edit-friendly inversion (arXiv 2304.06140):
    the reverse process reproduces the inversion trajectory exactly at every
    intermediate step; the final step returns pred-x0 (zs[-1] is zeroed since
    sigma_{t_min}=0) so x0 matches only up to the model's denoising error —
    same as the reference."""
    sched, eps_fn = _setup()
    x0 = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 3)) * 0.5
    res = ddpm_invert(sched, eps_fn, x0, eta=1.0, key=jax.random.PRNGKey(5))
    assert res.zs.shape == (STEPS, 1, 16, 16, 3)
    assert res.xts.shape == (STEPS + 1, 1, 16, 16, 3)
    recon, traj = ddpm_sample(sched, eps_fn, res.zs, res.xts, t_skip=0, eta=1.0, collect=True)
    # intermediate trajectory: exact (float tolerance)
    np.testing.assert_allclose(
        np.asarray(traj[:-1]), np.asarray(res.xts[1:STEPS]), rtol=1e-3, atol=1e-3
    )
    # final step: model-error bound (random tiny UNet => loose)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x0), atol=0.1)


def test_ddpm_inversion_roundtrip_with_tskip():
    sched, eps_fn = _setup()
    x0 = jax.random.normal(jax.random.PRNGKey(6), (1, 16, 16, 3)) * 0.5
    res = ddpm_invert(sched, eps_fn, x0, eta=1.0, key=jax.random.PRNGKey(7))
    recon, traj = ddpm_sample(sched, eps_fn, res.zs, res.xts, t_skip=4, eta=1.0, collect=True)
    np.testing.assert_allclose(
        np.asarray(traj[:-1]), np.asarray(res.xts[5:STEPS]), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x0), atol=0.1)


def test_ddpm_invert_eta0():
    sched, eps_fn = _setup()
    x0 = jax.random.normal(jax.random.PRNGKey(8), (1, 16, 16, 3)) * 0.5
    res = ddpm_invert(sched, eps_fn, x0, eta=0.0)
    assert res.zs is None and res.xts is None
    assert res.xt.shape == x0.shape


def test_ddim_inversion_approximate_roundtrip():
    """DDIM inversion error is O(1/steps): with a smooth (Lipschitz) denoiser
    the invert->generate roundtrip must nearly recover x0. (A random-init
    UNet is not smooth enough for a meaningful bound.)"""
    sched = make_schedule(num_inference_steps=50, clip_sample=False)

    def eps_fn(x, t):  # smooth analytic denoiser
        return 0.1 * x

    x0 = jax.random.normal(jax.random.PRNGKey(9), (1, 16, 16, 3)) * 0.3
    xT = ddim_invert(sched, eps_fn, x0)
    recon = generate(sched, eps_fn, xT, eta=0.0).x0
    err = float(jnp.mean(jnp.abs(recon - x0)))
    assert err < 0.03, err


def test_edit_with_color_guidance_moves_channel():
    sched, eps_fn = _setup()
    xt = jax.random.normal(jax.random.PRNGKey(10), (1, 16, 16, 3))
    attr = SingleColorAttrFunc(
        target=1.0, color_idx=0, loss_scale=50.0, t1=0, t2=STEPS
    )
    plain = edit(sched, eps_fn, xt, eta=0.0)
    guided = edit(sched, eps_fn, xt, eta=0.0, attr_func=attr)
    assert float(jnp.mean(guided.x0[..., 0])) > float(jnp.mean(plain.x0[..., 0]))


def test_edit_window_masks_guidance():
    sched, eps_fn = _setup()
    xt = jax.random.normal(jax.random.PRNGKey(11), (1, 16, 16, 3))
    attr = SingleColorAttrFunc(target=1.0, color_idx=0, loss_scale=50.0, t1=0, t2=0)
    plain = edit(sched, eps_fn, xt, eta=0.0)
    windowed = edit(sched, eps_fn, xt, eta=0.0, attr_func=attr)
    np.testing.assert_allclose(
        np.asarray(windowed.x0), np.asarray(plain.x0), rtol=1e-4, atol=1e-3
    )


def test_edit_ddpm_step_rule_with_mask_grad():
    sched, eps_fn = _setup()
    key = jax.random.PRNGKey(12)
    xt = jax.random.normal(key, (1, 16, 16, 3))
    zs = jax.random.normal(jax.random.fold_in(key, 1), (STEPS, 1, 16, 16, 3))
    mask = jnp.zeros((1, 16, 16, 3)).at[:, :8].set(1.0)
    attr = SingleColorAttrFunc(
        target=1.0, color_idx=0, loss_scale=50.0, t1=0, t2=STEPS, mask_attr_grad=True
    )
    out = edit(
        sched, eps_fn, xt, eta=1.0, zs=zs, attr_func=attr, mask=mask,
        step_rule="ddpm", collect=True,
    )
    assert out.pred_original_samples is not None  # fixed NameError parity gap
    assert not bool(jnp.any(jnp.isnan(out.x0)))


def test_cfg_eps_fn_mixing():
    def apply_fn(params, x, t, ctx):
        # fake conditional unet: eps = x * mean(ctx)
        return x * jnp.mean(ctx, axis=(1, 2))[:, None, None, None]

    text_emb = jnp.stack([jnp.zeros((4, 8)), jnp.ones((4, 8))])  # uncond, cond
    eps_fn = make_cfg_eps_fn(apply_fn, None, text_emb, cfg_scale=3.5)
    x = jnp.ones((2, 4, 4, 3))
    out = eps_fn(x, jnp.int32(0))
    # uncond pred = 0, cond pred = x -> mixed = 0 + 3.5*(x-0)
    np.testing.assert_allclose(np.asarray(out), 3.5 * np.asarray(x), rtol=1e-6)


def test_edit_jit_with_attr_func_arg():
    sched, eps_fn = _setup()
    xt = jax.random.normal(jax.random.PRNGKey(13), (1, 16, 16, 3))

    @jax.jit
    def run(attr, x):
        return edit(sched, eps_fn, x, eta=0.0, attr_func=attr).x0

    a1 = run(SingleColorAttrFunc(target=1.0, loss_scale=10.0, t2=STEPS), xt)
    a2 = run(SingleColorAttrFunc(target=1.0, loss_scale=20.0, t2=STEPS), xt)  # no retrace
    assert not np.allclose(np.asarray(a1), np.asarray(a2))


def test_edit_split_matches_fused():
    from diffusion_image_editing_tpu.engine import edit_split

    sched, eps_fn = _setup()
    key = jax.random.PRNGKey(20)
    xt = jax.random.normal(key, (1, 16, 16, 3))
    zs = jax.random.normal(jax.random.fold_in(key, 1), (STEPS, 1, 16, 16, 3))
    attr = SingleColorAttrFunc(target=1.0, color_idx=0, loss_scale=20.0, t1=1, t2=7)
    fused = edit(sched, eps_fn, xt, eta=1.0, zs=zs, attr_func=attr, collect=True)
    split = edit_split(sched, eps_fn, xt, eta=1.0, zs=zs, attr_func=attr, collect=True)
    np.testing.assert_allclose(
        np.asarray(split.x0), np.asarray(fused.x0), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(split.model_outputs), np.asarray(fused.model_outputs),
        rtol=1e-3, atol=1e-3,
    )


def test_split_inversion_matches_scan():
    """ddim_invert_split / ddpm_invert_split (host loop of per-step jits)
    must equal the scan programs — same math, different dispatch (CPU is
    bitwise deterministic, so tolerances are tight)."""
    from diffusion_image_editing_tpu.engine import ddim_invert_split, ddpm_invert_split

    sched, eps_fn = _setup()
    x0 = jax.random.normal(jax.random.PRNGKey(11), (1, 16, 16, 3)) * 0.2

    xT_scan = ddim_invert(sched, eps_fn, x0)
    xT_split = ddim_invert_split(sched, eps_fn, x0)
    np.testing.assert_allclose(
        np.asarray(xT_scan), np.asarray(xT_split), rtol=1e-5, atol=1e-6
    )

    key = jax.random.PRNGKey(12)
    r_scan = ddpm_invert(sched, eps_fn, x0, eta=1.0, key=key)
    r_split = ddpm_invert_split(sched, eps_fn, x0, eta=1.0, key=key)
    np.testing.assert_allclose(
        np.asarray(r_scan.xt), np.asarray(r_split.xt), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(r_scan.zs), np.asarray(r_split.zs), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r_scan.xts), np.asarray(r_split.xts), rtol=1e-5, atol=1e-6
    )

    # eta=0 degenerate branch
    r0_scan = ddpm_invert(sched, eps_fn, x0, eta=0.0)
    r0_split = ddpm_invert_split(sched, eps_fn, x0, eta=0.0)
    np.testing.assert_allclose(
        np.asarray(r0_scan.xt), np.asarray(r0_split.xt), rtol=1e-5, atol=1e-6
    )
    assert r0_split.zs is None and r0_split.xts is None


def test_apply_batched_matches_per_sample_apply():
    """Batch >= 2 guidance via apply_batched (lax.map per-sample VJPs — the
    16GB batch-cliff fix, PARITY.md round 2) must equal running apply() on
    each sample separately, including zt nudging and per-sample x0 refs."""
    sched, _ = _setup()
    key = jax.random.PRNGKey(21)
    xt = jax.random.normal(key, (3, 16, 16, 3))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (3, 16, 16, 3))
    zt = jax.random.normal(jax.random.fold_in(key, 2), (3, 16, 16, 3))
    x0 = jax.random.normal(jax.random.fold_in(key, 3), (3, 16, 16, 3))
    mask = jnp.ones((1, 16, 16, 3)).at[:, 8:].set(0.0)
    attr = SingleColorAttrFunc(
        target=1.0, color_idx=0, loss_scale=50.0, t1=0, t2=STEPS,
        nudge_zt=True, use_mask=True, metric="l2", lambda_=0.1,
    )
    from diffusion_image_editing_tpu.engine.denoise import DecodeClosure

    dec = DecodeClosure()
    t, idx = jnp.int32(sched.timesteps[3]), jnp.int32(3)
    xb, zb = attr.apply_batched(xt, zt, eps, t, idx, sched, dec, mask=mask, x0=x0)
    for i in range(3):
        xi, zi = attr.apply(
            xt[i : i + 1], zt[i : i + 1], eps[i : i + 1], t, idx, sched, dec,
            mask=mask, x0=x0[i : i + 1],
        )
        np.testing.assert_allclose(np.asarray(xb[i]), np.asarray(xi[0]), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(zb[i]), np.asarray(zi[0]), rtol=1e-5, atol=1e-5)


def test_apply_batched_per_sample_masks():
    """A (B, H, W, C) mask must be applied per sample — not broadcast from
    sample 0 (code-review finding: the full-batch mask was captured in every
    lax.map iteration)."""
    sched, _ = _setup()
    key = jax.random.PRNGKey(22)
    xt = jax.random.normal(key, (2, 16, 16, 3))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (2, 16, 16, 3))
    masks = jnp.stack([
        jnp.ones((16, 16, 3)).at[8:].set(0.0),   # top half
        jnp.ones((16, 16, 3)).at[:8].set(0.0),   # bottom half
    ])
    attr = SingleColorAttrFunc(
        target=1.0, color_idx=0, loss_scale=50.0, t1=0, t2=STEPS,
        mask_attr_grad=True,
    )
    from diffusion_image_editing_tpu.engine.denoise import DecodeClosure

    dec = DecodeClosure()
    t, idx = jnp.int32(sched.timesteps[3]), jnp.int32(3)
    xb, _ = attr.apply_batched(xt, None, eps, t, idx, sched, dec, mask=masks)
    for i in range(2):
        xi, _ = attr.apply(
            xt[i : i + 1], None, eps[i : i + 1], t, idx, sched, dec,
            mask=masks[i : i + 1],
        )
        np.testing.assert_allclose(np.asarray(xb[i]), np.asarray(xi[0]), rtol=1e-5, atol=1e-5)
    # the nudge regions must actually differ between the two samples
    d0 = np.abs(np.asarray(xb[0] - xt[0]))
    d1 = np.abs(np.asarray(xb[1] - xt[1]))
    assert d0[8:].max() == 0.0 and d0[:8].max() > 0.0
    assert d1[:8].max() == 0.0 and d1[8:].max() > 0.0


def test_ddpm_invert_batched_matches_scan():
    """The timestep-parallel inversion (chunked batched UNet calls) must
    reproduce the sequential scan's zs/xts exactly on CPU: the sequential
    loop only ever reads the ORIGINAL sampled trajectory, so every z is
    independent (the TPU-first restructuring ddpm_invert_batched rests on).
    Tolerance is fp-reassociation level: batched convs regroup reductions."""
    from diffusion_image_editing_tpu.engine import ddpm_invert_batched

    sched, eps_fn = _setup()
    x0 = jax.random.normal(jax.random.PRNGKey(40), (1, 16, 16, 3)) * 0.1
    key = jax.random.PRNGKey(41)
    ref = ddpm_invert(sched, eps_fn, x0, eta=1.0, key=key)
    for chunk in (3, 100):  # padded-group path and single-call path
        got = ddpm_invert_batched(sched, eps_fn, x0, eta=1.0, key=key, chunk=chunk)
        np.testing.assert_allclose(
            np.asarray(got.zs), np.asarray(ref.zs), rtol=3e-4, atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(got.xts), np.asarray(ref.xts), rtol=3e-4, atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(got.xt), np.asarray(ref.xt), rtol=3e-4, atol=3e-4
        )


def test_ddpm_invert_suffix_start_matches_full():
    """start=k (suffix-only z-extraction for the t_skip flow) must agree
    with the full inversion on everything the edit consumes: zs[k:] and
    xts[k:] (fp-reassociation tolerance — group boundaries shift), with
    zs[:k] zero-filled. Covers both the batched and the split form."""
    from diffusion_image_editing_tpu.engine import (
        ddpm_invert_batched,
        ddpm_invert_split,
    )

    sched, eps_fn = _setup()
    x0 = jax.random.normal(jax.random.PRNGKey(50), (1, 16, 16, 3)) * 0.1
    key = jax.random.PRNGKey(51)
    k = 3
    full = ddpm_invert_batched(sched, eps_fn, x0, eta=1.0, key=key, chunk=4)
    for fn in (ddpm_invert_batched, ddpm_invert_split):
        kw = {"chunk": 4} if fn is ddpm_invert_batched else {}
        got = fn(sched, eps_fn, x0, eta=1.0, key=key, start=k, **kw)
        assert got.zs.shape == full.zs.shape
        assert got.xts.shape == full.xts.shape
        np.testing.assert_allclose(
            np.asarray(got.zs[k:]), np.asarray(full.zs[k:]),
            rtol=3e-4, atol=3e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got.xts[k:]), np.asarray(full.xts[k:]),
            rtol=3e-4, atol=3e-4,
        )
        assert np.asarray(got.zs[:k]).max() == 0.0


def test_prepare_real_image_edit_tskip_same_edit_result():
    """Through the pipeline API: prepare(t_skip=k) + edit(t_skip=k) must
    produce the same edited image as prepare() + edit(t_skip=k) — the
    skipped rows are provably unread."""
    from diffusion_image_editing_tpu.pipeline.edit_pipeline import EditPipeline
    from diffusion_image_editing_tpu.pipeline.wrappers import DiffusionWrapper

    sched = make_schedule(num_inference_steps=STEPS, clip_sample=False)
    model = UNet2D(TINY_UNET2D)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.int32(0))
    w = DiffusionWrapper(model, params, sched)
    pipe = EditPipeline(w)
    img = jax.random.uniform(jax.random.PRNGKey(52), (1, 16, 16, 3)) * 2 - 1
    key = jax.random.PRNGKey(53)
    k = 2
    attr = SingleColorAttrFunc(target=0.9, color_idx=0, loss_scale=5.0,
                               t1=0, t2=STEPS)
    outs = []
    for t_skip_prep in (None, k):
        xt, zs, xts, mask, _ = pipe.prepare_real_image_edit(
            img, eta=1.0, inversion_method="ddpm", key=key,
            mode="batched", t_skip=t_skip_prep,
        )
        out = pipe.edit_image(
            xt, eta=1.0, zs=zs, xts=xts, inversion_method="ddpm",
            t_skip=k, resynthesize=False, key=key, collect=False,
            mode="split", attr_func=attr, mask=None, x0_ref=None,
        )
        outs.append(np.asarray(out.imgs))
    np.testing.assert_allclose(outs[1], outs[0], rtol=3e-4, atol=3e-4)


def test_prepare_tskip_clamped_beyond_steps():
    """t_skip > num_inference_steps must clamp (the CLI's default t_skip=36
    exceeds n at small --steps; edit_image's xts[t_skip] relies on jnp's
    index clamping for the same case) rather than raise."""
    from diffusion_image_editing_tpu.pipeline.edit_pipeline import EditPipeline
    from diffusion_image_editing_tpu.pipeline.wrappers import DiffusionWrapper

    sched = make_schedule(num_inference_steps=STEPS, clip_sample=False)
    model = UNet2D(TINY_UNET2D)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.int32(0))
    pipe = EditPipeline(DiffusionWrapper(model, params, sched))
    img = jax.random.uniform(jax.random.PRNGKey(54), (1, 16, 16, 3)) * 2 - 1
    xt, zs, xts, _, _ = pipe.prepare_real_image_edit(
        img, eta=1.0, inversion_method="ddpm", key=jax.random.PRNGKey(55),
        mode="batched", t_skip=STEPS + 26,
    )
    assert zs.shape[0] == STEPS
    # clamped to the last index: only the final row is extracted (and it is
    # the row the reference zeroes anyway)
    assert np.asarray(zs[:-1]).max() == 0.0


def test_apply_batched_chunked_vjp_matches_serialized():
    """vjp_chunk > 1 vmaps k samples per guidance VJP (lax.map batch_size).
    Per-sample loss normalization must be preserved under vmap: chunked
    results equal the fully serialized chunk=1 results, including ragged
    batches (b % chunk != 0)."""
    sched, _ = _setup()
    key = jax.random.PRNGKey(23)
    xt = jax.random.normal(key, (5, 16, 16, 3))
    eps = jax.random.normal(jax.random.fold_in(key, 1), (5, 16, 16, 3))
    zt = jax.random.normal(jax.random.fold_in(key, 2), (5, 16, 16, 3))
    from diffusion_image_editing_tpu.engine.denoise import DecodeClosure

    dec = DecodeClosure()
    t, idx = jnp.int32(sched.timesteps[3]), jnp.int32(3)
    base = SingleColorAttrFunc(
        target=1.0, color_idx=0, loss_scale=50.0, t1=0, t2=STEPS, nudge_zt=True,
    )
    x1, z1 = base.apply_batched(xt, zt, eps, t, idx, sched, dec)
    for chunk in (2, 4, 8):
        attr = base.replace(vjp_chunk=chunk)
        xc, zc = attr.apply_batched(xt, zt, eps, t, idx, sched, dec)
        np.testing.assert_allclose(np.asarray(xc), np.asarray(x1), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(zc), np.asarray(z1), rtol=1e-5, atol=1e-5)


def test_apply_batched_swept_attr_leaves():
    """A guidance-scale grid as a BATCH (swept loss_scale with leading dim ==
    batch, `parallel.sweep_attr_func`) routes each sample's own scale through
    the per-sample VJP path — sample i must equal apply() with scale[i]
    (BASELINE config 5 on one chip)."""
    sched, _ = _setup()
    key = jax.random.PRNGKey(31)
    xt = jnp.repeat(jax.random.normal(key, (1, 16, 16, 3)), 3, axis=0)
    eps = jnp.repeat(
        jax.random.normal(jax.random.fold_in(key, 1), (1, 16, 16, 3)), 3, axis=0
    )
    scales = jnp.asarray([0.0, 10.0, 50.0])
    attr = SingleColorAttrFunc(target=1.0, color_idx=0, loss_scale=scales,
                               t1=0, t2=STEPS)
    from diffusion_image_editing_tpu.engine.denoise import DecodeClosure

    dec = DecodeClosure()
    t, idx = jnp.int32(sched.timesteps[2]), jnp.int32(2)
    xb, _ = attr.apply_batched(xt, None, eps, t, idx, sched, dec)
    for i in range(3):
        xi, _ = attr.replace(loss_scale=scales[i]).apply(
            xt[i : i + 1], None, eps[i : i + 1], t, idx, sched, dec
        )
        np.testing.assert_allclose(np.asarray(xb[i]), np.asarray(xi[0]),
                                   rtol=1e-5, atol=1e-5)
    # scale 0.0 => no nudge; larger scale => larger nudge
    np.testing.assert_allclose(np.asarray(xb[0]), np.asarray(xt[0]), rtol=0, atol=0)
    d1 = float(jnp.sum(jnp.abs(xb[1] - xt[1])))
    d2 = float(jnp.sum(jnp.abs(xb[2] - xt[2])))
    assert d2 > d1 > 0.0


def test_encoder_propagation_exact_and_approximate():
    """Encoder propagation (Faster Diffusion, arXiv 2312.09608):
    (a) reuse() fed the SAME step's features == the plain CFG forward
    exactly; (b) edit_split(encoder_reuse=1) with the feature closure ==
    the plain closure exactly; (c) k=2 runs, differs (approximation),
    stays finite."""
    from diffusion_image_editing_tpu.engine.denoise import (
        CfgEpsClosure,
        CfgEpsFeatClosure,
    )
    from diffusion_image_editing_tpu.engine.edit import edit_split
    from diffusion_image_editing_tpu.models import UNet2DCondition
    from diffusion_image_editing_tpu.models.unet2d_cond import UNet2DConditionConfig

    cfg = UNet2DConditionConfig(
        sample_size=16, block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, attention_head_dim=2, cross_attention_dim=16,
        norm_num_groups=8,
    )
    unet = UNet2DCondition(cfg)
    k = jax.random.PRNGKey(0)
    params = unet.init(k, jnp.zeros((1, 16, 16, 4)), jnp.int32(0),
                       jnp.zeros((1, 7, 16)))
    text = jax.random.normal(jax.random.fold_in(k, 1), (2, 7, 16))
    plain = CfgEpsClosure(unet.apply, params, text, 2.0)
    feat = CfgEpsFeatClosure(unet.apply, params, text, 2.0)
    x = jax.random.normal(jax.random.fold_in(k, 2), (1, 16, 16, 4))
    t = jnp.int32(401)

    eps_full, feats = jax.jit(lambda f, x_, t_: f.full(x_, t_))(feat, x, t)
    eps_plain = jax.jit(lambda f, x_, t_: f(x_, t_))(plain, x, t)
    np.testing.assert_array_equal(np.asarray(eps_full), np.asarray(eps_plain))
    eps_reuse = jax.jit(lambda f, x_, t_, fe: f.reuse(x_, t_, fe))(feat, x, t, feats)
    np.testing.assert_array_equal(np.asarray(eps_reuse), np.asarray(eps_plain))

    sched = make_schedule(num_inference_steps=4, clip_sample=False)
    base = edit_split(sched, plain, x).x0
    k1 = edit_split(sched, feat, x, encoder_reuse=1).x0
    np.testing.assert_array_equal(np.asarray(base), np.asarray(k1))
    k2 = edit_split(sched, feat, x, encoder_reuse=2).x0
    assert np.isfinite(np.asarray(k2)).all()
    assert not np.array_equal(np.asarray(k2), np.asarray(base))


def test_ddim_inversion_fixed_point_refinement_improves_roundtrip():
    """refine_iters=m iterates eps at the TARGET latent, converging to the
    exact inverse of the forward DDIM step (next_step is ddim_step's
    algebraic inverse at equal eps) — roundtrip error must drop
    monotonically with m on a contractive denoiser AND on the tiny UNet."""
    from diffusion_image_editing_tpu.engine.denoise import EpsClosure, generate
    from diffusion_image_editing_tpu.engine.invert import ddim_invert, ddim_invert_split
    from diffusion_image_editing_tpu.models import TINY_UNET2D, UNet2D

    sched = make_schedule(num_inference_steps=6, clip_sample=False)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 3)) * 0.3

    def err(eps_fn, m):
        xT = ddim_invert(sched, eps_fn, x0, refine_iters=m)
        rec = generate(sched, eps_fn, xT).x0
        return float(jnp.sqrt(jnp.mean((rec - x0) ** 2)))

    # contractive analytic denoiser (CLAUDE.md rule 3: random UNets amplify
    # fp chaos; the analytic case isolates the algorithm)
    analytic = EpsClosure(lambda p, x, t: 0.3 * jnp.tanh(x), None)
    e0, e1, e2 = err(analytic, 0), err(analytic, 1), err(analytic, 2)
    assert e1 < e0 * 0.5 and e2 < e1 * 0.5, (e0, e1, e2)

    model = UNet2D(TINY_UNET2D)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.int32(0))
    unet_eps = EpsClosure(model.apply, params)
    u0, u2 = err(unet_eps, 0), err(unet_eps, 2)
    assert u2 < u0, (u0, u2)

    # split == fused at equal m
    xT_f = ddim_invert(sched, unet_eps, x0, refine_iters=2)
    xT_s = ddim_invert_split(sched, unet_eps, x0, refine_iters=2)
    np.testing.assert_allclose(np.asarray(xT_f), np.asarray(xT_s),
                               rtol=1e-6, atol=1e-6)
