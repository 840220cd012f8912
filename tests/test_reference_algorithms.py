"""Algorithm parity: the reference's RELEASED code as the oracle.

Runs `/root/reference/src/{ddim_inversion,ddpm_inversion,diffusion_utils,
attr_functions}.py` UNMODIFIED (imported at test time via
`tests/reference_harness.py`) on a tiny torch-mirror UNet with fixed noise,
and pins this engine's L1/L3/L4 algebra against them end-to-end:

  * DDIM inversion trajectory      (`src/ddim_inversion.py:52-75`)
  * edit-friendly DDPM inversion   (`src/ddpm_inversion.py:80-176`)
  * eta=0 forward-step inversion   (`src/ddpm_inversion.py:58-77`)
  * zs/xts resynthesis `sample`    (`src/ddpm_inversion.py:243-313`)
  * generation loop / single_step  (`src/diffusion_utils.py:90-133`)
  * guidance nudge `AttrFunc.apply`(`src/attr_functions.py:112-161`)
  * mu_tilde                       (`src/ddpm_inversion.py:16-28`)

Both sides consume the SAME schedule arrays (the stub scheduler is built
from our `Schedule`), the same ported weights, and the same noise draws —
so differences isolate the loop/step algebra itself.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import reference_harness as rh
import torch_mirrors as tm

from diffusion_image_editing_tpu.core import schedule as S
from diffusion_image_editing_tpu.engine import denoise as D
from diffusion_image_editing_tpu.engine import invert as I
from diffusion_image_editing_tpu.engine.denoise import DecodeClosure, make_eps_fn
from diffusion_image_editing_tpu.guidance.attr_functions import (
    MultiColorAttrFunc,
    SingleColorAttrFunc,
)
from diffusion_image_editing_tpu.models import TINY_UNET2D, UNet2D
from diffusion_image_editing_tpu.models.port import port_state_dict

N_STEPS = 10


@pytest.fixture(scope="module")
def ref():
    return rh.load_reference_algorithms()


@pytest.fixture(scope="module")
def rig():
    """Tiny mirror UNet on both sides + one shared schedule."""
    torch.manual_seed(7)
    mirror = tm.TorchUNet2D(TINY_UNET2D, attn_naming="legacy").eval()
    params = port_state_dict(
        {k: v.numpy() for k, v in mirror.state_dict().items()}, "unet2d"
    )
    params = jax.tree.map(jnp.asarray, params)
    model_jax = UNet2D(TINY_UNET2D)
    sched = S.make_schedule(num_inference_steps=N_STEPS, clip_sample=False)
    stub = rh.StubModel(
        sched, mirror, TINY_UNET2D.in_channels, TINY_UNET2D.sample_size
    )
    eps_fn = make_eps_fn(model_jax.apply, params)
    return stub, sched, eps_fn


def _x0(seed=0, scale=0.5):
    x = np.random.RandomState(seed).normal(
        size=(1, 3, TINY_UNET2D.sample_size, TINY_UNET2D.sample_size)
    ).astype(np.float32) * scale
    return torch.tensor(x), jnp.asarray(rh.nhwc(x))


def test_ref_ddim_inversion_parity(ref, rig):
    stub, sched, eps_fn = rig
    x0_t, x0_j = _x0(0)
    with torch.no_grad():
        xT_ref = ref["ddim_inversion"].ddim_inversion(stub, x0_t).numpy()
    xT = I.ddim_invert(sched, eps_fn, x0_j)
    np.testing.assert_allclose(rh.nchw(xT), xT_ref, rtol=1e-4, atol=1e-5)


def _ref_ddpm_invert(ref, stub, x0_t, seed):
    """Run the reference's `inversion_forward_process` at eta=1; the same
    torch seed replays `sample_xts_from_x0`'s noise draws so the sampled
    trajectory can be captured separately and fed to the JAX engine."""
    torch.manual_seed(seed)
    xts0 = ref["ddpm_inversion"].sample_xts_from_x0(
        stub, x0_t, num_inference_steps=N_STEPS
    ).clone()
    torch.manual_seed(seed)
    with torch.no_grad():
        xt, zs, xts = ref["ddpm_inversion"].inversion_forward_process(
            stub, x0_t, etas=1, num_inference_steps=N_STEPS
        )
    return xts0, xt, zs, xts


def _to_jax_traj(arr_t):
    """(S[+1], C, H, W) torch trajectory -> (S[+1], 1, H, W, C) jax."""
    return jnp.asarray(np.transpose(arr_t.numpy(), (0, 2, 3, 1)))[:, None]


def test_ref_ddpm_inversion_parity(ref, rig):
    stub, sched, eps_fn = rig
    x0_t, x0_j = _x0(1)
    xts0_t, xt_ref, zs_ref, xts_ref = _ref_ddpm_invert(ref, stub, x0_t, seed=3)

    res = I.ddpm_invert(sched, eps_fn, x0_j, eta=1.0, xts=_to_jax_traj(xts0_t))

    # zs: both sides zero the last row; earlier rows are (x_{t-1}-mu)/sigma
    np.testing.assert_allclose(
        np.transpose(np.asarray(res.zs[:, 0]), (0, 3, 1, 2)),
        zs_ref.numpy(), rtol=1e-3, atol=1e-4,
    )
    # corrected trajectory + inverted latent
    np.testing.assert_allclose(
        np.transpose(np.asarray(res.xts[:, 0]), (0, 3, 1, 2)),
        xts_ref.numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        rh.nchw(res.xt), xt_ref.numpy(), rtol=1e-4, atol=1e-5
    )


def test_ref_ddpm_inversion_eta0_parity(ref, rig):
    stub, sched, eps_fn = rig
    x0_t, x0_j = _x0(2)
    with torch.no_grad():
        xT_ref, zs_ref, xts_ref = ref["ddpm_inversion"].inversion_forward_process(
            stub, x0_t, etas=0, num_inference_steps=N_STEPS
        )
    assert zs_ref is None and xts_ref is None
    res = I.ddpm_invert(sched, eps_fn, x0_j, eta=0.0)
    assert res.zs is None and res.xts is None
    np.testing.assert_allclose(rh.nchw(res.xt), xT_ref.numpy(), rtol=1e-4, atol=1e-5)


def test_ref_ddpm_sample_parity(ref, rig):
    stub, sched, eps_fn = rig
    x0_t, x0_j = _x0(3)
    xts0_t, _, zs_ref, xts_ref = _ref_ddpm_invert(ref, stub, x0_t, seed=5)
    t_skip = 3
    with torch.no_grad():
        out_ref = ref["ddpm_inversion"].sample(
            stub, zs_ref, xts_ref, Tskip=t_skip, eta=1, prog_bar=False
        ).numpy()

    res = I.ddpm_invert(sched, eps_fn, x0_j, eta=1.0, xts=_to_jax_traj(xts0_t))
    # reference's xts rows are single images; ddpm_sample starts at xts[t_skip]
    out = I.ddpm_sample(
        sched, eps_fn, res.zs, res.xts, t_skip=t_skip, eta=1.0
    )
    np.testing.assert_allclose(rh.nchw(out), out_ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("eta", [0.0, 1.0])
def test_ref_generation_loop_parity(ref, rig, eta):
    """The reference's own `diffusion_loop` + `get_noise_pred` +
    `single_step` (driving the stub scheduler's diffusers-semantics `step`)
    vs our jitted `generate` scan, with clip_sample=True to exercise the
    pred-x0 clipping path."""
    stub_unclipped, sched_unclipped, eps_fn = rig
    sched = sched_unclipped.with_clip_sample(True)
    stub = rh.StubModel(
        sched, stub_unclipped.unet.mirror, TINY_UNET2D.in_channels,
        TINY_UNET2D.sample_size,
    )
    du = ref["diffusion_utils"]
    xt_t, xt_j = _x0(4, scale=1.0)
    if eta > 0:
        zs_np = np.random.RandomState(9).normal(
            size=(N_STEPS, 1, 3, TINY_UNET2D.sample_size, TINY_UNET2D.sample_size)
        ).astype(np.float32)
        zs_t = torch.tensor(zs_np)
        zs_j = jnp.asarray(np.transpose(zs_np, (0, 1, 3, 4, 2)))
    else:
        zs_t = zs_j = None

    x = xt_t
    with torch.no_grad():
        for step_idx, t in du.diffusion_loop(stub, zs=zs_t, prog_bar=False):
            noise_pred = du.get_noise_pred(stub, x, t)
            z = du.get_variance_noise(zs_t, step_idx, eta)
            x, _px0 = du.single_step(stub, noise_pred, t, x, eta, z)

    traj = D.generate(sched, eps_fn, xt_j, eta=eta, zs=zs_j, step_rule="ddim")
    # 10 chained UNet steps accumulate torch-vs-XLA conv reassociation noise
    np.testing.assert_allclose(rh.nchw(traj.x0), x.numpy(), rtol=1e-3, atol=2e-4)


def test_ref_mu_tilde_parity(ref, rig):
    stub, sched, eps_fn = rig
    x0_t, x0_j = _x0(5)
    xt_t, xt_j = _x0(6, scale=1.0)
    t = int(np.asarray(sched.timesteps)[2])
    ref_mu = ref["ddpm_inversion"].mu_tilde(stub, xt_t, x0_t, torch.tensor(t)).numpy()
    mu = S.mu_tilde(sched, xt_j, x0_j, jnp.int32(t))
    np.testing.assert_allclose(rh.nchw(mu), ref_mu, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("case", ["plain", "window_out", "mask_grad", "nudge_zt"])
def test_ref_guidance_nudge_parity(ref, rig, case):
    """`AttrFunc.apply` (the guided nudge: pred-x0 -> decode -> loss ->
    -autograd.grad * alpha_bar^2, `src/attr_functions.py:112-161`) vs our
    jax.grad-based apply, on identical inputs through the identity codec."""
    stub, sched, eps_fn = rig
    af_mod = ref["attr_functions"]
    xt_t, xt_j = _x0(7, scale=1.0)
    eps_np = np.random.RandomState(8).normal(size=xt_t.shape).astype(np.float32)
    zt_np = np.random.RandomState(10).normal(size=xt_t.shape).astype(np.float32)
    mask_np = (
        np.random.RandomState(11).uniform(size=(1, 1, 16, 16)) > 0.5
    ).astype(np.float32)
    t = int(np.asarray(sched.timesteps)[4])
    step_idx = 4

    kwargs = {}
    common = dict(loss_scale=2.0, t1=0, t2=N_STEPS)
    ours = dict(loss_scale=2.0, t1=0, t2=N_STEPS)
    if case == "window_out":
        common.update(t1=5, t2=6)  # step_idx=4 outside the window
        ours.update(t1=5, t2=6)
    if case == "mask_grad":
        kwargs = dict(mask_attr_grad=True, mask=torch.tensor(mask_np))
        ours.update(mask_attr_grad=True)
    if case == "nudge_zt":
        common.update(nudge_zt=True)
        ours.update(nudge_zt=True)

    ref_af = af_mod.SingleColorAttrFunc(target=0.8, color_idx=1, **common)
    xt_in = xt_t.clone().requires_grad_(True)
    xt_ref, zt_ref = ref_af.apply(
        xt_in, torch.tensor(zt_np), torch.tensor(eps_np), torch.tensor(t),
        step_idx, stub, **kwargs,
    )

    af = SingleColorAttrFunc(target=0.8, color_idx=1, **ours)
    xt_out, zt_out = af.apply(
        xt_j, jnp.asarray(rh.nhwc(zt_np)), jnp.asarray(rh.nhwc(eps_np)),
        jnp.int32(t), jnp.int32(step_idx), sched, DecodeClosure(),
        mask=jnp.asarray(np.transpose(mask_np, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(
        rh.nchw(xt_out), xt_ref.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        rh.nchw(zt_out), zt_ref.detach().numpy(), rtol=1e-4, atol=1e-5
    )


def test_ref_multicolor_loss_parity(ref):
    """The colour losses themselves (`src/attr_functions.py:22-37`)."""
    af_mod = ref["attr_functions"]
    img = np.random.RandomState(12).uniform(-1, 1, (2, 3, 8, 8)).astype(np.float32)
    ref_loss = af_mod.color_loss(torch.tensor(img), 0.9, 0.2, 0.4).item()
    ours = MultiColorAttrFunc(r_target=0.9, g_target=0.2, b_target=0.4).loss(
        jnp.asarray(rh.nhwc(img))
    )
    np.testing.assert_allclose(float(ours), ref_loss, rtol=1e-6)
    ref_single = af_mod.single_color_loss(torch.tensor(img), 2, 0.3).item()
    ours_single = SingleColorAttrFunc(target=0.3, color_idx=2).loss(
        jnp.asarray(rh.nhwc(img))
    )
    np.testing.assert_allclose(float(ours_single), ref_single, rtol=1e-6)


@pytest.mark.parametrize("mode", ["split", "fused"])
def test_ref_pipeline_end_to_end_golden(ref, rig, mode):
    """Fixed-noise END-TO-END product golden (VERDICT r2 item 10): the
    reference's own functions composed exactly as
    `SegDiffEditPipeline.edit_image` composes them for the flagship
    ddpm-inversion + Tskip + guided case (`SegDiffEditPipeline.py:244-296`:
    get_noise_pred -> reverse_step -> attr_func.apply per step) vs our
    `EditPipeline.edit_image`, from the same inversion products. Covers the
    whole pipeline-level contract — step_idx conventions under Tskip, zs
    slicing, nudge placement — not just the per-function algebra."""
    from diffusion_image_editing_tpu.pipeline import DDPM, EditPipeline

    stub, sched, eps_fn = rig
    af_mod = ref["attr_functions"]
    du = ref["diffusion_utils"]
    dp = ref["ddpm_inversion"]
    t_skip, eta = 3, 1.0

    x0_t, x0_j = _x0(13)
    xts0_t, _, zs_ref, xts_ref = _ref_ddpm_invert(ref, stub, x0_t, seed=17)

    # ---- reference chain (its own released code, composed per the pipeline)
    ref_af = af_mod.SingleColorAttrFunc(
        target=0.7, color_idx=2, loss_scale=3.0, t1=0, t2=N_STEPS
    )
    xt = xts_ref[t_skip].unsqueeze(0)
    zs_sl = zs_ref[t_skip:]
    for step_idx, timestep in du.diffusion_loop(stub, zs_sl, prog_bar=False):
        with torch.no_grad():
            noise_pred = du.get_noise_pred(stub, xt, timestep)
        variance_noise = du.get_variance_noise(zs_sl, step_idx, eta)
        xt = dp.reverse_step(
            model=stub, model_output=noise_pred, timestep=timestep,
            sample=xt, eta=eta, variance_noise=variance_noise,
        )
        xt, variance_noise = ref_af.apply(
            xt=xt, zt=variance_noise, model_output=noise_pred,
            timestep=timestep, step_idx=step_idx, model=stub,
        )
    ref_img = xt.detach().numpy()

    # ---- our pipeline, from the same inversion products
    from diffusion_image_editing_tpu.models import TINY_UNET2D, UNet2D
    from diffusion_image_editing_tpu.models.port import port_state_dict

    mirror = stub.unet.mirror
    params = jax.tree.map(
        jnp.asarray,
        port_state_dict(
            {k: v.numpy() for k, v in mirror.state_dict().items()}, "unet2d"
        ),
    )
    w = DDPM(UNet2D(TINY_UNET2D), params, sched)
    pipe = EditPipeline(w, None)
    af = SingleColorAttrFunc(
        target=0.7, color_idx=2, loss_scale=3.0, t1=0, t2=N_STEPS
    )
    res = I.ddpm_invert(sched, eps_fn, x0_j, eta=eta, xts=_to_jax_traj(xts0_t))
    out = pipe.edit_image(
        res.xt, eta=eta, zs=res.zs, xts=res.xts, attr_func=af,
        inversion_method="ddpm", t_skip=t_skip, collect=False, mode=mode,
    )
    np.testing.assert_allclose(
        rh.nchw(out.imgs), ref_img, rtol=1e-3, atol=1e-4
    )
