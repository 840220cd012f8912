"""Fused GN+SiLU->conv3x3 kernel: coeffs algebra, Pallas kernel (interpret
mode — CLAUDE.md rule 5), exact-VJP, and model-path equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_image_editing_tpu.ops import conv as conv_ops
from diffusion_image_editing_tpu.ops.fused_conv import (
    _jnp_fwd,
    _pallas_fwd,
    _plan,
    affine_silu_conv3x3,
    gn_affine_coeffs,
)
from diffusion_image_editing_tpu.ops.groupnorm import group_norm_reference


def _ref_composition(x, scale, bias, w, cbias, groups, eps, shift=None):
    xs = x if shift is None else x + shift[:, None, None, :].astype(x.dtype)
    h = group_norm_reference(xs, scale, bias, groups, eps, act="silu")
    y = conv_ops.conv3x3_xla(h, w.astype(h.dtype))
    return y + cbias.astype(y.dtype)


def _mk(key, b=2, h=8, w=8, cin=16, cout=8, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (b, h, w, cin), dtype)
    scale = jax.random.normal(ks[1], (cin,), jnp.float32) * 0.2 + 1.0
    bias = jax.random.normal(ks[2], (cin,), jnp.float32) * 0.1
    wk = jax.random.normal(ks[3], (3, 3, cin, cout), jnp.float32) * 0.1
    cbias = jax.random.normal(ks[4], (cout,), jnp.float32) * 0.1
    shift = jax.random.normal(ks[5], (b, cin), jnp.float32) * 0.5
    return x, scale, bias, wk, cbias, shift


@pytest.mark.parametrize("use_shift", [False, True])
def test_coeffs_match_groupnorm(use_shift):
    x, scale, bias, wk, cbias, shift = _mk(jax.random.PRNGKey(0))
    sh = shift if use_shift else None
    a, b = gn_affine_coeffs(x, scale, bias, 4, 1e-6, shift=sh)
    got = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    xs = x if sh is None else x + shift[:, None, None, :]
    want = group_norm_reference(xs, scale, bias, 4, 1e-6, act=None)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "b,h,w,cin,cout",
    [(2, 8, 8, 16, 8), (1, 16, 16, 32, 16), (2, 8, 12, 24, 16)],
)
def test_pallas_kernel_matches_jnp(b, h, w, cin, cout):
    x, scale, bias, wk, cbias, _ = _mk(
        jax.random.PRNGKey(1), b=b, h=h, w=w, cin=cin, cout=cout
    )
    a, bb = gn_affine_coeffs(x, scale, bias, 4, 1e-6)
    plan = _plan(x.shape, cin, cout, 4)
    assert plan is not None
    got = _pallas_fwd(x, a, bb, wk, cbias, plan, interpret=True)
    want = _jnp_fwd(x, a, bb, wk, cbias)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_op_matches_reference_composition():
    x, scale, bias, wk, cbias, shift = _mk(jax.random.PRNGKey(2))
    a, bb = gn_affine_coeffs(x, scale, bias, 4, 1e-6, shift=shift)
    got = affine_silu_conv3x3(x, a, bb, wk, cbias)
    want = _ref_composition(x, scale, bias, wk, cbias, 4, 1e-6, shift=shift)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_vjp_matches_autodiff():
    """Hand-written bwd == autodiff of the reference composition, for every
    cotangent (x, gn scale/bias, shift, conv kernel, conv bias)."""
    x, scale, bias, wk, cbias, shift = _mk(jax.random.PRNGKey(3))

    def fused(x_, scale_, bias_, w_, cbias_, shift_):
        a, bb = gn_affine_coeffs(x_, scale_, bias_, 4, 1e-6, shift=shift_)
        return jnp.sum(jnp.sin(affine_silu_conv3x3(x_, a, bb, w_, cbias_)))

    def ref(x_, scale_, bias_, w_, cbias_, shift_):
        return jnp.sum(
            jnp.sin(_ref_composition(x_, scale_, bias_, w_, cbias_, 4, 1e-6,
                                     shift=shift_))
        )

    args = (x, scale, bias, wk, cbias, shift)
    g_fused = jax.grad(fused, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_ref = jax.grad(ref, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(gf, gr, rtol=5e-4, atol=5e-4)


def test_coeffs_stable_at_large_mean():
    """x ~ N(50, 1): the one-pass E[x^2]-E[x]^2 form cancels catastrophically
    here (ADVICE r4); the two-pass form must stay at normal tolerance."""
    key = jax.random.PRNGKey(9)
    x = jax.random.normal(key, (2, 8, 8, 16), jnp.float32) + 50.0
    scale = jnp.ones((16,)) * 1.3
    bias = jnp.ones((16,)) * 0.1
    shift = jnp.full((2, 16), 25.0) + jax.random.normal(
        jax.random.fold_in(key, 1), (2, 16)
    )
    for sh in (None, shift):
        a, b = gn_affine_coeffs(x, scale, bias, 4, 1e-6, shift=sh)
        got = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
        xs = x if sh is None else x + sh[:, None, None, :]
        want = group_norm_reference(xs, scale, bias, 4, 1e-6, act=None)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_plan_tiles_are_lane_aligned():
    """Every plan's channel tiles must be multiples of 128 or the full dim
    (Mosaic lane tiling, ADVICE r4) — partial non-aligned blocks compile in
    interpret mode but break on the chip."""
    for shape, cin, cout in [
        ((2, 32, 32, 640), 640, 640),
        ((2, 16, 16, 1280), 1280, 1280),
        ((2, 16, 16, 2560), 2560, 1280),
        ((1, 64, 64, 512), 512, 512),
        ((1, 32, 32, 256), 256, 256),
    ]:
        plan = _plan(shape, cin, cout, 2)
        assert plan is not None, shape
        ct_in, ct_out = plan
        assert ct_in % 128 == 0 or ct_in == cin, (shape, plan)
        assert ct_out % 128 == 0 or ct_out == cout, (shape, plan)
        assert cin % ct_in == 0 and cout % ct_out == 0, (shape, plan)


def test_plan_rejects_large_spatial():
    # H >= 128 belongs to the int8 window; the fused plan must decline.
    assert _plan((1, 128, 128, 512), 512, 512, 2) is None
    assert _plan((1, 512, 512, 128), 128, 128, 2) is None
    # UNet body stages with 128-aligned channel tiles must plan.
    assert _plan((2, 32, 32, 640), 640, 640, 2) is not None
    assert _plan((2, 16, 16, 1280), 1280, 1280, 2) is not None
    assert _plan((2, 16, 16, 2560), 2560, 1280, 2) is not None
    # 320 channels has no 128-multiple divisor and the full-dim block at
    # 64x64 spatial needs ~28 MB > VMEM — falls back to XLA by design
    # (lane-tiling alignment, ADVICE r4).
    assert _plan((2, 64, 64, 320), 320, 320, 2) is None


def test_resnet_block_fused_path_matches(monkeypatch):
    """ResnetBlock2D with DIE_TPU_FUSED_CONV=1 (CPU -> jnp fallback branch
    of the SAME call path) equals the unfused block bit-for-bit semantics
    at f32 tolerance, including the temb fold."""
    from diffusion_image_editing_tpu.models.layers import ResnetBlock2D

    blk = ResnetBlock2D(out_channels=16, norm_num_groups=4)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 16), jnp.float32)
    temb = jax.random.normal(jax.random.PRNGKey(5), (2, 12), jnp.float32)
    params = blk.init(jax.random.PRNGKey(6), x, temb)

    monkeypatch.delenv("DIE_TPU_FUSED_CONV", raising=False)
    want = blk.apply(params, x, temb)
    monkeypatch.setenv("DIE_TPU_FUSED_CONV", "1")
    got = blk.apply(params, x, temb)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
