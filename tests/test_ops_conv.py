"""Measured-dispatch conv3x3 (`ops/conv.py`): the shift9 decomposition must
be numerically interchangeable with the XLA conv — dispatch changes placement
of FLOPs, never math (round-3 survey: shift9 reaches 60-96% of MXU peak on
the small-spatial UNet/VAE shapes where XLA sits at 36-75%)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusion_image_editing_tpu.ops.conv import (
    Conv3x3,
    conv3x3_shift9,
    conv3x3_xla,
    conv_mode,
)


def _data(b=2, h=8, w=8, cin=12, cout=20, seed=0):
    k = jax.random.PRNGKey(seed)
    x = jax.random.normal(k, (b, h, w, cin), jnp.float32)
    wgt = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, cin, cout)) * 0.1
    return x, wgt


def test_shift9_matches_xla_forward():
    x, w = _data()
    np.testing.assert_allclose(
        np.asarray(conv3x3_shift9(x, w)), np.asarray(conv3x3_xla(x, w)),
        rtol=1e-5, atol=1e-5,
    )


def test_shift9_matches_xla_grads():
    """Both dgrad (guidance VJP) and wgrad (seg training) must agree."""
    x, w = _data(b=1, h=6, w=6, cin=8, cout=8)

    def loss(f, x_, w_):
        return jnp.sum(jnp.sin(f(x_, w_)))

    gx0, gw0 = jax.grad(lambda a, b_: loss(conv3x3_xla, a, b_), argnums=(0, 1))(x, w)
    gx1, gw1 = jax.grad(lambda a, b_: loss(conv3x3_shift9, a, b_), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw0), np.asarray(gw1), rtol=1e-5, atol=1e-5)


def test_conv3x3_module_matches_nn_conv_params_and_output():
    """Drop-in contract: same param structure as nn.Conv and identical output
    through the XLA path (checkpoint ports must be oblivious)."""
    from flax import linen as nn

    x, _ = _data(cin=5, cout=7)
    mod = Conv3x3(7)
    params = mod.init(jax.random.PRNGKey(0), x)
    assert set(params["params"].keys()) == {"kernel", "bias"}
    assert params["params"]["kernel"].shape == (3, 3, 5, 7)
    assert params["params"]["bias"].shape == (7,)

    ref = nn.Conv(7, (3, 3), padding=1)
    out_ref = ref.apply(params, x)
    out = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=1e-5, atol=1e-5)


def test_forced_shift9_through_module(monkeypatch):
    monkeypatch.setenv("DIE_TPU_CONV", "shift9")
    x, _ = _data(cin=5, cout=7)
    mod = Conv3x3(7)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    monkeypatch.setenv("DIE_TPU_CONV", "xla")
    out_ref = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=1e-5, atol=1e-5)


def test_conv_mode_validation(monkeypatch):
    monkeypatch.setenv("DIE_TPU_CONV", "bogus")
    with pytest.raises(ValueError):
        conv_mode()


def test_int8_close_to_xla_forward():
    """Post-training int8 (per-tensor act, per-Cout weight) tracks the exact
    conv within quantization tolerance on well-scaled data."""
    from diffusion_image_editing_tpu.ops.conv import conv3x3_int8

    x, w = _data(b=2, h=16, w=16, cin=32, cout=48)
    y8 = np.asarray(conv3x3_int8(x, w), np.float32)
    yx = np.asarray(conv3x3_xla(x, w), np.float32)
    rel = np.linalg.norm(y8 - yx) / np.linalg.norm(yx)
    assert rel < 0.02, rel  # ~1% typical for s8 with 3*3*32 accumulation


def test_int8_backward_is_straight_through_xla():
    """VJP contract: int8 gradients are EXACTLY the bf16/xla conv's VJP at the
    unquantized operands (guidance + training see unquantized math)."""
    from diffusion_image_editing_tpu.ops.conv import conv3x3_int8

    x, w = _data(b=1, h=6, w=6, cin=8, cout=8)
    g = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 6, 8), jnp.float32)

    _, vjp8 = jax.vjp(conv3x3_int8, x, w)
    _, vjpx = jax.vjp(conv3x3_xla, x, w)
    gx8, gw8 = vjp8(g)
    gxx, gwx = vjpx(g)
    np.testing.assert_array_equal(np.asarray(gx8), np.asarray(gxx))
    np.testing.assert_array_equal(np.asarray(gw8), np.asarray(gwx))


def test_int8_zero_input_and_dtype_preserved():
    from diffusion_image_editing_tpu.ops.conv import conv3x3_int8

    x = jnp.zeros((1, 4, 4, 8), jnp.bfloat16)
    w = jnp.zeros((3, 3, 8, 16), jnp.bfloat16)
    y = conv3x3_int8(x, w)
    assert y.dtype == jnp.bfloat16
    assert not np.any(np.isnan(np.asarray(y, np.float32)))
    np.testing.assert_array_equal(np.asarray(y, np.float32), 0.0)


def test_int8_mode_dispatch_through_module(monkeypatch):
    from diffusion_image_editing_tpu.ops import conv as conv_mod

    x, _ = _data(cin=5, cout=7)
    mod = Conv3x3(7)
    params = mod.init(jax.random.PRNGKey(0), x)
    before = dict(conv_mod.TRACE_COUNTS)
    monkeypatch.setenv("DIE_TPU_CONV", "int8")
    out8 = mod.apply(params, x)
    assert conv_mod.TRACE_COUNTS["int8"] > before["int8"]
    monkeypatch.setenv("DIE_TPU_CONV", "xla")
    outx = mod.apply(params, x)
    rel = (np.linalg.norm(np.asarray(out8 - outx, np.float32))
           / np.linalg.norm(np.asarray(outx, np.float32)))
    assert rel < 0.05, rel


def test_int8_large_gates_on_spatial_size(monkeypatch):
    """int8_large routes H>=MIN_H convs to int8 and smaller-spatial ones to
    the measured-auto (xla) path; the default gate is the e2e-measured
    winner, 128 (only the huge-spatial decode stages)."""
    from diffusion_image_editing_tpu.ops import conv as conv_mod

    assert conv_mod._INT8_MIN_H_DEFAULT == 128
    monkeypatch.setenv("DIE_TPU_CONV", "int8_large")
    monkeypatch.setenv("DIE_TPU_INT8_MIN_H", "32")
    w_small = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 8, 8)) * 0.1
    x_small = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 8))
    before = dict(conv_mod.TRACE_COUNTS)
    conv_mod.conv3x3(x_small, w_small)
    assert conv_mod.TRACE_COUNTS["int8"] == before["int8"]
    assert conv_mod.TRACE_COUNTS["xla"] == before["xla"] + 1

    x_large = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 8))
    conv_mod.conv3x3(x_large, w_small)
    assert conv_mod.TRACE_COUNTS["int8"] == before["int8"] + 1


def test_int8_large_decoder_quality(monkeypatch):
    """Quality evidence for the opt-in int8 path: a full (tiny) VAE decode
    under DIE_TPU_CONV=int8_large stays close to the xla decode — the
    per-conv quantization error must not compound catastrophically through
    the stacked resnet blocks. Census-verified that int8 convs actually ran."""
    from diffusion_image_editing_tpu.models.vae import AutoencoderKL, AutoencoderConfig
    from diffusion_image_editing_tpu.ops import conv as conv_mod

    cfg = AutoencoderConfig(
        latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
        norm_num_groups=4, sample_size=64,
    )
    vae = AutoencoderKL(cfg)
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 32, 4))
    params = vae.init(jax.random.PRNGKey(4), jnp.zeros((1, 64, 64, 3)))

    monkeypatch.setenv("DIE_TPU_CONV", "xla")
    ref = np.asarray(vae.apply(params, z, method="decode"))

    monkeypatch.setenv("DIE_TPU_CONV", "int8_large")
    monkeypatch.setenv("DIE_TPU_INT8_MIN_H", "32")  # tiny decoder tops at 64
    before = dict(conv_mod.TRACE_COUNTS)
    out = np.asarray(vae.apply(params, z, method="decode"))
    assert conv_mod.TRACE_COUNTS["int8"] > before["int8"]

    err = np.linalg.norm(out - ref) / max(np.linalg.norm(ref), 1e-12)
    psnr = 20 * np.log10(
        (np.abs(ref).max() + 1e-12) / (np.sqrt(np.mean((out - ref) ** 2)) + 1e-12)
    )
    assert err < 0.15, (err, psnr)


def test_int8_bwd_dgrad_close_and_dw_exact(monkeypatch):
    """DIE_TPU_INT8_BWD=1 quantizes only dx (direction preserved within
    quantization noise); dw must stay bit-identical to the exact path."""
    from diffusion_image_editing_tpu.ops import conv as conv_mod

    x, w = _data(b=1, h=16, w=16, cin=8, cout=8)

    def loss(x_, w_):
        return jnp.sum(jnp.sin(conv_mod.conv3x3_int8(x_, w_)))

    monkeypatch.setenv("DIE_TPU_INT8_BWD", "0")
    gx0, gw0 = jax.grad(loss, argnums=(0, 1))(x, w)

    monkeypatch.setenv("DIE_TPU_INT8_BWD", "1")
    gx1, gw1 = jax.grad(loss, argnums=(0, 1))(x, w)

    np.testing.assert_array_equal(np.asarray(gw0), np.asarray(gw1))
    a, b = np.asarray(gx0, np.float64).ravel(), np.asarray(gx1, np.float64).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
    assert cos > 0.995, (cos, rel)
    assert rel < 0.10, (cos, rel)
