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
