import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from diffusion_image_editing_tpu.ops.abn import (
    _act_forward,
    fused_abn,
    fused_abn_train,
    invert_activation,
    mean_var,
)


def _abn_reference(x, w, b, eps=1e-5, activation="leaky_relu", slope=0.01):
    """Plain-jnp ABN used as the autodiff oracle."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean((xf - mean) ** 2, axis=(0, 1, 2))
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * jnp.abs(w) + b
    return _act_forward(y, activation, slope)


def _setup(key=0, shape=(4, 8, 8, 16)):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    x = jax.random.normal(ks[0], shape, jnp.float32)
    w = jax.random.normal(ks[1], (shape[-1],)) * 0.2 + 1.0
    b = jax.random.normal(ks[2], (shape[-1],)) * 0.1
    return x, w, b


@pytest.mark.parametrize("activation", ["leaky_relu", "elu", "identity"])
def test_forward_matches_reference(activation):
    x, w, b = _setup()
    y = fused_abn_train(x, w, b, 1e-5, activation, 0.01, None, False)
    ref = _abn_reference(x, w, b, activation=activation)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("activation", ["leaky_relu", "elu"])
def test_backward_matches_autodiff(activation):
    """The explicit two-phase (edz/eydz) backward must equal jax autodiff of
    the unfused reference — the correctness anchor of the native kernel suite."""
    x, w, b = _setup(1)

    def f_fused(x_, w_, b_):
        return jnp.sum(fused_abn_train(x_, w_, b_, 1e-5, activation, 0.01, None, False) ** 2)

    def f_ref(x_, w_, b_):
        return jnp.sum(_abn_reference(x_, w_, b_, activation=activation) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("activation", ["leaky_relu", "elu"])
def test_activation_inversion(activation):
    y = jax.random.normal(jax.random.PRNGKey(2), (128,))
    act = _act_forward(y, activation, 0.01)
    rec = invert_activation(act, activation, 0.01)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(y), rtol=1e-5, atol=1e-5)


def test_sync_abn_matches_global_stats():
    """InPlaceABNSync equivalence: per-device fused_abn with axis_name psum
    must equal single-device fused_abn over the concatenated global batch."""
    devices = jax.devices()
    assert len(devices) == 8
    mesh = Mesh(np.array(devices), ("dp",))
    x, w, b = _setup(3, shape=(16, 4, 4, 8))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("dp"), P(), P()),
        out_specs=P("dp"),
    )
    def synced(x_, w_, b_):
        return fused_abn_train(x_, w_, b_, 1e-5, "leaky_relu", 0.01, "dp", False)

    y_sync = synced(x, w, b)
    y_global = fused_abn_train(x, w, b, 1e-5, "leaky_relu", 0.01, None, False)
    np.testing.assert_allclose(np.asarray(y_sync), np.asarray(y_global), rtol=1e-4, atol=1e-5)


def test_sync_abn_grads_match_global():
    devices = jax.devices()
    mesh = Mesh(np.array(devices), ("dp",))
    x, w, b = _setup(4, shape=(16, 4, 4, 8))

    def global_loss(x_, w_, b_):
        return jnp.sum(fused_abn_train(x_, w_, b_, 1e-5, "leaky_relu", 0.01, None, False) ** 2)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P("dp"), P(), P()), out_specs=P()
    )
    def sharded_loss_grads(x_, w_, b_):
        def local_loss(xl, wl, bl):
            y = fused_abn_train(xl, wl, bl, 1e-5, "leaky_relu", 0.01, "dp", False)
            return jnp.sum(y**2)

        # Param grads come out already psum'd by the custom vjp (replicated
        # params ⇒ summed cotangent).
        gx, gw, gb = jax.grad(local_loss, argnums=(0, 1, 2))(x_, w_, b_)
        return gw, gb

    gw_sync, gb_sync = sharded_loss_grads(x, w, b)
    _, gw_ref, gb_ref = jax.grad(global_loss, argnums=(0, 1, 2))(x, w, b)
    np.testing.assert_allclose(np.asarray(gw_sync), np.asarray(gw_ref), rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_sync), np.asarray(gb_ref), rtol=2e-3, atol=1e-4)


def test_eval_mode_uses_running_stats():
    x, w, b = _setup(5)
    rm = jnp.zeros(x.shape[-1])
    rv = jnp.ones(x.shape[-1])
    y = fused_abn(
        x, w, b, activation="identity", running_mean=rm, running_var=rv,
        training=False, use_pallas=False,
    )
    expected = x * jnp.abs(w) / jnp.sqrt(1 + 1e-5) + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected), rtol=1e-4, atol=1e-5)


def test_running_stats_update():
    x, w, b = _setup(6)
    rm = jnp.zeros(x.shape[-1])
    rv = jnp.ones(x.shape[-1])
    _, new_m, new_v = fused_abn(
        x, w, b, running_mean=rm, running_var=rv, training=True, use_pallas=False,
        momentum=0.1,
    )
    m, v = mean_var(x)
    count = x.size // x.shape[-1]
    np.testing.assert_allclose(np.asarray(new_m), 0.1 * np.asarray(m), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new_v),
        0.9 + 0.1 * np.asarray(v) * count / (count - 1),
        rtol=1e-4,
        atol=1e-6,
    )


def test_abn_pallas_apply_interpret_matches_reference():
    """Regression: the Pallas apply kernel's out_shape must match its 3-D
    block spec (caught on real TPU; interpret mode covers it in CI)."""
    from diffusion_image_editing_tpu.ops.abn import _abn_apply

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 128))
    m = jnp.zeros((128,))
    r = jnp.ones((128,))
    w = jnp.ones((128,)) * 1.1
    b = jnp.zeros((128,)) + 0.2
    out = _abn_apply(x, m, r, w, b, "leaky_relu", 0.01, True, interpret=True)
    ref = _abn_apply(x, m, r, w, b, "leaky_relu", 0.01, False)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
