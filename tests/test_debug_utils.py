import jax
import jax.numpy as jnp
import pytest
from jax.experimental import checkify

from diffusion_image_editing_tpu.utils.debug import assert_finite, checkify_nans


def test_checkify_nans_catches_division():
    def f(x):
        return 1.0 / x

    guarded = checkify_nans(f)
    assert float(guarded(jnp.float32(2.0))) == 0.5
    with pytest.raises(checkify.JaxRuntimeError):
        guarded(jnp.float32(0.0))


def test_checkify_on_scan_step():
    from diffusion_image_editing_tpu.core import ddim_step, make_schedule

    sched = make_schedule(clip_sample=False)

    def step(x):
        return ddim_step(sched, x, jnp.zeros_like(x), jnp.int32(500), eta=0.0)[0]

    guarded = checkify_nans(step)
    out = guarded(jnp.ones((1, 4, 4, 3)))
    assert out.shape == (1, 4, 4, 3)


def test_assert_finite():
    assert_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_finite({"a": jnp.array([1.0, jnp.nan])})
