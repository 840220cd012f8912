import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from diffusion_image_editing_tpu.ops.morphology import dilate, erode, morphology2d
from diffusion_image_editing_tpu.ops.resize import resize_mask_hard


def test_dilate_matches_scipy():
    rng = np.random.RandomState(0)
    mask = (rng.rand(1, 16, 16, 1) > 0.8).astype(np.float32)
    out = dilate(jnp.asarray(mask), kernel_size=7)
    ref = ndimage.grey_dilation(mask[0, :, :, 0], size=(7, 7), mode="constant", cval=-np.inf)
    np.testing.assert_allclose(np.asarray(out)[0, :, :, 0], ref)


def test_erode_matches_scipy():
    rng = np.random.RandomState(1)
    mask = (rng.rand(1, 16, 16, 1) > 0.3).astype(np.float32)
    out = erode(jnp.asarray(mask), kernel_size=5)
    ref = ndimage.grey_erosion(mask[0, :, :, 0], size=(5, 5), mode="constant", cval=np.inf)
    np.testing.assert_allclose(np.asarray(out)[0, :, :, 0], ref)


def test_morphology2d_flat_equals_dilate():
    # morphology2d zero-pads borders (reference `fixed_padding` semantics),
    # dilate() pads with -inf: compare away from the border.
    rng = np.random.RandomState(2)
    x = rng.rand(1, 12, 12, 1).astype(np.float32)
    flat = morphology2d(jnp.asarray(x), kernel_size=7, op="dilation2d", soft_max=False)
    ref = dilate(jnp.asarray(x), kernel_size=7)
    np.testing.assert_allclose(
        np.asarray(flat)[:, 3:-3, 3:-3], np.asarray(ref)[:, 3:-3, 3:-3], rtol=1e-6
    )


def test_morphology2d_erosion_flat():
    rng = np.random.RandomState(3)
    x = rng.rand(1, 12, 12, 1).astype(np.float32)
    out = morphology2d(jnp.asarray(x), kernel_size=5, op="erosion2d", soft_max=False)
    ref = erode(jnp.asarray(x), kernel_size=5)
    np.testing.assert_allclose(
        np.asarray(out)[:, 2:-2, 2:-2], np.asarray(ref)[:, 2:-2, 2:-2], rtol=1e-6
    )


def test_soft_dilation_close_to_hard():
    rng = np.random.RandomState(4)
    x = rng.rand(1, 8, 8, 1).astype(np.float32)
    soft = morphology2d(jnp.asarray(x), kernel_size=3, soft_max=True, beta=100.0)
    hard = morphology2d(jnp.asarray(x), kernel_size=3, soft_max=False)
    np.testing.assert_allclose(np.asarray(soft), np.asarray(hard), atol=0.05)


def test_resize_mask_hard_threshold():
    mask = jnp.zeros((1, 8, 8, 1)).at[:, 2:6, 2:6, :].set(1.0)
    out = resize_mask_hard(mask, 4, 4)
    vals = np.unique(np.asarray(out))
    assert set(vals.tolist()) <= {0.0, 1.0}
