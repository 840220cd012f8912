import numpy as np
import jax.numpy as jnp

from diffusion_image_editing_tpu.ops import native
from diffusion_image_editing_tpu.seg import merge_part_masks
from diffusion_image_editing_tpu.seg.data import CELEBA_PART_NAMES


def test_native_lib_builds():
    assert native.host_lib() is not None, "g++ toolchain expected in this image"


def test_merge_part_masks_native_matches_python():
    rng = np.random.RandomState(0)
    parts = (rng.rand(18, 64, 64) > 0.9).astype(np.uint8) * 225
    out = native.merge_part_masks_native(parts)
    ref = merge_part_masks(
        {att: parts[i] for i, att in enumerate(CELEBA_PART_NAMES)}, size=64
    )
    np.testing.assert_array_equal(out, ref)


def test_resize_bilinear_u8_matches_numpy_fallback():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (32, 48, 3), np.uint8)
    fast = native.resize_bilinear_u8(img, 16, 24)
    # numpy fallback path
    lib = native._LIBS.pop("host_ops")
    native._LIBS["host_ops"] = None
    slow = native.resize_bilinear_u8(img, 16, 24)
    native._LIBS["host_ops"] = lib
    assert fast.shape == slow.shape == (16, 24, 3)
    assert np.mean(np.abs(fast.astype(int) - slow.astype(int))) < 1.0


def test_normalize_imagenet_native():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (8, 8, 3), np.uint8)
    out = native.normalize_imagenet(img)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    ref = ((img / 255.0).astype(np.float32) - mean) / std
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_to_symmetric_range_native():
    img = np.arange(0, 256, dtype=np.uint8).reshape(16, 16)
    out = native.to_symmetric_range(img)
    np.testing.assert_allclose(out, img.astype(np.float32) * 2 / 255 - 1, rtol=1e-5, atol=1e-6)


def test_label_merge_ffi_custom_call():
    rng = np.random.RandomState(3)
    parts = (rng.rand(5, 256) > 0.8).astype(np.uint8) * 225
    out = np.asarray(native.label_merge_ffi(jnp.asarray(parts)))
    ref = np.zeros(256, np.uint8)
    for i in range(5):
        ref[parts[i] == 225] = i + 1
    np.testing.assert_array_equal(out, ref)


def test_imagenet_normalize_ffi():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 255, (64, 3), np.uint8)
    out = np.asarray(native.imagenet_normalize_ffi(jnp.asarray(img)))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    np.testing.assert_allclose(out, ((img / 255.0) - mean) / std, rtol=1e-4, atol=1e-5)
