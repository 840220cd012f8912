import numpy as np
from PIL import Image

from diffusion_image_editing_tpu.host import array_to_pil, arrays_to_pils, pil_to_array


def test_roundtrip_pil_array():
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (16, 16, 3), dtype=np.uint8))
    arr = pil_to_array(img)
    assert arr.shape == (1, 16, 16, 3)
    assert arr.min() >= -1.0 and arr.max() <= 1.0
    back = array_to_pil(arr)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1)


def test_mask_2d_to_pil():
    mask = np.zeros((8, 8), np.float32)
    mask[:4] = 1
    pil = array_to_pil(mask)
    assert pil.size == (8, 8)


def test_batch_to_pils():
    arrs = np.zeros((3, 8, 8, 3), np.float32)
    pils = arrays_to_pils(arrs)
    assert len(pils) == 3


def test_pil_list_to_array():
    imgs = [Image.new("RGB", (8, 8)) for _ in range(2)]
    arr = pil_to_array(imgs)
    assert arr.shape == (2, 8, 8, 3)
