import numpy as np
from PIL import Image

from diffusion_image_editing_tpu.host.plotting import (
    add_source_image,
    concat_images,
    display_samples,
    show_images_in_a_grid,
)


def _img(v):
    return Image.new("RGB", (8, 8), (v, v, v))


def test_concat_images_horizontal():
    out = concat_images([_img(10), _img(20), _img(30)])
    assert out.size == (24, 8)


def test_add_source_image():
    out = add_source_image(_img(0), [_img(50), _img(100)])
    assert out.size == (24, 8)
    assert np.asarray(out)[0, 0, 0] == 0 and np.asarray(out)[0, 16, 0] == 100


def test_grid_with_row_labels():
    fig = show_images_in_a_grid(
        [_img(i * 20) for i in range(6)], num_cols=3,
        row_labels=["scale=1", "scale=2"], title="sweep",
    )
    assert fig is not None
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_display_samples_accepts_arrays():
    arrs = [np.zeros((8, 8, 3), np.float32), _img(30)]
    fig = display_samples(arrs, num_cols=2)
    assert fig is not None
    import matplotlib.pyplot as plt

    plt.close(fig)
