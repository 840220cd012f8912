"""End-to-end real-image editing flow on the reference's test fixture
(`/root/reference/test_image.png`, the 383KB face photo used as the
real-image editing input — SURVEY.md §4): align -> segment -> invert ->
mask-blend -> guided denoise -> PIL, exercising every pipeline stage with
tiny-architecture models (pretrained weights are not available here)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from diffusion_image_editing_tpu.core import make_schedule
from diffusion_image_editing_tpu.guidance import MultiColorAttrFunc, SingleColorAttrFunc
from diffusion_image_editing_tpu.host import align_face, array_to_pil, pil_to_array
from diffusion_image_editing_tpu.models import TINY_UNET2D, UNet2D
from diffusion_image_editing_tpu.pipeline import DDPM, EditPipeline

TEST_IMAGE = "/root/reference/test_image.png"
STEPS = 4

pytestmark = pytest.mark.skipif(
    not os.path.exists(TEST_IMAGE), reason="reference test image not present"
)


def synthetic_landmarks(w, h):
    lm = np.zeros((68, 2))
    lm[36:42] = [0.38 * w, 0.42 * h]  # left eye
    lm[42:48] = [0.62 * w, 0.42 * h]  # right eye
    lm[48] = [0.42 * w, 0.70 * h]  # mouth left
    lm[54] = [0.58 * w, 0.70 * h]  # mouth right
    return lm


def fake_segmentation(img):
    h, w = img.shape[1], img.shape[2]
    parsing = np.zeros((h, w), np.int32)
    parsing[h // 4 : h // 2, w // 4 : 3 * w // 4] = 17  # "hair"
    return jnp.asarray(parsing)


def _make_pipe():
    sched = make_schedule(num_inference_steps=STEPS, clip_sample=False)
    model = UNet2D(TINY_UNET2D)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.int32(0))
    return EditPipeline(DDPM(model, params, sched), fake_segmentation)


def test_full_real_image_edit_flow(tmp_path):
    raw = Image.open(TEST_IMAGE)
    aligned = align_face(
        raw, landmarks=synthetic_landmarks(*raw.size), output_size=16,
        transform_size=16,
    )
    assert aligned.size == (16, 16)
    img = jnp.asarray(pil_to_array(aligned))

    pipe = _make_pipe()
    xt, zs, xts, mask, parsing = pipe.prepare_real_image_edit(
        img, eta=1.0, inversion_method="ddpm", classes=[17], dilate_mask=True,
        key=jax.random.PRNGKey(1),
    )
    assert mask is not None and parsing is not None

    attr = MultiColorAttrFunc(
        r_target=0.8, g_target=0.1, b_target=0.1, loss_scale=10.0, t1=0, t2=STEPS,
        use_mask=True, mask_attr_grad=True,
    )
    out = pipe.edit_image(
        xt, eta=1.0, zs=zs, xts=xts, mask=mask, attr_func=attr,
        inversion_method="ddpm", t_skip=1, resynthesize=True,
        key=jax.random.PRNGKey(2),
    )
    assert not bool(jnp.any(jnp.isnan(out.imgs)))
    pil = array_to_pil(np.asarray(out.imgs))
    path = tmp_path / "edited.png"
    pil.save(path)
    assert path.exists()


def test_masked_region_loss_with_background_regulariser():
    pipe = _make_pipe()
    img = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 3)) * 0.1
    xt, zs, xts, mask, _ = pipe.prepare_real_image_edit(
        img, eta=0.0, inversion_method="ddim", classes=[17]
    )
    attr = SingleColorAttrFunc(
        target=1.0, color_idx=0, loss_scale=10.0, t1=0, t2=STEPS,
        use_mask=True, mask_pred_original_sample=True, metric="l2", lambda_=0.5,
    )
    out = pipe.edit_image(xt, mask=mask, attr_func=attr, x0_ref=img)
    assert not bool(jnp.any(jnp.isnan(out.imgs)))
