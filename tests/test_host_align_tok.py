import numpy as np
import pytest
from PIL import Image

from diffusion_image_editing_tpu.host import (
    CLIPTokenizer,
    align_face,
    align_quad,
    landmarks_from_parsing,
)


def synthetic_landmarks():
    """A face-like landmark layout: eyes at (100,100)/(160,100), mouth 100-160 at y=170."""
    lm = np.zeros((68, 2))
    lm[36:42] = [100, 100]
    lm[42:48] = [160, 100]
    lm[48] = [105, 170]
    lm[54] = [155, 170]
    return lm


def test_align_quad_geometry():
    quad, qsize = align_quad(synthetic_landmarks())
    assert quad.shape == (4, 2)
    assert qsize > 0
    center = quad.mean(axis=0)
    # crop centred near eye_avg + 0.1*eye_to_mouth = (130, 107)
    assert abs(center[0] - 130) < 2 and abs(center[1] - 107) < 2


def test_align_face_produces_output_size():
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (256, 256, 3), dtype=np.uint8))
    out = align_face(img, landmarks=synthetic_landmarks(), output_size=128,
                     transform_size=128)
    assert out.size == (128, 128)


def test_landmarks_from_parsing():
    parsing = np.zeros((256, 256), np.int32)
    parsing[95:105, 95:105] = 4  # l_eye
    parsing[95:105, 155:165] = 5  # r_eye
    parsing[165:175, 105:155] = 11  # mouth
    lm = landmarks_from_parsing(parsing)
    assert np.allclose(lm[36:42].mean(axis=0), [99.5, 99.5], atol=1)
    assert lm[48][0] < lm[54][0]  # mouth left of mouth right
    quad, qsize = align_quad(lm)
    assert qsize > 0


def test_landmarks_from_parsing_missing_class():
    with pytest.raises(ValueError):
        landmarks_from_parsing(np.zeros((16, 16), np.int32))


def test_align_from_parsing_rescales_to_image_frame():
    """`cli edit --align` backend: parsing-map landmarks live in the seg
    model's 256-frame and must be rescaled to the (differently sized) image."""
    import PIL.Image

    from diffusion_image_editing_tpu.host.alignment import align_from_parsing

    parsing = np.zeros((256, 256), np.int32)
    parsing[95:105, 95:105] = 4
    parsing[95:105, 155:165] = 5
    parsing[165:175, 105:155] = 11
    img = PIL.Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (384, 512, 3), dtype=np.uint8)
    )
    out = align_from_parsing(img, parsing, output_size=64)
    assert out.size == (64, 64)


def _tiny_tokenizer():
    # byte vocab + </w> variants + specials; no merges
    from diffusion_image_editing_tpu.host.tokenizer import bytes_to_unicode

    byte_vocab = list(bytes_to_unicode().values())
    tokens = byte_vocab + [v + "</w>" for v in byte_vocab]
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(tokens)}
    return CLIPTokenizer(vocab, [], max_length=16)


def test_tokenizer_pads_and_wraps():
    tok = _tiny_tokenizer()
    ids = tok.encode("hi")
    assert len(ids) == 16
    assert ids[0] == tok.bos
    assert tok.eos in ids
    # char-level fallback with no merges: h, i</w>
    assert ids[1] != tok.bos and ids[2] != tok.eos


def test_tokenizer_truncates():
    tok = _tiny_tokenizer()
    ids = tok.encode("a" * 100)
    assert len(ids) == 16
    assert ids[-1] == tok.eos


def test_tokenizer_batch_call():
    tok = _tiny_tokenizer()
    out = tok(["a", "bb"])
    assert out.shape == (2, 16)
    assert out.dtype == np.int32


def test_align_face_golden_parity():
    """Golden pin: the staged/vectorized align_face reproduces the r1
    implementation byte-for-byte on cases covering shrink, crop, feathered
    reflect-pad (and the no-padding path)."""
    import os

    from diffusion_image_editing_tpu.host.alignment import align_face

    data = np.load(os.path.join(os.path.dirname(__file__), "data", "align_golden.npz"))
    img = Image.fromarray(data["img"], "RGB")
    lm = data["lm"]

    out = np.asarray(align_face(img, landmarks=lm, output_size=64, transform_size=128))
    np.testing.assert_array_equal(out, data["out"])

    out2 = np.asarray(
        align_face(img, landmarks=lm, output_size=64, transform_size=64,
                   enable_padding=False)
    )
    np.testing.assert_array_equal(out2, data["out2"])

    img_big = img.resize((704, 704), Image.LANCZOS)
    out3 = np.asarray(
        align_face(img_big, landmarks=data["lm_big"], output_size=32, transform_size=32)
    )
    np.testing.assert_array_equal(out3, data["out3"])
