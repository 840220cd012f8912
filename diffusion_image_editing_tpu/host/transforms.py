"""Host-side PIL <-> array codecs (NHWC, [-1, 1]).

Rebuild of `src/transforms.py`: `array_to_pil` handles 2-D masks, 3-D images
and batch-of-1 4-D tensors; `pil_to_array` maps PIL -> [-1,1] float NHWC.
The device layout is NHWC (TPU-native), not the reference's NCHW.
"""

from __future__ import annotations

from typing import List, Union

import numpy as np
from PIL import Image


def array_to_pil(arr) -> Image.Image:
    """[-1,1] float (H,W,C) / (1,H,W,C) image, or 2-D mask -> PIL."""
    a = np.asarray(arr)
    if a.ndim == 4:
        assert a.shape[0] == 1, "batched input must have batch size 1"
        a = a[0]
    if a.ndim == 2:
        return Image.fromarray(a.astype(np.uint8))
    if a.ndim == 3:
        a = np.clip(a / 2 + 0.5, 0.0, 1.0)
        a = (a * 255).round().astype(np.uint8)
        if a.shape[-1] == 1:
            a = a[..., 0]
        return Image.fromarray(a)
    raise ValueError("Input array has wrong shape")


def arrays_to_pils(arrs) -> List[Image.Image]:
    a = np.asarray(arrs)
    if a.ndim == 4:
        return [array_to_pil(x) for x in a]
    return [array_to_pil(a)]


def pil_to_array(
    pil_imgs: Union[Image.Image, List[Image.Image]]
) -> np.ndarray:
    """PIL -> (B, H, W, C) float32 in [-1, 1]."""

    def one(img: Image.Image) -> np.ndarray:
        a = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
        return a * 2.0 - 1.0

    if isinstance(pil_imgs, Image.Image):
        return one(pil_imgs)[None]
    if isinstance(pil_imgs, list):
        return np.stack([one(im) for im in pil_imgs])
    raise ValueError("Input must be PIL.Image or list of PIL.Image")
