"""Segmentation-mask creation (reference `src/mask_creator.py:8-55`).

parsing map -> per-class binary masks -> sum -> optional 7x7 dilation
(TPU-idiomatic `lax.reduce_window`, replacing the unfold-based Dilation2d)
-> hard-threshold resize -> 3-channel NHWC mask.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.morphology import dilate
from ..ops.resize import resize_mask_hard

Array = jax.Array


def apply_mask(mask: Array, zo: Array, zv: Array) -> Array:
    """mask * zv + (1 - mask) * zo (`src/utils.py:23-28`)."""
    return mask * zv + (1.0 - mask) * zo


class MaskCreator:
    def __init__(
        self,
        dilate_mask: bool = True,
        resize_size: Tuple[int, int] = (256, 256),
        dilation_kernel: int = 7,
    ) -> None:
        self.dilate_mask = dilate_mask
        self.resize_size = resize_size
        self.dilation_kernel = dilation_kernel

    def create_class_mask(self, parsing: Array, class_label: int) -> Array:
        """(H, W) parsing -> (H, W) float mask, optionally dilated."""
        mask = (parsing == class_label).astype(jnp.float32)
        if self.dilate_mask:
            mask = dilate(mask[None, :, :, None], self.dilation_kernel)[0, :, :, 0]
        return mask

    def create_mask(self, parsing: Array, classes: Sequence[int]) -> Array:
        """(H, W) parsing + class ids -> (1, h, w, 3) binary mask in NHWC."""
        masks = [self.create_class_mask(parsing, c) for c in classes]
        mask = sum(masks)
        mask = resize_mask_hard(mask[None, :, :, None], *self.resize_size)
        return jnp.repeat(mask, 3, axis=-1)
