"""Plotting / display helpers (host-side).

Rebuild of `src/plotting.py`: side-by-side concatenation with a source image,
labelled grids (per-row loss-scale labels), and sample display. Matplotlib is
imported lazily so headless/device-only runs never pay for it.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
from PIL import Image

from .transforms import array_to_pil


def concat_images(images: Sequence[Image.Image], axis: int = 0) -> Image.Image:
    """Horizontal (axis=0) or vertical (axis=1) strip (`plotting.py:11-33`)."""
    arrs = [np.asarray(im.convert("RGB")) for im in images]
    h = min(a.shape[0] for a in arrs)
    w = min(a.shape[1] for a in arrs)
    arrs = [a[:h, :w] for a in arrs]
    return Image.fromarray(np.concatenate(arrs, axis=1 - axis))


def add_source_image(source: Image.Image, images: Sequence[Image.Image]) -> Image.Image:
    """Prepend the source image to an edited strip (`plotting.py:11-33`)."""
    return concat_images([source, *images])


def show_images_in_a_grid(
    images: Sequence[Image.Image],
    num_cols: int = 4,
    row_labels: Optional[Sequence[str]] = None,
    figsize_per_cell: float = 2.5,
    title: Optional[str] = None,
):
    """Grid display with optional per-row labels, e.g. loss scales
    (`plotting.py:77-101`). Returns the matplotlib figure."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    n = len(images)
    rows = (n + num_cols - 1) // num_cols
    fig, axes = plt.subplots(
        rows, num_cols, figsize=(figsize_per_cell * num_cols, figsize_per_cell * rows)
    )
    axes = np.atleast_2d(axes)
    for i in range(rows * num_cols):
        ax = axes[i // num_cols, i % num_cols]
        ax.axis("off")
        if i < n:
            ax.imshow(np.asarray(images[i].convert("RGB")))
            if row_labels is not None and i % num_cols == 0:
                ax.set_title(row_labels[i // num_cols], fontsize=9)
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    return fig


def display_samples(samples, num_cols: int = 4, **kwargs):
    """Device arrays or PIL images -> grid (`plotting.py:104-131`)."""
    pils = [
        s if isinstance(s, Image.Image) else array_to_pil(np.asarray(s))
        for s in samples
    ]
    return show_images_in_a_grid(pils, num_cols=num_cols, **kwargs)
