"""Quantitative evaluation: PSNR/MSE and the anyGAN attribute metrics.

Rebuild of `src/metrics.py` (whose `lpips()` wrapper is broken by a
self-shadowing import, `metrics.py:14-27`): `attribute_consistency` (% of the
40 CelebA attributes whose argmax prediction survives the edit,
`metrics.py:138-203`) and `avg_increase_decrease_per_attribute` (sorted mean
per-attribute score deltas, `metrics.py:31-131`). Generation/edit/predict all
run batched on device; the reference's per-sample Python loop collapses into
vectorized calls.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import ANY_GAN_ATTRS

Array = jax.Array


def mse(a: Array, b: Array) -> Array:
    return jnp.mean((a - b) ** 2, axis=tuple(range(1, a.ndim)))


def psnr(a: Array, b: Array, max_val: float = 2.0) -> Array:
    """PSNR for [-1, 1] images (dynamic range 2.0), per batch element."""
    m = mse(a, b)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(m, 1e-12))


def predict_attributes(predictor_fn: Callable[[Array], Array], imgs: Array) -> Array:
    """(B, H, W, 3) [-1,1] images -> (B, 40, 2) anyGAN attribute logits."""
    return predictor_fn(imgs).reshape(imgs.shape[0], 40, 2)


def attribute_consistency(
    original_imgs: Array,
    edited_imgs: Array,
    predictor_fn: Callable[[Array], Array],
    skip_idx: Optional[Sequence[int]] = None,
) -> Dict[str, float]:
    """Per-attribute % of samples whose argmax class is unchanged by the edit
    (`metrics.py:138-203`). `skip_idx`: attributes intentionally edited."""
    p0 = np.asarray(jnp.argmax(predict_attributes(predictor_fn, original_imgs), -1))
    p1 = np.asarray(jnp.argmax(predict_attributes(predictor_fn, edited_imgs), -1))
    out = {}
    for i, name in enumerate(ANY_GAN_ATTRS):
        if skip_idx and i in skip_idx:
            continue
        out[name] = float((p0[:, i] == p1[:, i]).mean() * 100.0)
    return out


def avg_increase_decrease_per_attribute(
    original_imgs: Array,
    edited_imgs: Array,
    predictor_fn: Callable[[Array], Array],
) -> List[Tuple[int, str, float]]:
    """Mean softmax-score delta (edited - original, positive class) per
    attribute, sorted descending (`metrics.py:31-131`)."""
    s0 = jax.nn.softmax(predict_attributes(predictor_fn, original_imgs), axis=-1)
    s1 = jax.nn.softmax(predict_attributes(predictor_fn, edited_imgs), axis=-1)
    delta = np.asarray(jnp.mean(s1[..., 1] - s0[..., 1], axis=0))  # (40,)
    order = np.argsort(-delta)
    return [(int(i), ANY_GAN_ATTRS[int(i)], float(delta[int(i)])) for i in order]


def inversion_roundtrip_metrics(
    x0: Array, recon: Array, lpips_fn: Optional[Callable] = None
) -> Dict[str, float]:
    """The BASELINE round-trip quality numbers: PSNR (+LPIPS when weights
    are available)."""
    out = {
        "psnr": float(jnp.mean(psnr(x0, recon))),
        "mse": float(jnp.mean(mse(x0, recon))),
    }
    if lpips_fn is not None:
        out["lpips"] = float(jnp.mean(lpips_fn(x0, recon)))
    return out


def run_attribute_evaluation(
    wrapper,
    pipeline,
    predictor_fn: Callable[[Array], Array],
    attr_func,
    n_samples: int = 16,
    num_inference_steps: int = 50,
    eta: float = 0.0,
    seed: int = 0,
    skip_idx: Optional[Sequence[int]] = None,
    inversion: Optional[str] = None,
    t_skip: Optional[int] = None,
    resynthesize: bool = False,
    classes: Optional[Sequence[int]] = None,
    dilate_mask: bool = False,
):
    """End-to-end attribute evaluation (reference `metrics.py:212-266` CLI
    flow): batched generate -> guided edit -> anyGAN predictions on both ->
    consistency % and sorted score deltas. One device program per phase
    instead of the reference's per-sample loop.

    `inversion=None` edits the generation's own noise maps (the reference's
    metrics flow at eta=1, `src/metrics.py:79-101`). `inversion="ddpm"` runs
    the edit-friendly configuration the reference's metrics also drove:
    re-invert the generated images with edit-friendly DDPM inversion, then
    edit from `xts[t_skip]` with the extracted zs (+ optional resynthesis /
    segmentation-mask restriction via `classes`)."""
    imgs, traj, xt, zs = wrapper.generate_images(
        num_images=n_samples, eta=eta, num_inference_steps=num_inference_steps,
        seed=seed,
    )
    if inversion == "ddpm":
        if eta <= 0:
            raise ValueError("edit-friendly evaluation requires eta > 0")
        if t_skip is None:
            t_skip = min(36, num_inference_steps - 1)
        xt, zs, xts, mask, _ = pipeline.prepare_real_image_edit(
            imgs, eta=eta, inversion_method="ddpm", classes=classes,
            dilate_mask=dilate_mask, key=jax.random.PRNGKey(seed + 1),
        )
        out = pipeline.edit_image(
            xt, eta=eta, zs=zs, xts=xts, mask=mask, attr_func=attr_func,
            inversion_method="ddpm", t_skip=t_skip, resynthesize=resynthesize,
            collect=False, key=jax.random.PRNGKey(seed),
        )
    elif inversion is None:
        out = pipeline.edit_image(
            xt, eta=eta, zs=zs, attr_func=attr_func, collect=False,
            key=jax.random.PRNGKey(seed),
        )
    else:
        raise ValueError(f"Unknown inversion: {inversion}")
    edited = out.imgs
    return {
        "attribute_consistency": attribute_consistency(
            imgs, edited, predictor_fn, skip_idx
        ),
        "score_deltas": avg_increase_decrease_per_attribute(
            imgs, edited, predictor_fn
        ),
    }
