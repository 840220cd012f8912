"""Optimizer for BiSeNet training: SGD(momentum) with exponential warmup ->
poly decay, 4 parameter groups (wd / no-wd x lr-mul 10x).

Rebuild of `src/Segmentation/optimizer.py:28-63` on optax. The reference's
group assignment (`model.py:271-283`): FeatureFusionModule and BiSeNetOutput
params get 10x LR; conv/linear kernels get weight decay, norm params and
biases do not.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def warmup_poly_schedule(
    lr0: float = 1e-2,
    warmup_steps: int = 1000,
    warmup_start_lr: float = 1e-5,
    max_iter: int = 80000,
    power: float = 0.9,
):
    """lr(it) = warmup_start * (lr0/warmup_start)^(it/warmup) during warmup,
    then lr0 * (1 - it/max_iter)^power (`optimizer.py:51-63`)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        ratio = (lr0 / warmup_start_lr) ** (step / warmup_steps)
        warm = warmup_start_lr * ratio
        factor = jnp.clip(1.0 - step / max_iter, 0.0, 1.0) ** power
        poly = lr0 * factor
        return jnp.where(step < warmup_steps, warm, poly)

    return schedule


def _group_label(path: tuple, leaf) -> str:
    """Map a param path to one of wd / nowd / wd_mul / nowd_mul."""
    names = [getattr(p, "key", str(p)) for p in path]
    lr_mul = any(n in ("ffm", "conv_out", "conv_out16", "conv_out32") for n in names)
    is_kernel = names[-1] in ("kernel",) and jnp.ndim(leaf) > 1
    if is_kernel:
        return "wd_mul" if lr_mul else "wd"
    return "nowd_mul" if lr_mul else "nowd"


def param_group_labels(params: Any):
    return jax.tree_util.tree_map_with_path(_group_label, params)


def make_optimizer(
    params: Any,
    lr0: float = 1e-2,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    lr_mul: float = 10.0,
    warmup_steps: int = 1000,
    warmup_start_lr: float = 1e-5,
    max_iter: int = 80000,
    power: float = 0.9,
) -> optax.GradientTransformation:
    base = warmup_poly_schedule(lr0, warmup_steps, warmup_start_lr, max_iter, power)
    mul = lambda s: base(s) * lr_mul  # noqa: E731

    def sgd(schedule, wd):
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts += [optax.trace(decay=momentum, nesterov=False),
                  optax.scale_by_learning_rate(schedule)]
        return optax.chain(*parts)

    return optax.multi_transform(
        {
            "wd": sgd(base, weight_decay),
            "nowd": sgd(base, 0.0),
            "wd_mul": sgd(mul, weight_decay),
            "nowd_mul": sgd(mul, 0.0),
        },
        param_group_labels(params),
    )
