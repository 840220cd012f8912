"""Numerical sanitizers (SURVEY.md §5: the reference has none — its native
extension only asserts contiguity/device; JAX being functional removes the
in-place hazards, and these guards cover the numerics).

  * `checkify_nans(fn)` — wrap a jittable function so NaN/Inf production
    raises a checked error with location info (jax.experimental.checkify).
  * `assert_finite(tree)` — host-side assertion over a pytree.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checkify_nans(fn: Callable) -> Callable:
    """Returns fn' that runs `fn` under checkify float checks and raises
    `checkify.JaxRuntimeError` (with op provenance) if NaNs/Infs appear."""
    checked = checkify.checkify(fn, errors=checkify.float_checks)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite(tree: Any, name: str = "value") -> None:
    """Host-side finite check over a pytree (blocks on device values)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            continue
        if not bool(jnp.all(jnp.isfinite(leaf))):
            raise FloatingPointError(
                f"non-finite values in {name} at {jax.tree_util.keystr(path)}"
            )
