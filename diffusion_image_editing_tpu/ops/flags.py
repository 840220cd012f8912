"""Kernel-dispatch flags.

`DIE_TPU_PALLAS` env var: "1"/"true" forces the Pallas kernels on, "0"/"false"
forces the XLA (jnp) paths, unset = auto (Pallas on TPU backends only).
Useful for A/B-profiling kernel vs compiler codegen on real hardware.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def pallas_enabled() -> Optional[bool]:
    """Tri-state override from the environment; None = auto."""
    v = os.environ.get("DIE_TPU_PALLAS")
    if v is None:
        return None
    return v.lower() in ("1", "true", "yes", "on")


def supports_pallas() -> bool:
    override = pallas_enabled()
    if override is not None:
        return override
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False
