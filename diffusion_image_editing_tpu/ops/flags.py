"""Kernel-dispatch flags.

`DIE_TPU_PALLAS` env var: "1"/"true" forces the Pallas kernels on, "0"/"false"
forces the XLA (jnp) paths, unset = auto (Pallas on TPU backends only).
Useful for A/B-profiling kernel vs compiler codegen on real hardware.

Related dispatch vars (each documented at its op):
  DIE_TPU_PALLAS_ATTN / _GN / _ABN  — per-op Pallas overrides (this module)
  DIE_TPU_ATTN_STREAMING            — over-VMEM streaming attention (ops/attention.py)
  DIE_TPU_CONV                      — conv3x3 auto|xla|shift9|int8|int8_large (ops/conv.py)
All are read at TRACE time — set before the program first runs (see
`ops.conv.TRACE_COUNTS` and CLAUDE.md rule 4).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def pallas_enabled(op: Optional[str] = None) -> Optional[bool]:
    """Tri-state override from the environment; None = auto. Per-op vars
    (DIE_TPU_PALLAS_ATTN / DIE_TPU_PALLAS_GN / DIE_TPU_PALLAS_ABN) take
    precedence over the global DIE_TPU_PALLAS."""
    v = None
    if op is not None:
        v = os.environ.get(f"DIE_TPU_PALLAS_{op.upper()}")
    if v is None:
        v = os.environ.get("DIE_TPU_PALLAS")
    if v is None:
        return None
    return v.lower() in ("1", "true", "yes", "on")


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def supports_pallas(op: Optional[str] = None) -> bool:
    override = pallas_enabled(op)
    if override is not None:
        return override
    return _on_tpu()
