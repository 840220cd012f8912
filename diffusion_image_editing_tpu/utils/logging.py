"""Structured logging + profiling helpers.

Rebuild of `src/Segmentation/logger.py:13-21` (file+stream logging, non-lead
processes demoted) plus the tracing the reference lacks (SURVEY.md §5):
`jax.profiler` trace context and simple step timers.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Optional


def setup_logger(
    logpth: Optional[str] = None, name: str = "die_tpu", level=logging.INFO
) -> logging.Logger:
    """File+stream logger; non-lead hosts demoted to ERROR (the reference
    demotes non-rank-0, logger.py:13-21)."""
    import jax

    logger = logging.getLogger(name)
    logger.handlers.clear()
    if jax.process_index() > 0:
        level = logging.ERROR
    logger.setLevel(level)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if logpth:
        os.makedirs(logpth, exist_ok=True)
        fh = logging.FileHandler(os.path.join(logpth, f"{name}.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/die_tpu_trace"):
    """Perfetto-compatible `jax.profiler` trace around a region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-phase step timing (the tqdm/ETA math of
    `Segmentation/train.py:141-158`, structured)."""

    def __init__(self):
        self._starts = {}
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {
            k: {"total_s": v, "mean_s": v / self.counts[k], "count": self.counts[k]}
            for k, v in self.totals.items()
        }
