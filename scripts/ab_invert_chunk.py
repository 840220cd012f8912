"""Interleaved A/B of ddpm_invert_batched's chunk size (UNet group batch =
2*chunk under CFG) on the production 512px SD path. chunk=10 has been the
default since round 3; batch-4 guided steps measured +9% aggregate over
batch-1 (PARITY), so bigger flat batches may lift the inversion too —
inversion is ~1.0 s of the 4.47 s e2e and 0.8 s of the 4.33 s e2e_seg.

Timing: each variant's full 50-step inversion is a DIRECT duration ending
in a device-to-host readback (min over passes valid — stalls only
inflate; CLAUDE.md rule 2), variants interleaved in one process.

Run on the chip:  timeout 1800 python scripts/ab_invert_chunk.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _build_models, build_edit_step
from diffusion_image_editing_tpu.engine import ddpm_invert_batched

CHUNKS = tuple(int(c) for c in
               os.environ.get("AB_CHUNKS", "10,25,50").split(","))
PASSES = int(os.environ.get("AB_PASSES", "4"))


def main():
    models = _build_models(tiny=False)
    sched = models["sched"]
    eps_fn = build_edit_step(False, models)[2]
    x0 = models["xt"] * 0.1
    key = jax.random.PRNGKey(9)

    def run(chunk, x):
        res = ddpm_invert_batched(sched, eps_fn, x, eta=1.0, key=key,
                                  chunk=chunk)
        return res.xt, float(jnp.sum(res.zs))  # D2H sync in region

    # compile + warm every variant first (relay first-program artifact)
    for c in CHUNKS:
        run(c, x0)
        print(f"chunk={c}: compiled+warmed", flush=True)

    best = {c: None for c in CHUNKS}
    x = x0
    for p in range(PASSES):
        row = {}
        for c in CHUNKS:  # interleaved: same relay conditions per pass
            t0 = time.perf_counter()
            xt, sink = run(c, x)
            dt = time.perf_counter() - t0
            assert np.isfinite(sink)
            x = x0 + 1e-6 * xt  # chain inputs across passes
            best[c] = dt if best[c] is None else min(best[c], dt)
            row[c] = f"{dt:.3f}s"
        print(f"pass {p}: {row}", flush=True)

    for c in CHUNKS:
        print(f"chunk={c}: best {best[c]:.3f} s / 50 steps = "
              f"{best[c]/50*1e3:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
