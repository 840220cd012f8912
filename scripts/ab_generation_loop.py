"""Interleaved A/B of the plain (unguided) generation loop: split host loop
of per-step jits vs the fused single-dispatch `lax.scan` (VERDICT r2 weak 5:
`generate_image`'s split default was set by analogy with the inversion
scan's pathology, never measured — the fused generation scan has NO
trajectory carry, so it plausibly matches split like the edit loop does).

Workload: 50-step CFG DDIM generation of the SD-1.5 512px latent (no VAE
decode — the mode only changes the loop). Both programs in one process,
warmed with full passes, 4 interleaved timed passes, one readback per pass.

Run on the chip:  python scripts/ab_generation_loop.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import _build_models  # noqa: E402
from diffusion_image_editing_tpu.engine import denoise as D  # noqa: E402
from diffusion_image_editing_tpu.engine.denoise import CfgEpsClosure  # noqa: E402
from diffusion_image_editing_tpu.engine.edit import edit_split  # noqa: E402

STEPS = 50


def main():
    assert jax.default_backend() != "cpu", "A/B needs the chip"
    m = _build_models(tiny=False)
    eps_fn = CfgEpsClosure(m["unet"].apply, m["uparams"], m["text_emb"], 3.5)
    sched = m["sched"]
    xt = m["xt"]

    fused = jax.jit(
        lambda s, f, x: D.generate(s, f, x, eta=0.0, collect=False)
    )

    def run_fused(x):
        return float(jnp.sum(fused(sched, eps_fn, x).x0))

    def run_split(x):
        res = edit_split(sched, eps_fn, x, eta=0.0, attr_func=None,
                         step_rule="ddim", collect=False)
        return float(jnp.sum(res.x0))

    modes = {"split": run_split, "fused": run_fused}
    for name, run in modes.items():
        for _ in range(2):
            run(xt)
        print("warmed", name, flush=True)

    times = {k: [] for k in modes}
    for p in range(4):
        for name, run in modes.items():
            t0 = time.perf_counter()
            run(xt)
            times[name].append(time.perf_counter() - t0)
        print(f"pass {p}:",
              {k: f"{min(v)/STEPS*1e3:.2f} ms/step" for k, v in times.items()},
              flush=True)
    for name, ts in times.items():
        print(f"{name}: best {min(ts):.3f} s = {min(ts)/STEPS*1e3:.2f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
