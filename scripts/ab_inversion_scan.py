"""A/B the restructured CARRY-FREE fused DDPM-inversion scan vs the split
host loop (VERDICT r2 item 7).

Round 2 measured the carry-FULL fused inversion scan (51-frame trajectory
carry updated with dynamic_update_slice each step) at 311 ms/step vs 25.3 for
the split host loop. Round 3 restructured the scan to carry nothing — the
trajectory streams through scan xs/ys (`engine/invert.py::ddpm_invert`).
This measures whether the pathology is gone: full 50-step inversions of the
SD-1.5 512px latent, both modes in one process, warmed, interleaved.

Run on the chip:  python scripts/ab_inversion_scan.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import _build_models  # noqa: E402
from diffusion_image_editing_tpu.engine import invert as I  # noqa: E402
from diffusion_image_editing_tpu.engine.denoise import CfgEpsClosure  # noqa: E402

STEPS = 50


def main():
    assert jax.default_backend() != "cpu"
    m = _build_models(tiny=False)
    eps_fn = CfgEpsClosure(m["unet"].apply, m["uparams"], m["text_emb"], 3.5)
    sched = m["sched"]
    x0 = m["xt"]
    key = jax.random.PRNGKey(11)
    xts = I.sample_xts(sched, x0, key)

    fused = jax.jit(
        lambda s, f, x, tr: I.ddpm_invert(s, f, x, eta=1.0, xts=tr)
    )

    def run_fused():
        res = fused(sched, eps_fn, x0, xts)
        return float(jnp.sum(res.zs))

    def run_split():
        res = I.ddpm_invert_split(sched, eps_fn, x0, eta=1.0, xts=xts)
        return float(jnp.sum(res.zs))

    modes = {"fused": run_fused, "split": run_split}
    for name, run in modes.items():
        for _ in range(2):
            run()
        print("warmed", name, flush=True)

    times = {k: [] for k in modes}
    for p in range(4):
        for name, run in modes.items():
            t0 = time.perf_counter()
            run()
            times[name].append(time.perf_counter() - t0)
        print(f"pass {p}:",
              {k: f"{min(v)/STEPS*1e3:.2f} ms/step" for k, v in times.items()},
              flush=True)
    for name, ts in times.items():
        print(f"{name}: best {min(ts):.3f} s = {min(ts)/STEPS*1e3:.2f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
