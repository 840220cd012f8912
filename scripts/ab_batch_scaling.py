"""Batch-scaling A/B of the 512px guided edit (VERDICT r2 item 4): is the
1.09x batch-4 aggregate a chip-saturation floor or a serialization tax?

Variants, all in ONE process, warmed with full passes, interleaved:
  * guided edit at batch B in {1, 2, 4} x guidance-VJP chunk c in {1, 2, 4}
    (c = 1 is the round-2 per-sample serialization; c > 1 vmaps c samples
    per VJP via lax.map(batch_size=c) — `AttrFunc.vjp_chunk`)
  * the CFG UNet denoise step ALONE at batch 1/2/4/8 (does the UNet
    saturate, independent of guidance?)

Each timed pass is 50 chained steps with one readback (fixed relay latency
F~23.5 ms amortized to 0.5 ms/step; identical across variants). A variant
that OOMs is recorded and skipped.

Run on the chip:  python scripts/ab_batch_scaling.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import STEPS, _build_models, build_edit_step  # noqa: E402

# (batch, vjp_chunk, decode_remat): chunk-4 full-VJP OOMs a 16GB chip
# outright (measured RESOURCE_EXHAUSTED) — its slot runs with per-block
# decoder remat instead. OOM-prone points run LAST: a failed warm can
# leave the arena unusable for later allocations.
EDIT_POINTS = [(1, 1, "none"), (2, 1, "none"), (2, 2, "none"),
               (4, 1, "none"), (4, 2, "none"), (4, 4, "blocks")]
UNET_BATCHES = [1, 2, 4, 8]


def main():
    assert jax.default_backend() != "cpu", "A/B needs the chip"
    models = _build_models(tiny=False)
    built = {}
    for dr in ("none", "blocks"):
        built[dr] = build_edit_step(False, models=models, decode_remat=dr)
    denoise_step, guidance_nudge, eps_fn, decode_fn, attr0, xt1, sched = built["none"]
    timesteps = np.asarray(sched.timesteps)

    def make_edit(batch, chunk, dr):
        denoise_step, guidance_nudge, eps_fn, decode_fn, attr0, xt1, _ = built[dr]
        attr = attr0.replace(vjp_chunk=chunk)
        xt = jnp.repeat(xt1, batch, axis=0)

        def run_pass(x, _a=attr):
            for i, t in enumerate(timesteps):
                x, eps = denoise_step(eps_fn, x, jnp.int32(t))
                x = guidance_nudge(decode_fn, _a, x, eps, jnp.int32(t), jnp.int32(i))
            return float(jnp.sum(x))

        return run_pass, xt

    def make_unet(batch):
        xt = jnp.repeat(xt1, batch, axis=0)

        def run_pass(x):
            for t in timesteps:
                x, _ = denoise_step(eps_fn, x, jnp.int32(t))
            return float(jnp.sum(x))

        return run_pass, xt

    progs = {}
    for b in UNET_BATCHES:
        name = f"unet_b{b}"
        try:
            run, xt = make_unet(b)
            run(xt)
            progs[name] = (run, xt, b)
            print("warmed", name, flush=True)
        except Exception as e:
            print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:120]})", flush=True)
    for b, c, dr in EDIT_POINTS:
        name = f"edit_b{b}_c{c}" + ("_remat" if dr != "none" else "")
        try:
            run, xt = make_edit(b, c, dr)
            run(xt)  # compile + warm
            progs[name] = (run, xt, b)
            print("warmed", name, flush=True)
        except Exception as e:  # OOM etc: record, continue
            print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:120]})", flush=True)

    # second warm round (relay first-program artifact)
    for name, (run, xt, _) in progs.items():
        run(xt)

    times = {k: [] for k in progs}
    for p in range(3):
        for name, (run, xt, _) in progs.items():
            t0 = time.perf_counter()
            run(xt)
            times[name].append(time.perf_counter() - t0)
        print(f"pass {p} done", flush=True)

    print("\n== results (best of 3 interleaved passes) ==", flush=True)
    for name, (run, xt, b) in progs.items():
        best = min(times[name])
        ms = best / STEPS * 1e3
        agg = b * STEPS / best
        print(f"{name}: {ms:.2f} ms/step, {STEPS/best:.2f} steps/s, "
              f"aggregate {agg:.2f} sample-steps/s", flush=True)


if __name__ == "__main__":
    main()
