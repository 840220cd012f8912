"""Secondary benchmark: batched guided-edit throughput (images/s) at batch
sizes 1/2/4 — the MXU utilization of the 512px SD-1.5 edit improves with
batch, which is how production sweeps (BASELINE config 5) run. Batch >= 2
uses the per-block-remat decoder (the 16GB memory-cliff fix)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import STEPS, _build_models, build_edit_step  # noqa: E402


def main():
    tiny = jax.default_backend() == "cpu"
    models = _build_models(tiny)

    for batch in (1, 2, 4):
        decode_remat = "blocks" if batch > 1 else "none"
        denoise_step, guidance_nudge, eps_fn, decode_fn, attr, xt, sched = (
            build_edit_step(tiny, models, decode_remat=decode_remat)
        )
        xt = jnp.repeat(xt, batch, axis=0)
        timesteps = np.asarray(sched.timesteps)

        def run_pass(x):
            for i, t in enumerate(timesteps):
                x, eps = denoise_step(eps_fn, x, jnp.int32(t))
                x = guidance_nudge(decode_fn, attr, x, eps, jnp.int32(t), jnp.int32(i))
            return x

        run_pass(xt + 1.0).block_until_ready()  # warm on a distinct latent
        t0 = time.perf_counter()
        out = run_pass(xt)
        sink = float(jnp.sum(out))  # D2H sync inside the timed region
        dt = time.perf_counter() - t0
        assert jnp.isfinite(sink)
        print(
            f"batch {batch} (decode_remat={decode_remat}): {STEPS / dt:.2f} steps/s, "
            f"{batch * STEPS / dt:.2f} image-steps/s, {dt:.2f}s per 50-step edit"
        )


if __name__ == "__main__":
    main()
