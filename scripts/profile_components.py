"""Component-level timing of the SD-1.5 512px guided-edit step on the current
backend, with Pallas dispatch controlled by DIE_TPU_PALLAS[_ATTN|_GN|_ABN].

Usage:
    python scripts/profile_components.py            # tuned auto dispatch
    DIE_TPU_PALLAS=0 python scripts/profile_components.py   # pure XLA
    DIE_TPU_PALLAS=1 python scripts/profile_components.py   # all kernels on
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench import build_edit_step  # noqa: E402


def timeit(name, fn, *args, n=15):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.2f} ms")


def main():
    tiny = jax.default_backend() == "cpu"
    print("backend:", jax.default_backend(),
          "pallas:", os.environ.get("DIE_TPU_PALLAS", "auto"),
          "(tiny)" if tiny else "")
    denoise_step, guidance_nudge, eps_fn, decode_fn, attr, xt, sched = (
        build_edit_step(tiny)
    )
    t = jnp.int32(981)
    timeit("unet CFG denoise step", denoise_step, eps_fn, xt, t)

    @jax.jit
    def dec_fwd(dec, z):
        return dec(z)

    timeit("vae decode forward", dec_fwd, decode_fn, xt)
    x2, eps = denoise_step(eps_fn, xt, t)
    timeit("guidance nudge (decode fwd+vjp)", guidance_nudge, decode_fn, attr, x2,
           eps, t, jnp.int32(0))


if __name__ == "__main__":
    main()
