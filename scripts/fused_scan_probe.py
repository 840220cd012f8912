"""Root-cause probe for the fused-edit-scan slowdown (VERDICT r1 item 5).

Round-1 measured the single-dispatch 50-step edit scan at 209 ms/step with
Pallas kernels vs 71 ms/step for the same math as two per-step jits (XLA-only
fused: 101). Hypotheses, each probed here as a full 50-step guided edit
(trusted full-run timing, CLAUDE.md rule 2):

  split        — two host-dispatched jits per step (the current default)
  fused        — one jitted lax.scan over the step body (round-1 slow case)
  fused-unroll — lax.scan(..., unroll=k): if per-iteration loop overhead or
                 lost cross-iteration overlap is the cause, unrolling
                 recovers it
  fused-1jit   — the whole 50-step loop UNROLLED inside ONE jit (no scan at
                 all): isolates "scan/while-loop" from "one big program"

The model closures (eps_fn/decode_fn/attr) are pytree callables passed as
jit ARGUMENTS in every mode (CLAUDE.md rule 1): closing the jitted scan over
them bakes 3.6 GB of weights into the HLO as literal constants and breaks
the relay.

Run each mode in its own process (jit caches, VMEM fragmentation):
    python scripts/fused_scan_probe.py split|fused|fused-unroll2|fused-1jit
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import STEPS, _build_models, build_edit_step  # noqa: E402


def _step_body(sched, eps_fn, decode_fn, attr, x, t, i):
    from diffusion_image_editing_tpu.core import ddim_step

    eps = jax.lax.stop_gradient(eps_fn(x, t))
    x_new, _ = ddim_step(sched, x, eps, t, eta=0.0)
    x_new, _ = attr.apply(x_new, None, eps, t, i, sched, decode_fn)
    return x_new


@functools.partial(jax.jit, static_argnums=(0, 1))
def _run_fused(unroll, _tag, sched, eps_fn, decode_fn, attr, ts, x):
    def body(x_, inp):
        i, t = inp
        return _step_body(sched, eps_fn, decode_fn, attr, x_, t, i), None

    out, _ = jax.lax.scan(body, x, (jnp.arange(STEPS), ts), unroll=unroll)
    return out


@functools.partial(jax.jit, static_argnums=(0,))
def _run_1jit(_tag, sched, eps_fn, decode_fn, attr, ts, x):
    for i in range(STEPS):
        x = _step_body(sched, eps_fn, decode_fn, attr, x, ts[i], jnp.int32(i))
    return x


def main(mode: str):
    tiny = jax.default_backend() == "cpu"
    models = _build_models(tiny)
    denoise_step, guidance_nudge, eps_fn, decode_fn, attr, xt, sched = (
        build_edit_step(tiny, models)
    )
    timesteps = np.asarray(sched.timesteps)
    ts_dev = jnp.asarray(sched.timesteps)

    if mode == "split":
        def run_pass(x):
            for i, t in enumerate(timesteps):
                x, eps = denoise_step(eps_fn, x, jnp.int32(t))
                x = guidance_nudge(decode_fn, attr, x, eps, jnp.int32(t), jnp.int32(i))
            return x
    elif mode.startswith("fused-unroll"):
        unroll = int(mode.removeprefix("fused-unroll"))

        def run_pass(x):
            return _run_fused(unroll, mode, sched, eps_fn, decode_fn, attr, ts_dev, x)
    elif mode == "fused-1jit":
        def run_pass(x):
            return _run_1jit(mode, sched, eps_fn, decode_fn, attr, ts_dev, x)
    elif mode == "fused":
        def run_pass(x):
            return _run_fused(1, mode, sched, eps_fn, decode_fn, attr, ts_dev, x)
    else:
        raise SystemExit(f"unknown mode {mode}")

    t_c0 = time.perf_counter()
    jax.block_until_ready(run_pass(xt + 1.0))
    compile_s = time.perf_counter() - t_c0
    reps = 2
    t0 = time.perf_counter()
    x = xt
    for _ in range(reps):
        x = run_pass(x)
        s = float(jnp.sum(x))
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(s)
    print(f"{mode}: {dt / STEPS * 1000:.1f} ms/step "
          f"({STEPS / dt:.2f} steps/s; warm+compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "split")
