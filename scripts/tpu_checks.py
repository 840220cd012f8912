"""On-chip validation + A/B timing for the round-2 kernels.

Run on the real TPU (plain `python scripts/tpu_checks.py`). Phases via argv:
    attn    — K-blocked flash fwd/bwd numeric parity vs the jnp reference on
              the production shapes (SD UNet d=40, VAE decoder 4096x512),
              then chained-timing A/B (Pallas vs XLA) for fwd and VJP.
    headdim — the SD head_dim-40 lane-padding experiment: contraction-layout
              microbench (VERDICT r1 item 8).

Timing per CLAUDE.md rule 2: chained inputs, D2H readback inside the region.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(fn, x0, *rest, reps=20):
    """fn: (array, *rest) -> array (same shape as the first arg). Chained,
    synced timing; ms/call. Pass every large operand through *rest so it is a
    traced jit ARGUMENT — captured device arrays become HLO constants and the
    relay re-ships them per call (CLAUDE.md rule 1), wrecking the numbers."""
    x = fn(x0 + 1.0, *rest)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x = x0
    for _ in range(reps):
        x = fn(x, *rest)
    s = float(jnp.sum(x))
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(s)
    return dt * 1000


def check_attn():
    # The production dispatch sends over-VMEM-budget K/V (the VAE-decoder
    # 4096x512 shapes below) to XLA; force the streaming kernel ON here so
    # this script actually validates/timing-checks the Pallas path for them.
    os.environ.setdefault("DIE_TPU_ATTN_STREAMING", "1")
    from diffusion_image_editing_tpu.ops.attention import (
        _attention,
        attention_reference,
    )

    shapes = [
        ("SD-lvl1 self-attn", (2, 4096, 8, 40), jnp.bfloat16),
        ("SD-lvl2 self-attn", (2, 1024, 8, 80), jnp.bfloat16),
        ("VAE-decoder attn", (1, 4096, 1, 512), jnp.bfloat16),
        ("VAE-decoder attn f32", (1, 4096, 1, 512), jnp.float32),
    ]
    for name, (b, s, h, d), dt in shapes:
        k = jax.random.PRNGKey(0)
        q = jax.random.normal(k, (b, s, h, d), dt)
        kk = jax.random.normal(jax.random.fold_in(k, 1), (b, s, h, d), dt)
        v = jax.random.normal(jax.random.fold_in(k, 2), (b, s, h, d), dt)
        scale = float(d**-0.5)

        # ---- numeric parity on chip ----
        out_p = jax.jit(lambda q_: _attention(q_, kk, v, scale, True))(q)
        out_r = jax.jit(lambda q_: attention_reference(q_, kk, v, scale))(q)
        err = float(jnp.max(jnp.abs(out_p.astype(jnp.float32) - out_r.astype(jnp.float32))))
        g = jax.random.normal(jax.random.fold_in(k, 3), (b, s, h, d), dt)

        def loss_p(q_):
            return jnp.sum(_attention(q_, kk, v, scale, True).astype(jnp.float32) * g.astype(jnp.float32))

        def loss_r(q_):
            return jnp.sum(attention_reference(q_, kk, v, scale).astype(jnp.float32) * g.astype(jnp.float32))

        gq_p = jax.jit(jax.grad(loss_p))(q)
        gq_r = jax.jit(jax.grad(loss_r))(q)
        gerr = float(jnp.max(jnp.abs(gq_p.astype(jnp.float32) - gq_r.astype(jnp.float32))))
        scale_ref = float(jnp.max(jnp.abs(gq_r.astype(jnp.float32)))) or 1.0
        print(f"{name} {dt.__name__}: fwd max|err|={err:.4g}  "
              f"bwd max|err|={gerr:.4g} (rel {gerr/scale_ref:.3g})")

        # ---- timing: fwd (k/v/g as traced arguments, not captures) ----
        f_pal = jax.jit(lambda q_, k_, v_: _attention(q_, k_, v_, scale, True))
        f_xla = jax.jit(
            lambda q_, k_, v_: attention_reference(q_, k_, v_, scale).astype(q_.dtype)
        )
        ms_p = chain_time(f_pal, q, kk, v)
        ms_x = chain_time(f_xla, q, kk, v)
        # ---- timing: fwd+bwd (VJP) ----
        gp = jax.jit(
            jax.grad(
                lambda q_, k_, v_, g_: jnp.sum(
                    _attention(q_, k_, v_, scale, True).astype(jnp.float32)
                    * g_.astype(jnp.float32)
                )
            )
        )
        gx = jax.jit(
            jax.grad(
                lambda q_, k_, v_, g_: jnp.sum(
                    attention_reference(q_, k_, v_, scale).astype(jnp.float32)
                    * g_.astype(jnp.float32)
                )
            )
        )
        ms_gp = chain_time(gp, q, kk, v, g)
        ms_gx = chain_time(gx, q, kk, v, g)
        print(f"    fwd: pallas {ms_p:.3f} ms  xla {ms_x:.3f} ms   "
              f"| grad: pallas {ms_gp:.3f} ms  xla {ms_gx:.3f} ms")


def check_headdim():
    """SD head_dim-40: how much do the lane-padded attention matmuls cost?
    Compare d=40 vs d=128 matmul time (same useful work ratio 3.2x), and a
    sublane-contraction layout."""
    from jax import lax

    S = 4096
    for d in (40, 128):
        a = jax.random.normal(jax.random.PRNGKey(0), (S, d), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (S, d), jnp.bfloat16)

        # chain via first d cols to keep shapes consistent
        def step(a_):
            s = lax.dot_general(a_, b, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
            return a_ + 1e-6 * s[:, :d].astype(a_.dtype)

        ms = chain_time(jax.jit(step), a)
        print(f"QK^T S={S} d={d}: {ms:.3f} ms "
              f"({2*S*S*d/ms*1e-9:.1f} useful GFLOP/ms)")

    # sublane-contraction layout: store (d, S), contract dim 0
    d = 40
    aT = jax.random.normal(jax.random.PRNGKey(2), (d, S), jnp.bfloat16)
    bT = jax.random.normal(jax.random.PRNGKey(3), (d, S), jnp.bfloat16)

    def stepT(aT_):
        s = jax.lax.dot_general(aT_, bT, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (S, S)
        return aT_ + 1e-6 * s[:d, :].astype(aT_.dtype)

    ms = chain_time(jax.jit(stepT), aT)
    print(f"QK^T S={S} d={d} (sublane contraction, (d,S) storage): {ms:.3f} ms")


if __name__ == "__main__":
    phases = sys.argv[1:] or ["attn", "headdim"]
    print("backend:", jax.default_backend())
    if "attn" in phases:
        check_attn()
    if "headdim" in phases:
        check_headdim()
