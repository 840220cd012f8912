"""Decompose the BiSeNet 448px train step (post gather-fix: 116.4 ms) into
model fwd / fwd+bwd / loss / head-upsample pieces, slope-timed on the chip
(CLAUDE.md rule 2). Guides the next trainer optimization, if any.

Run on the chip:  python scripts/probe_seg_step.py
"""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from diffusion_image_editing_tpu.models.bisenet import (  # noqa: E402
    BiSeNet,
    resize_bilinear_align_corners,
)
from diffusion_image_editing_tpu.seg.losses import ohem_ce_loss  # noqa: E402

B, SIZE, WIDTH, C = 16, 448, 64, 19
N_LO, N_HI = 3, 13


def slope(fn, *args):
    # float() = device-to-host readback: the relay acks block_until_ready
    # early (CLAUDE.md rule 2) — only a D2H sync is a real barrier
    float(fn(*args, n=2))
    ts = {}
    for n in (N_LO, N_HI):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args, n=n))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    s = (ts[N_HI] - ts[N_LO]) / (N_HI - N_LO) * 1e3
    return s, ts[N_LO], ts[N_HI]


def main():
    assert jax.default_backend() != "cpu"
    model = BiSeNet(n_classes=C, width=WIDTH)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, SIZE, SIZE, 3), jnp.float32)
    labels = (jax.random.uniform(jax.random.fold_in(key, 1), (B, SIZE, SIZE)) * C
              ).astype(jnp.int32)
    variables = model.init(jax.random.fold_in(key, 2), x, train=False)
    params, bs = variables["params"], variables.get("batch_stats", {})
    n_min = B * SIZE * SIZE // 16

    def fwd(p, xx):
        out, _ = model.apply({"params": p, "batch_stats": bs}, xx, train=True,
                             mutable=["batch_stats"])
        return out

    @partial(jax.jit, static_argnames=("n",))
    def chain_fwd(p, xx, n):
        def body(i, acc):
            outs = fwd(p, xx + acc * 1e-9)
            return acc + jnp.sum(outs[0][0, 0, 0])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @partial(jax.jit, static_argnames=("n",))
    def chain_fwdbwd_nolabel(p, xx, n):
        def loss_fn(pp, xin):
            outs = fwd(pp, xin)
            return sum(jnp.sum(o) * 1e-9 for o in outs)

        def body(i, acc):
            # acc feeds the INPUT so the grad is not loop-invariant (XLA
            # hoists invariant bodies and the slope reads zero)
            g = jax.grad(loss_fn)(p, xx + acc * 1e-9)
            return acc + jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(l) * 1e-12, g, jnp.float32(0.0))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @partial(jax.jit, static_argnames=("n",))
    def chain_full(p, xx, n):
        def loss_fn(pp, xin):
            outs = fwd(pp, xin)
            return sum(ohem_ce_loss(o, labels, n_min=n_min) for o in outs)

        def body(i, acc):
            g = jax.grad(loss_fn)(p, xx + acc * 1e-9)
            return acc + jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(l) * 1e-12, g, jnp.float32(0.0))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    logits_small = jax.random.normal(key, (B, 56, 56, C), jnp.float32)

    @partial(jax.jit, static_argnames=("n",))
    def chain_upsample(ls, n):
        def body(i, acc):
            up = resize_bilinear_align_corners(ls + acc * 1e-9, SIZE, SIZE)
            return acc + jnp.sum(up[0, 0, 0])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @partial(jax.jit, static_argnames=("n",))
    def chain_loss(ls, n):
        def body(i, acc):
            up = resize_bilinear_align_corners(ls + acc * 1e-9, SIZE, SIZE)
            return acc + ohem_ce_loss(up, labels, n_min=n_min)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    for name, fn, args in (
        ("model fwd (train-mode BN)", chain_fwd, (params, x)),
        ("model fwd+bwd (sum loss)", chain_fwdbwd_nolabel, (params, x)),
        ("model fwd+bwd + 3x OHEM (full)", chain_full, (params, x)),
        ("head upsample 56->448 einsum x1", chain_upsample, (logits_small,)),
        ("upsample + OHEM x1", chain_loss, (logits_small,)),
    ):
        s, lo, hi = slope(fn, *args)
        print(f"{name}: {s:7.1f} ms/iter (t3={lo:.3f}s t13={hi:.3f}s)", flush=True)


if __name__ == "__main__":
    main()
