"""Chip smoke test for the fused GN+SiLU->conv Pallas kernel (ops/fused_conv.py)
BEFORE any e2e A/B: compiles and checks numerics of every UNet/VAE shape the
planner accepts on the real chip (interpret-mode tests cannot catch Mosaic
lane-tiling violations — ADVICE r4 medium, CLAUDE.md rule 5 family).

Run: timeout 600 python scripts/smoke_fused_conv_chip.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_image_editing_tpu.ops import fused_conv as F

# (n, h, w, cin, cout): the SD-1.5 UNet body stages at 512px (latent 64) and
# the VAE decoder's 64px/512ch stage; 320ch included to confirm fallback.
SHAPES = [
    (1, 64, 64, 320, 320),    # unet64 — expect fallback (no aligned tile fits)
    (2, 32, 32, 640, 640),    # unet32 (CFG batch 2)
    (2, 16, 16, 1280, 1280),  # unet16
    (2, 8, 8, 1280, 1280),    # unet8
    (2, 16, 16, 2560, 1280),  # decoder-side concat stage
    (1, 64, 64, 512, 512),    # VAE decoder 64px stage
]


def main():
    assert jax.default_backend() != "cpu", "smoke test needs the chip"
    for (n, h, w, cin, cout) in SHAPES:
        for dtype in (jnp.float32, jnp.bfloat16):
            esize = jnp.dtype(dtype).itemsize
            plan = F._plan((n, h, w, cin), cin, cout, esize)
            key = jax.random.PRNGKey(hash((n, h, w, cin, cout)) % 2**31)
            kx, ka, kb, kw = jax.random.split(key, 4)
            x = jax.random.normal(kx, (n, h, w, cin), dtype)
            a = 1.0 + 0.1 * jax.random.normal(ka, (n, cin), jnp.float32)
            b = 0.1 * jax.random.normal(kb, (n, cin), jnp.float32)
            wgt = jax.random.normal(kw, (3, 3, cin, cout), dtype) / np.sqrt(
                9 * cin
            )
            bias = jnp.linspace(-0.5, 0.5, cout, dtype=jnp.float32)

            os.environ["DIE_TPU_FUSED_CONV"] = "1"
            before = dict(F.TRACE_COUNTS)
            got = jax.jit(F.affine_silu_conv3x3)(x, a, b, wgt, bias)
            got = jax.device_get(got).astype(np.float32)
            delta = {k: F.TRACE_COUNTS[k] - before[k] for k in before}
            os.environ["DIE_TPU_FUSED_CONV"] = "0"

            ref = jax.device_get(F._jnp_fwd(x, a, b, wgt, bias)).astype(
                np.float32
            )
            scale = float(np.abs(ref).max()) + 1e-6
            err = float(np.abs(got - ref).max()) / scale
            tol = 2e-5 if dtype == jnp.float32 else 2e-2
            tag = "pallas" if delta.get("pallas") else "fallback"
            status = "OK" if err < tol else "FAIL"
            print(
                f"{status} ({n},{h},{w},{cin})->{cout} {jnp.dtype(dtype).name}"
                f" plan={plan} traced={tag} rel_err={err:.2e}",
                flush=True,
            )
            if err >= tol:
                raise SystemExit(1)
            if plan is not None and not delta.get("pallas"):
                raise SystemExit(f"plan exists but pallas not traced: {delta}")
    print("smoke: all shapes OK", flush=True)


if __name__ == "__main__":
    main()
