"""Inversion round-trip check at full model scale on the current backend.

Runs edit-friendly DDPM inversion then resampling on the full
ddpm-celebahq-256 architecture (random weights — the trajectory-exactness
property is weight-independent) and reports PSNR of intermediate-trajectory
reconstruction plus the final pred-x0 gap. This is BASELINE.json metric #2's
machinery ("inversion round-trip LPIPS/PSNR") validated on hardware; with
ported weights the same harness produces the reportable numbers.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from diffusion_image_editing_tpu.engine import ddpm_invert, ddpm_sample  # noqa: E402
from diffusion_image_editing_tpu.evals import psnr  # noqa: E402
from diffusion_image_editing_tpu.pipeline import create_diffusion_model  # noqa: E402


def main():
    tiny = jax.default_backend() == "cpu"
    steps = 10 if tiny else 50
    w = create_diffusion_model("ddpm", sample_clipping=False,
                               num_inference_steps=steps,
                               dtype=jnp.bfloat16 if not tiny else jnp.float32)
    if tiny:
        print("cpu: using reduced steps", steps)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, w.latent_shape(1), minval=-1.0, maxval=1.0)
    eps_fn = w.eps_fn()

    @jax.jit
    def invert(eps, x, k):
        return ddpm_invert(w.schedule, eps, x, eta=1.0, key=k)

    @jax.jit
    def resample(eps, zs, xts):
        return ddpm_sample(w.schedule, eps, zs, xts, t_skip=0, eta=1.0, collect=True)

    t0 = time.time()
    res = invert(eps_fn, x0, jax.random.fold_in(key, 1))
    jax.block_until_ready(res.zs)
    t_inv = time.time() - t0
    t0 = time.time()
    recon, traj = resample(eps_fn, res.zs, res.xts)
    float(jnp.sum(recon))
    t_rec = time.time() - t0

    traj_psnr = float(jnp.mean(psnr(traj[:-1], res.xts[1:steps])))
    final_psnr = float(jnp.mean(psnr(recon, x0)))
    print(f"invert {t_inv:.2f}s ({steps / t_inv:.2f} steps/s), "
          f"resample {t_rec:.2f}s ({steps / t_rec:.2f} steps/s)")
    print(f"trajectory-reconstruction PSNR (exactness property): {traj_psnr:.1f} dB")
    print(f"final pred-x0 PSNR (model-dependent; random weights here): {final_psnr:.1f} dB")
    assert traj_psnr > 40, "trajectory reconstruction must be near-exact"


if __name__ == "__main__":
    main()
