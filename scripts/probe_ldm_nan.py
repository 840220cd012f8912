"""Locate the non-finite value in bench.phase_ldm_clf (first seen on-chip,
bench attempt r04-1: FloatingPointError in _timed_pass). Runs the same
full-size LDM classifier-guided step chain on CPU in bf16, a few steps,
printing |x| stats after each sub-op."""

import os

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from diffusion_image_editing_tpu.core import ddim_step
from diffusion_image_editing_tpu.guidance import ClassifierAttrFunc
from diffusion_image_editing_tpu.models.resnet import ResNet50
from diffusion_image_editing_tpu.ops.resize import imagenet_normalize, to_unit_range
from diffusion_image_editing_tpu.pipeline.factory import create_diffusion_model

STEPS = bench.STEPS

w = create_diffusion_model("ldm", sample_clipping=False,
                           num_inference_steps=STEPS, dtype=jnp.bfloat16)
sched = w.schedule
eps_fn = w.eps_fn()
decode_fn = w.decode_fn()

clf = ResNet50(num_outputs=80)
cparams = jax.jit(clf.init)(
    jax.random.PRNGKey(11), jnp.zeros((1, 256, 256, 3), jnp.float32)
)
clf_apply = clf.apply


def clf_logits(p, img):
    x = imagenet_normalize(to_unit_range(img.astype(jnp.float32)))
    return clf_apply(p, x)


attr = ClassifierAttrFunc(
    loss_scale=50.0, t1=0, t2=STEPS, clf_params=cparams,
    clf_apply_fn=clf_logits, idx_for_class=20, idx_of_interest=1,
)

xt = jax.random.normal(jax.random.PRNGKey(12), w.latent_shape(1), jnp.float32)
print("latent shape", xt.shape, flush=True)


def stats(name, a):
    a = np.asarray(a, np.float32)
    print(f"  {name}: max|.|={np.max(np.abs(a)):.4g} finite={np.isfinite(a).all()}",
          flush=True)


timesteps = np.asarray(sched.timesteps)
n_probe = int(os.environ.get("N_PROBE", "4"))
x = xt + 1.0  # the warm latent _timed_pass uses first
for i, t in enumerate(timesteps[:n_probe]):
    eps = jax.lax.stop_gradient(eps_fn(x, jnp.int32(t)))
    stats(f"step {i} eps", eps)
    x_new, _ = ddim_step(sched, x, eps, jnp.int32(t), eta=0.0)
    stats(f"step {i} ddim", x_new)
    dec = decode_fn(x_new)
    stats(f"step {i} decode", dec)
    lg = clf_logits(cparams, dec)
    stats(f"step {i} logits", lg)
    x, _ = attr.apply_batched(x_new, None, eps, jnp.int32(t), jnp.int32(i),
                              sched, decode_fn)
    stats(f"step {i} nudged", x)
print("done", flush=True)
