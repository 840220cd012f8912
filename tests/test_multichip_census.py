"""Regression pin on the GSPMD collective census of the production
cfg(2) x sp(4) guided-edit step at REAL SD-1.5 512px shapes (VERDICT r3
item 3). The round-3 decoder-replication bug (middle VAE stages silently
all-gathered to full replication) would have been caught by exactly this
pin; any change to models/ or parallel/ that alters the partitioning of the
flagship program fails here before it ships.

Gated: the AOT compile of the full-width program on the virtual CPU mesh
takes minutes on one core — run with DIE_TPU_MULTICHIP=1
(`make multichip-analyze` runs the underlying script unconditionally).
"""

import os
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("DIE_TPU_MULTICHIP") != "1",
    reason="full-shape 8-device AOT compile (~minutes); set DIE_TPU_MULTICHIP=1",
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_collective_census_pinned():
    import jax
    import jax.numpy as jnp
    from multichip_real_shapes import (
        LATENT,
        PINNED_CENSUS,
        build,
        census,
        guided_step,
    )

    from diffusion_image_editing_tpu.core import schedule_for_model
    from diffusion_image_editing_tpu.guidance import SingleColorAttrFunc
    from diffusion_image_editing_tpu.parallel import cfg_mesh

    mesh = cfg_mesh(cfg=2, sp=4)
    eps_fn, dec_fn = build(mesh)
    sched = schedule_for_model("sd", num_inference_steps=50)
    af = SingleColorAttrFunc(target=0.9, color_idx=0, loss_scale=5.0,
                             t1=0, t2=50, mask_attr_grad=False)
    x = jax.ShapeDtypeStruct((1, LATENT, LATENT, 4), jnp.float32)
    t = jax.ShapeDtypeStruct((), jnp.int32)
    idx = jax.ShapeDtypeStruct((), jnp.int32)
    compiled = (
        jax.jit(guided_step).lower(sched, eps_fn, dec_fn, af, x, t, idx).compile()
    )
    coll, _bytes = census(compiled.as_text())
    assert dict(coll) == PINNED_CENSUS, (
        f"collective census changed: {dict(coll)} != pinned {PINNED_CENSUS}"
    )
