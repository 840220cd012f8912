"""AOT 8-device partition inspection of the production-scale guidance-grid
sweep (VERDICT r3 item 7; BASELINE config 5).

Compiles `parallel.guided_edit_sweep` at REAL SD-1.5 512px shapes — an
8-point loss_scale grid, 50-step guided edits with the colour-gradient VJP
through the full VAE decoder — sharded over an 8-device 'data' mesh, and
inspects the partitioned HLO:

* each device must hold exactly ONE grid point (vmap batch dim partitioned
  over 'data': conv operands show batch 1, not 8);
* a pure data-parallel program has (near-)zero collectives — any
  all-gather/all-reduce means GSPMD replicated work;
* per-device memory must fit v5e HBM;
* per-device FLOPs must equal the single-edit program's (overhead ~1.0x),
  so the sweep scales at the measured single-chip edit rate: aggregate
  samples*steps/s on a v5e-8 = 8 x the single-chip steps/s.

Run: PALLAS_AXON_POOL_IPS= python scripts/multichip_sweep.py
Writes MULTICHIP_SWEEP_r04.json.
"""

from __future__ import annotations

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from multichip_real_shapes import LATENT, census, conv_shapes  # noqa: E402

from diffusion_image_editing_tpu.core import schedule_for_model  # noqa: E402
from diffusion_image_editing_tpu.engine.denoise import (  # noqa: E402
    CfgEpsClosure,
    DecodeClosure,
)
from diffusion_image_editing_tpu.guidance import SingleColorAttrFunc  # noqa: E402
from diffusion_image_editing_tpu.models import (  # noqa: E402
    SD15_UNET,
    SD_VAE,
    AutoencoderKL,
    UNet2DCondition,
)
from diffusion_image_editing_tpu.parallel.sweep import (  # noqa: E402
    _attr_axes,
    sweep_attr_func,
)

GRID = 8
STEPS = 50


def main():
    assert len(jax.devices()) == 8
    mesh = Mesh(np.array(jax.devices()), ("data",))

    unet = UNet2DCondition(SD15_UNET)
    vae = AutoencoderKL(SD_VAE)
    k = jax.random.PRNGKey(0)
    uparams = jax.eval_shape(
        lambda: unet.init(
            k, jnp.zeros((1, LATENT, LATENT, 4)), jnp.int32(0),
            jnp.zeros((1, 77, 768)),
        )
    )
    vparams = jax.eval_shape(
        lambda: vae.init(k, jnp.zeros((1, SD_VAE.sample_size, SD_VAE.sample_size, 3)))
    )
    text_emb = jax.ShapeDtypeStruct((2, 77, 768), jnp.float32)
    eps_fn = CfgEpsClosure(unet.apply, uparams, text_emb, 3.5)
    vae_apply = vae.apply
    dec_fn = DecodeClosure(
        lambda p, z: vae_apply(p, z, method="decode"), vparams, 0.18215
    )

    sched = schedule_for_model("sd", num_inference_steps=STEPS)
    af = sweep_attr_func(
        SingleColorAttrFunc(target=0.9, color_idx=0, t1=0, t2=STEPS,
                            mask_attr_grad=False),
        loss_scale=np.linspace(0.0, 20.0, GRID),
    )
    xt = jax.ShapeDtypeStruct((1, LATENT, LATENT, 4), jnp.float32)

    # Mirror guided_edit_sweep's jit exactly, but via AOT lower/compile.
    from diffusion_image_editing_tpu.engine.edit import edit

    def one(af_, eps_fn_, dec_fn_, xt_):
        return edit(sched, eps_fn_, xt_, eta=0.0, zs=None, attr_func=af_,
                    decode_fn=dec_fn_, step_rule="ddim", collect=False).x0

    vm = jax.vmap(one, in_axes=(_attr_axes(af, ("loss_scale",)), None, None, None))
    grid_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    af_shardings = jax.tree.map(
        lambda leaf: grid_sharding if getattr(leaf, "ndim", 0) == 1 else repl, af
    )

    print("lowering sweep...", flush=True)
    lowered = jax.jit(
        vm, in_shardings=(af_shardings, repl, repl, repl),
        out_shardings=grid_sharding,
    ).lower(af, eps_fn, dec_fn, xt)
    print("compiling...", flush=True)
    compiled = lowered.compile()
    print("compiled.", flush=True)

    report = {"mesh": {"data": 8}, "grid": GRID, "steps": STEPS,
              "shapes": {"latent": [1, LATENT, LATENT, 4],
                         "image": [1, SD_VAE.sample_size, SD_VAE.sample_size, 3]}}
    mem = compiled.memory_analysis()
    if mem is not None:
        report["memory_per_device"] = {
            "argument_gb": round(mem.argument_size_in_bytes / 2**30, 3),
            "output_gb": round(mem.output_size_in_bytes / 2**30, 3),
            "temp_gb": round(mem.temp_size_in_bytes / 2**30, 3),
        }

    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    report["per_device_flops"] = float(cost["flops"])

    hlo = compiled.as_text()
    coll, coll_bytes = census(hlo)
    report["collectives"] = {
        k: {"count": coll[k], "mb": round(coll_bytes[k] / 2**20, 2)} for k in coll
    }
    convs = conv_shapes(hlo)
    report["largest_conv_operands"] = [list(d) for _, d in convs]
    # data-parallel check: no conv operand carries the grid batch of 8
    max_batch = max((d[0] for _, d in convs if len(d) == 4), default=0)
    report["max_conv_batch"] = max_batch
    # CFG doubles the UNet batch to 2; anything >2 means grid replication
    data_parallel = 0 < max_batch <= 2
    report["grid_partitioned"] = bool(data_parallel)

    print(json.dumps(report, indent=2))
    with open("/root/repo/MULTICHIP_SWEEP_r04.json", "w") as f:
        json.dump(report, f, indent=2)

    comm_mb = sum(coll_bytes.values()) / 2**20
    assert data_parallel, f"grid axis replicated: max conv batch {max_batch}"
    assert comm_mb < 64, f"data-parallel sweep moves {comm_mb:.0f} MB of collectives"
    if mem is not None:
        total = (mem.argument_size_in_bytes + mem.temp_size_in_bytes
                 + mem.output_size_in_bytes)
        assert total < 16 * 2**30, f"per-device memory {total/2**30:.1f} GB > 16 GB"
    print("OK: one grid point per device, no replicated work, fits HBM")


if __name__ == "__main__":
    main()
