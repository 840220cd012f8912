"""Single-chip speed-of-light check from the REAL v5e compiler's cost model.

Compiles the unsharded bf16 production guided-edit step (CFG UNet 64x64x4 +
DDIM update + colour-guidance VJP through the full 512px VAE decoder — the
headline program) for a one-chip v5e topology with the local libtpu
toolchain (compile-only, no chip), and reports `cost_analysis()`:

  * flops            — exact module FLOPs (matches the project_v5e8 anchor)
  * bytes accessed   — post-fusion HBM traffic of the real-layout module

`optimal_seconds` itself OVERFLOWS NEGATIVE on modules this size (measured
on the v5e:2x4 programs — never trust that field), so rooflines come from
the two totals. MEASURED FINDING (this run): the byte "bound"
(bytes/819 GB/s = 96.3 ms) is NOT a bound — the chip runs the step in
69.9 ms. `bytes accessed` counts post-fusion operand bytes PER OP, so a
buffer read by several fusions (and VMEM-resident reuse) is counted every
time; it overestimates unique HBM traffic. The only true lower bound is
the FLOP bound (flops / 197 TFLOP/s bf16 = 35.7 ms), so the honest
one-number summary is: the headline step runs at ~51% of v5e bf16 compute
speed-of-light (measured 69.87-70.28 ms, PARITY interleaved chip A/Bs) —
consistent with the per-shape conv survey's 45-77% of MXU peak piecewise.
Also dumps the scheduled single-chip HLO to /tmp for inspection.

Run:
  PALLAS_AXON_POOL_IPS= timeout 2400 python scripts/aot_v5e1_optimal.py
Writes AOT_V5E1_OPTIMAL_r05.json.
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from multichip_real_shapes import LATENT, guided_step  # noqa: E402

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

MEAS_STEP_MS_BAND = (69.87, 70.28)  # PARITY round-3/5 interleaved chip A/Bs


def main():
    name = "v5e:1x1"
    topo = topologies.get_topology_desc(name, "tpu",
                                        chips_per_host_bounds=[1, 1, 1])
    devs = list(topo.devices)
    print(f"topology {name!r}: {len(devs)} device(s)", flush=True)
    mesh = Mesh(devs[:1], ("one",))
    repl = NamedSharding(mesh, P())

    dtype = jnp.bfloat16
    unet = UNet2DCondition(SD15_UNET, dtype=dtype)
    vae = AutoencoderKL(SD_VAE, dtype=dtype)
    k = jax.random.PRNGKey(0)
    uparams = jax.eval_shape(
        lambda: unet.init(k, jnp.zeros((1, LATENT, LATENT, 4), dtype),
                          jnp.int32(0), jnp.zeros((1, 77, 768), dtype)))
    vparams = jax.eval_shape(
        lambda: vae.init(
            k, jnp.zeros((1, SD_VAE.sample_size, SD_VAE.sample_size, 3), dtype)))
    text_emb = jax.ShapeDtypeStruct((2, 77, 768), dtype)
    eps_fn = CfgEpsClosure(unet.apply, uparams, text_emb, 3.5)
    dec_fn = DecodeClosure(lambda p, z: vae.apply(p, z, method="decode"),
                           vparams, 0.18215)
    sched = schedule_for_model("sd", num_inference_steps=50)
    af = SingleColorAttrFunc(target=0.9, color_idx=0, loss_scale=5.0,
                             t1=0, t2=50, mask_attr_grad=False)
    x = jax.ShapeDtypeStruct((1, LATENT, LATENT, 4), dtype, sharding=repl)
    t = jax.ShapeDtypeStruct((), jnp.int32)
    idx = jax.ShapeDtypeStruct((), jnp.int32)

    print("compiling unsharded bf16 headline step for one v5e chip...",
          flush=True)
    comp = jax.jit(guided_step).lower(sched, eps_fn, dec_fn, af, x, t, idx
                                      ).compile()
    print("compiled.", flush=True)
    with open("/tmp/aot_v5e1_step.hlo", "w") as f:
        f.write(comp.as_text())

    cost = comp.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    hbm_bytes = float(cost.get("bytes accessed", 0.0))
    PEAK_FLOPS = 197e12  # v5e bf16
    PEAK_BW = 819e9      # v5e HBM B/s
    t_flops_ms = flops / PEAK_FLOPS * 1e3
    t_bytes_ms = hbm_bytes / PEAK_BW * 1e3
    mem = comp.memory_analysis()
    rep = {
        "program": "unsharded bf16 512px guided edit step (headline)",
        "compiler": "real v5e toolchain via local libtpu (compile-only)",
        "flops": flops,
        "hbm_bytes_accessed": hbm_bytes,
        "optimal_seconds_field": float(cost.get("optimal_seconds", 0.0)),
        "roofline_ms": {
            "flop_bound": round(t_flops_ms, 3),
            "bytes_accessed_over_bw": round(t_bytes_ms, 3),
            "note": ("bytes-accessed/BW (96 ms) EXCEEDS the measured 70 ms "
                     "step, so it is not a bound: the counter tallies "
                     "post-fusion operand bytes per op, double-counting "
                     "buffers reused across fusions. flop_bound is the only "
                     "true lower bound."),
        },
        "measured_ms_band": list(MEAS_STEP_MS_BAND),
        "fraction_of_flop_speed_of_light": [round(t_flops_ms / m, 4)
                                            for m in MEAS_STEP_MS_BAND],
        "memory_per_device_gb": {
            "argument": round(mem.argument_size_in_bytes / 2**30, 3),
            "temp": round(mem.temp_size_in_bytes / 2**30, 3),
        } if mem is not None else None,
    }
    print(json.dumps(rep, indent=2))
    with open("/root/repo/AOT_V5E1_OPTIMAL_r05.json", "w") as f:
        json.dump(rep, f, indent=2)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
