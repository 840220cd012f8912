"""AOT-compile the ENTIRE north-star e2e as sharded programs at real shapes.

The r04 projection (scripts/project_v5e8.py) composes per-step costs; this
script proves the composed programs themselves compile and partition over
the cfg(2) x sp(4) mesh at real SD-1.5 512px shapes:

1. the FUSED 50-step guided-edit scan (engine.edit, eta=1 ddpm rule with zs,
   colour guidance + decoder VJP every step) — production runs this as ONE
   dispatch (pipeline mode="fused");
2. the timestep-parallel DDPM inversion group program
   (`engine.invert._ddpm_invert_group`): one flat-batched CFG UNet call per
   group of 10 timesteps, batch over 'cfg', H over 'sp'.

Reports per-device memory + collective census for both; asserts the edit
scan's decode convs stay spatially partitioned and everything fits HBM.

Run: PALLAS_AXON_POOL_IPS= python scripts/multichip_e2e.py
Writes MULTICHIP_E2E_r04.json.
"""

from __future__ import annotations

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from multichip_real_shapes import LATENT, build, census, conv_shapes  # noqa: E402

from diffusion_image_editing_tpu.core import schedule_for_model  # noqa: E402
from diffusion_image_editing_tpu.engine.edit import edit  # noqa: E402
from diffusion_image_editing_tpu.engine.invert import _ddpm_invert_group  # noqa: E402
from diffusion_image_editing_tpu.guidance import SingleColorAttrFunc  # noqa: E402
from diffusion_image_editing_tpu.models import SD_VAE  # noqa: E402
from diffusion_image_editing_tpu.parallel import cfg_mesh  # noqa: E402

STEPS = 50
GROUP = 10  # inversion chunk: flat batch of 10 timesteps -> CFG batch 20


def report_compiled(compiled, tag, rep):
    mem = compiled.memory_analysis()
    entry = {}
    if mem is not None:
        entry["memory_per_device_gb"] = {
            "argument": round(mem.argument_size_in_bytes / 2**30, 3),
            "output": round(mem.output_size_in_bytes / 2**30, 3),
            "temp": round(mem.temp_size_in_bytes / 2**30, 3),
        }
        total = (mem.argument_size_in_bytes + mem.temp_size_in_bytes
                 + mem.output_size_in_bytes)
        assert total < 16 * 2**30, f"{tag}: {total/2**30:.1f} GB > 16 GB HBM"
    hlo = compiled.as_text()
    coll, coll_bytes = census(hlo)
    entry["collectives"] = {
        k: {"count": coll[k], "mb": round(coll_bytes[k] / 2**20, 2)} for k in coll
    }
    convs = conv_shapes(hlo)
    entry["largest_conv_operands"] = [list(d) for _, d in convs[:4]]
    conv_hs = [d[1] for _, d in convs if len(d) == 4]
    entry["max_conv_operand_h"] = max(conv_hs) if conv_hs else 0
    rep[tag] = entry
    return entry


def main():
    assert len(jax.devices()) == 8
    mesh = cfg_mesh(cfg=2, sp=4)
    eps_fn, dec_fn = build(mesh)
    sched = schedule_for_model("sd", num_inference_steps=STEPS)
    af = SingleColorAttrFunc(target=0.9, color_idx=0, loss_scale=5.0,
                             t1=0, t2=STEPS, mask_attr_grad=False)
    rep = {"mesh": {"cfg": 2, "sp": 4}, "steps": STEPS}

    # ---- 1. fused 50-step guided edit (eta=1 ddpm rule, one scan) ----------
    xt = jax.ShapeDtypeStruct((1, LATENT, LATENT, 4), jnp.float32)
    zs = jax.ShapeDtypeStruct((STEPS, 1, LATENT, LATENT, 4), jnp.float32)

    def fused_edit(eps_fn_, dec_fn_, af_, xt_, zs_):
        return edit(sched, eps_fn_, xt_, eta=1.0, zs=zs_, attr_func=af_,
                    decode_fn=dec_fn_, step_rule="ddpm", collect=False).x0

    print("compiling fused 50-step sharded edit scan...", flush=True)
    comp_edit = jax.jit(fused_edit).lower(eps_fn, dec_fn, af, xt, zs).compile()
    e = report_compiled(comp_edit, "fused_edit_scan", rep)
    sp = 4
    assert 0 < e["max_conv_operand_h"] <= SD_VAE.sample_size // sp + 16, (
        f"fused edit: decode convs not partitioned (H={e['max_conv_operand_h']})"
    )
    print("fused edit ok:", e["memory_per_device_gb"], flush=True)

    # ---- 2. timestep-parallel inversion group program ----------------------
    total = STEPS  # batch 1
    x_flat = jax.ShapeDtypeStruct((total, LATENT, LATENT, 4), jnp.float32)
    ts_flat = jax.ShapeDtypeStruct((total,), jnp.int32)
    gidx = jax.ShapeDtypeStruct((), jnp.int32)

    print("compiling sharded inversion group program...", flush=True)
    comp_inv = (
        jax.jit(_ddpm_invert_group, static_argnames=("eta", "group"))
        .lower(sched, eps_fn, x_flat, x_flat, ts_flat, gidx, eta=1.0, group=GROUP)
        .compile()
    )
    i = report_compiled(comp_inv, "inversion_group", rep)
    print("inversion ok:", i["memory_per_device_gb"], flush=True)

    print(json.dumps(rep, indent=2))
    with open("/root/repo/MULTICHIP_E2E_r04.json", "w") as f:
        json.dump(rep, f, indent=2)
    print("OK: fused edit scan + inversion groups compile sharded at real shapes")


if __name__ == "__main__":
    main()
