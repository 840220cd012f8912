"""Quantified v5e-8 latency projection for the cfg(2) x sp(4) guided edit
(VERDICT r3 item 3): nobody can run 8 chips here, but the partitioned HLO +
the measured single-chip numbers pin the arithmetic.

Method
------
1. AOT-compile the REAL-shape guided-edit step (SD-1.5 512px: CFG UNet on
   64x64x4 latents + DDIM update + colour-guidance VJP through the full VAE
   decoder) twice on the virtual CPU mesh: unsharded (1 device) and sharded
   over cfg(2) x sp(4) (8 devices) — `scripts/multichip_real_shapes.py`
   topology, same code path as `parallel/edit_shard.py`.
2. XLA cost analysis gives exact per-module FLOPs. The sharded module's
   FLOPs are per-DEVICE (GSPMD partitions the module); 8*F_dev / F_1 is the
   measured halo/duplication overhead of the partitioning.
3. Anchor: the same unsharded program measured 70.28 ms/step on the v5e
   (PARITY.md round-3 conv A/B, interleaved 4x50-step passes). Effective
   throughput R_meas = F_1 / 70.28 ms. Projected per-device compute time =
   F_dev / (R_meas * eff), where eff in [0.75, 1.0] brackets the efficiency
   loss from smaller per-device tiles (the conv survey shows per-shape rates
   move NON-monotonically with row count — 43..79% of peak across the
   workload's shapes — so we bound rather than pretend precision).
4. Comm: the collective census (bytes are per-device in partitioned HLO).
   v5e ICI: 2D torus, 4.5e10 B/s per link per direction; an 8-chip slice
   gives a 2-link (9e10 B/s) optimistic and 1-link (4.5e10 B/s) pessimistic
   bandwidth, and exposure in [25%, 100%] of comm time (XLA overlaps
   collectives with compute via async pairs; latency-bound permutes expose).
5. e2e = inversion (timestep-parallel form: 50 INDEPENDENT UNet calls
   flat-batched — shards over the batch axis with no halo, measured 20.4
   ms/step single chip) + 50 x projected edit step + VAE encode/decode
   (sharded over sp) + per-dispatch relay overhead.

Run:  PALLAS_AXON_POOL_IPS= python scripts/project_v5e8.py
Writes MULTICHIP_PROJECTION_r04.json and prints a PARITY-ready table.
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

from multichip_real_shapes import LATENT, build, census, guided_step  # noqa: E402

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
from diffusion_image_editing_tpu.parallel import cfg_mesh  # noqa: E402

# Measured anchors (PARITY.md round 3, v5e chip, slope/interleaved timing)
MEAS_STEP_MS = 70.28          # unsharded 512px guided edit step
MEAS_INV_MS = 20.4            # timestep-parallel DDPM inversion, per step
MEAS_DECODE_MS = 21.9         # VAE decode forward
MEAS_E2E_S = 4.48             # single-chip 50-step invert + 50-step edit
RELAY_SYNC_MS = 23.5          # fixed per-synced-call relay latency
STEPS = 50

ICI_LINK_BPS = 4.5e10         # v5e ICI per link per direction
EFF_BAND = (0.75, 1.0)        # per-device tile efficiency vs measured blend
EXPOSE_BAND = (0.25, 1.0)     # fraction of comm time not hidden by compute


def compile_step(sharded: bool, dtype=jnp.float32):
    if sharded:
        mesh = cfg_mesh(cfg=2, sp=4)
        eps_fn, dec_fn = build(mesh, dtype=dtype)
    else:
        unet = UNet2DCondition(SD15_UNET, dtype=dtype)
        vae = AutoencoderKL(SD_VAE, dtype=dtype)
        k = jax.random.PRNGKey(0)
        uparams = jax.eval_shape(
            lambda: unet.init(
                k, jnp.zeros((1, LATENT, LATENT, 4), dtype), jnp.int32(0),
                jnp.zeros((1, 77, 768), dtype),
            )
        )
        vparams = jax.eval_shape(
            lambda: vae.init(
                k, jnp.zeros((1, SD_VAE.sample_size, SD_VAE.sample_size, 3),
                             dtype)
            )
        )
        text_emb = jax.ShapeDtypeStruct((2, 77, 768), dtype)
        eps_fn = CfgEpsClosure(unet.apply, uparams, text_emb, 3.5)
        vae_apply = vae.apply
        dec_fn = DecodeClosure(
            lambda p, z: vae_apply(p, z, method="decode"), vparams, 0.18215
        )

    sched = schedule_for_model("sd", num_inference_steps=STEPS)
    af = SingleColorAttrFunc(target=0.9, color_idx=0, loss_scale=5.0,
                             t1=0, t2=STEPS, mask_attr_grad=False)
    x = jax.ShapeDtypeStruct((1, LATENT, LATENT, 4), jnp.float32)
    t = jax.ShapeDtypeStruct((), jnp.int32)
    idx = jax.ShapeDtypeStruct((), jnp.int32)
    lowered = jax.jit(guided_step).lower(sched, eps_fn, dec_fn, af, x, t, idx)
    return lowered.compile()


def main():
    assert len(jax.devices()) == 8

    print("compiling sharded cfg2 x sp4 step (production bf16)...", flush=True)
    comp8 = compile_step(sharded=True, dtype=jnp.bfloat16)
    print("compiling sharded cfg2 x sp4 step (f32 census reference)...",
          flush=True)
    comp8_f32 = compile_step(sharded=True)
    print("compiling unsharded step...", flush=True)
    comp1 = compile_step(sharded=False)

    cost8 = comp8.cost_analysis()
    cost1 = comp1.cost_analysis()
    cost8 = cost8[0] if isinstance(cost8, (list, tuple)) else cost8
    cost1 = cost1[0] if isinstance(cost1, (list, tuple)) else cost1
    f_dev, f_1 = float(cost8["flops"]), float(cost1["flops"])

    # Comm bytes from the PRODUCTION bf16 module (VERDICT r4 item 8: the
    # round-4 projection counted the f32 module's bytes — conservative 2x).
    # The f32 module stays the census-pinned reference. Counts are NOT
    # byte-identical across dtypes: GSPMD's partitioning decisions shift
    # slightly with element type (measured: bf16 has ONE extra all-reduce
    # and ONE extra all-gather — 235/212/35 vs the pinned 235/211/34), so
    # we record the delta and only reject a structural blow-up.
    coll, coll_bytes = census(comp8.as_text())
    coll_f32, coll_bytes_f32 = census(comp8_f32.as_text())
    count_delta = {k: coll[k] - coll_f32.get(k, 0)
                   for k in set(coll) | set(coll_f32)
                   if coll[k] != coll_f32.get(k, 0)}
    assert sum(abs(v) for v in count_delta.values()) <= 4, (
        f"bf16/f32 collective counts diverge structurally: "
        f"{coll} vs {coll_f32}")
    comm_bytes = float(sum(coll_bytes.values()))
    comm_bytes_f32 = float(sum(coll_bytes_f32.values()))
    halo_overhead = 8.0 * f_dev / f_1

    # Projected per-device compute time, anchored to the measured step
    r_meas = f_1 / (MEAS_STEP_MS / 1e3)  # effective FLOP/s achieved on chip
    comp_ms = [f_dev / (r_meas * e) * 1e3 for e in reversed(EFF_BAND)]  # [best, worst]

    # Comm time: all-gather/permutes ride 'sp' (ring over 4 chips, 2 links in
    # a 2D-mesh ring), all-reduce over 'cfg' pairs. Band: 2 links vs 1 link.
    comm_ms = [comm_bytes / bw * 1e3 for bw in (2 * ICI_LINK_BPS, ICI_LINK_BPS)]
    exposed_ms = [c * e for c, e in zip(comm_ms, EXPOSE_BAND)]

    step_ms = [c + x for c, x in zip(comp_ms, exposed_ms)]

    # Inversion: 50 independent flat-batched UNet calls, sharded over batch
    # (no halos, no guidance VJP) — scales ~linearly, same efficiency band.
    inv_s = [MEAS_INV_MS * STEPS / 8.0 / e / 1e3 for e in reversed(EFF_BAND)]
    # Codec: encode + final decode, spatially sharded over sp=4; decode
    # forward measured 21.9 ms, encode ~ comparable; band [ /4 ideal, /2 ].
    codec_s = [2 * MEAS_DECODE_MS / 4 / 1e3, 2 * MEAS_DECODE_MS / 2 / 1e3]
    # Host/dispatch: fused one-scan edit + one inversion program + codec =
    # a handful of synced calls; single-chip e2e shows ~0.3 s of
    # non-step time (4.48 - 1.02 inv - 3.51 edit), kept constant (it is
    # host-bound, not chip-bound).
    resid_s = max(MEAS_E2E_S - MEAS_INV_MS * STEPS / 1e3
                  - MEAS_STEP_MS * STEPS / 1e3, 0.0)

    e2e_s = [i + STEPS * s / 1e3 + c + resid_s
             for i, s, c in zip(inv_s, step_ms, codec_s)]

    report = {
        "anchors": {
            "meas_step_ms": MEAS_STEP_MS, "meas_inv_ms_per_step": MEAS_INV_MS,
            "meas_decode_ms": MEAS_DECODE_MS, "meas_e2e_s": MEAS_E2E_S,
        },
        "flops": {
            "unsharded_per_step": f_1, "per_device_per_step": f_dev,
            "halo_overhead_x": round(halo_overhead, 4),
            "achieved_flops_per_s_single_chip": r_meas,
        },
        "collectives": {
            k: {"count": coll[k], "mb": round(coll_bytes[k] / 2**20, 2)}
            for k in coll
        },
        "comm": {
            "bytes_per_device_per_step_mb": round(comm_bytes / 2**20, 2),
            "bytes_f32_reference_mb": round(comm_bytes_f32 / 2**20, 2),
            "count_delta_bf16_minus_f32": count_delta,
            "module_dtype": "bf16 (production; f32 kept as census reference)",
            "time_ms_band": [round(c, 3) for c in comm_ms],
            "exposed_ms_band": [round(x, 3) for x in exposed_ms],
            "exposure_assumption": "25-100% of comm time exposed (XLA "
            "async-overlap unvalidated on real multi-chip hardware — no "
            "8-chip slice in this environment; quote the band, not a point)",
            "ici_link_bps": ICI_LINK_BPS,
        },
        "projection": {
            "compute_ms_band": [round(c, 2) for c in comp_ms],
            "step_ms_band": [round(s, 2) for s in step_ms],
            "steps_per_s_band": [round(1e3 / s, 2) for s in reversed(step_ms)],
            "inversion_s_band": [round(i, 3) for i in inv_s],
            "codec_s_band": [round(c, 3) for c in codec_s],
            "residual_host_s": round(resid_s, 3),
            "e2e_s_band": [round(e, 2) for e in e2e_s],
            "eff_band": list(EFF_BAND), "expose_band": list(EXPOSE_BAND),
        },
    }
    print(json.dumps(report, indent=2))
    with open("/root/repo/MULTICHIP_PROJECTION_r05.json", "w") as f:
        json.dump(report, f, indent=2)

    lo, hi = e2e_s
    mid = 0.5 * (lo + hi)
    print(f"\nprojected v5e-8 e2e = {mid:.2f} s +/- {(hi - lo) / 2:.2f} "
          f"(band [{lo:.2f}, {hi:.2f}]; north star < 2 s)")


if __name__ == "__main__":
    main()
