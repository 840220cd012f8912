"""AOT-compile the production multichip programs with the REAL v5e compiler.

Every prior multichip artifact (MULTICHIP_*_r0{3,4}.json) validated the
sharded programs on a virtual 8-CPU-device mesh: correct GSPMD partitioning
and collective census, but the *CPU* backend's layouts, memory model, and
scheduler. This machine has libtpu installed locally, so
`jax.experimental.topologies.get_topology_desc("v5e:2x4")` gives the actual
v5e-8 topology and `.lower(...).compile()` runs the REAL TPU compiler —
entirely host-side, no chip, no tunnel. That upgrades three claims:

1. **Compile validity on hardware toolchain**: Mosaic/layout/HBM issues the
   CPU AOT can't catch (CLAUDE.md rule 5's lesson, applied to multichip).
2. **Per-device HBM from real layouts** (v5e tiling/padding included).
3. **Async-overlap evidence**: the TPU module is *scheduled*; collectives
   appear as `*-start`/`*-done` pairs and any compute instruction scheduled
   between the pair IS overlapped with the transfer. The r04/r05 projection
   assumed comm exposure in [25%, 100%] with "no overlap validation"
   (VERDICT r4 weak item 8); this measures, per collective kind, how many
   pairs (and how many payload MB) the real compiler brackets with compute.

Programs (same builders as the CPU-mesh artifacts, byte-for-byte same
sharding code paths — `parallel/edit_shard.py`, `seg/train.py`):
  * guided_step   — bf16 production edit step, cfg(2) x sp(4) mesh
  * inversion_grp — timestep-parallel DDPM inversion group (chunk 10)
  * seg_train     — BiSeNet DP trainer step, dp(8), abn_sync

Run:
  PALLAS_AXON_POOL_IPS= TPU_ACCELERATOR_TYPE=v5litepod-8 \
  TPU_WORKER_HOSTNAMES=localhost timeout 3000 python scripts/aot_v5e8_real.py

Writes MULTICHIP_AOT_V5E8_r05.json. Reference scope: the reference scales
via DDP/NCCL (`src/Segmentation/train.py:40-62`); here the same programs
ride ICI collectives placed by GSPMD and scheduled by the v5e compiler.
"""

from __future__ import annotations

import collections
import json
import os
import re
import sys

os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-8")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from multichip_real_shapes import LATENT, build, guided_step  # noqa: E402

from diffusion_image_editing_tpu.core import schedule_for_model  # noqa: E402
from diffusion_image_editing_tpu.engine.invert import _ddpm_invert_group  # noqa: E402
from diffusion_image_editing_tpu.guidance import SingleColorAttrFunc  # noqa: E402
from diffusion_image_editing_tpu.parallel import cfg_mesh  # noqa: E402

GROUP = 10

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "f64": 8, "s8": 1, "u8": 1, "s16": 2, "u16": 2}

_COLL = r"(?:all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
# lhs name; the TYPE may be a space-containing tuple "(bf16[...], bf16[...])"
# for async *-start ops, so the opcode is found separately as the first
# word immediately followed by '(' on the rhs (type tokens never are).
_NAME_RE = re.compile(r"^\s+(?:ROOT )?%?([\w.-]+) = ")
_OPCODE_RE = re.compile(r"([a-z][a-z0-9-]*)\(")
_START_RE = re.compile(rf"^({_COLL})-start$")
_DONE_RE = re.compile(rf"^({_COLL})-done$")
# compute opcodes: anything scheduled between start/done that does real work
_COMPUTE = {"fusion", "convolution", "dot", "custom-call", "sort", "scatter",
            "reduce", "reduce-window", "cholesky", "triangular-solve"}


def _payload_bytes(line: str, end: int) -> int:
    """Payload of a collective(-start) line = the LARGEST tensor on the lhs
    (async starts carry an (in, out, ...) tuple plus u32 sync flags; the
    transferred buffer is the biggest member). `end` = opcode match end, so
    only the type part left of the opcode is scanned."""
    lhs = line[: end].split("=", 1)[1]
    best = 0
    for m in re.finditer(r"([a-z0-9]+)\[([0-9,]*)\]", lhs):
        dt, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        best = max(best, n * _DTYPE_BYTES.get(dt, 4))
    return best


def overlap_census(hlo: str):
    """Parse the SCHEDULED TPU module: pair every collective *-start with its
    *-done inside each computation (text order == schedule order for a
    compiled TPU module) and count compute instructions scheduled between
    the pair — those run while the transfer is in flight."""
    kinds = collections.defaultdict(lambda: {
        "async_pairs": 0, "pairs_with_compute": 0, "sync_instances": 0,
        "bytes": 0, "bytes_overlapped": 0, "compute_between": []})
    open_starts = {}  # name -> (kind, bytes, compute_count_so_far)
    for raw in hlo.splitlines():
        m = _NAME_RE.match(raw)
        if m is None:
            if raw and not raw[0].isspace():
                # new computation header: schedule order resets; any
                # unmatched starts (shouldn't happen) are dropped
                open_starts.clear()
            continue
        name = m.group(1)
        om = _OPCODE_RE.search(raw, m.end())
        if om is None:
            continue
        opcode = om.group(1)
        sm = _START_RE.match(opcode)
        dm = _DONE_RE.match(opcode)
        if sm:
            open_starts[name] = [sm.group(1), _payload_bytes(raw, om.start()), 0]
            continue
        if dm:
            # done's operand (right after the opcode's paren) names the start
            opnd = re.match(r"\s*%?([\w.-]+)", raw[om.end():])
            key = opnd.group(1) if opnd else None
            info = open_starts.pop(key, None)
            if info is None:
                continue
            kind, nbytes, ncomp = info
            k = kinds[kind]
            k["async_pairs"] += 1
            k["bytes"] += nbytes
            k["compute_between"].append(ncomp)
            if ncomp > 0:
                k["pairs_with_compute"] += 1
                k["bytes_overlapped"] += nbytes
            continue
        base = re.fullmatch(_COLL, opcode)
        if base:
            k = kinds[opcode]
            k["sync_instances"] += 1
            k["bytes"] += _payload_bytes(raw, om.start())
            continue
        if opcode in _COMPUTE:
            for info in open_starts.values():
                info[2] += 1
    out = {}
    for kind, k in kinds.items():
        cb = k.pop("compute_between")
        out[kind] = {
            **{x: k[x] for x in ("async_pairs", "pairs_with_compute",
                                 "sync_instances")},
            "mb": round(k["bytes"] / 2**20, 2),
            "mb_overlapped": round(k["bytes_overlapped"] / 2**20, 2),
            "median_compute_between": (
                float(np.median(cb)) if cb else None),
        }
    return out


def report(compiled, tag, rep):
    entry = {}
    mem = compiled.memory_analysis()
    if mem is not None:
        entry["memory_per_device_gb"] = {
            "argument": round(mem.argument_size_in_bytes / 2**30, 3),
            "output": round(mem.output_size_in_bytes / 2**30, 3),
            "temp": round(mem.temp_size_in_bytes / 2**30, 3),
        }
        total = (mem.argument_size_in_bytes + mem.temp_size_in_bytes
                 + mem.output_size_in_bytes)
        entry["fits_16gb_hbm"] = bool(total < 16 * 2**30)
    try:
        cost = compiled.cost_analysis()
        entry["cost_analysis"] = {
            "flops_per_device": cost.get("flops"),
            "optimal_seconds": cost.get("optimal_seconds"),
        }
    except Exception as e:  # noqa: BLE001
        entry["cost_analysis"] = f"unavailable: {e}"
    hlo = compiled.as_text()
    with open(f"/tmp/aot_v5e8_{tag}.hlo", "w") as f:  # re-analysis w/o recompile
        f.write(hlo)
    oc = overlap_census(hlo)
    entry["collectives_scheduled"] = oc
    tot_mb = sum(v["mb"] for v in oc.values())
    ov_mb = sum(v["mb_overlapped"] for v in oc.values())
    entry["overlap_fraction_bytes"] = round(ov_mb / tot_mb, 4) if tot_mb else None
    rep[tag] = entry
    print(f"{tag}: mem={entry.get('memory_per_device_gb')} "
          f"overlap={entry['overlap_fraction_bytes']}", flush=True)
    return entry


def reanalyze():
    """Recompute the collective schedule census from the /tmp HLO dumps of a
    prior run (parser fixes shouldn't cost a 40-minute recompile)."""
    path = "/root/repo/MULTICHIP_AOT_V5E8_r05.json"
    with open(path) as f:
        rep = json.load(f)
    for tag in ("guided_step_bf16", "inversion_group_bf16", "seg_train_dp8"):
        hlo_path = f"/tmp/aot_v5e8_{tag}.hlo"
        if not os.path.exists(hlo_path) or tag not in rep:
            print(f"skip {tag} (no dump or no entry)")
            continue
        with open(hlo_path) as f:
            oc = overlap_census(f.read())
        rep[tag]["collectives_scheduled"] = oc
        tot = sum(v["mb"] for v in oc.values())
        ov = sum(v["mb_overlapped"] for v in oc.values())
        rep[tag]["overlap_fraction_bytes"] = round(ov / tot, 4) if tot else None
        print(tag, json.dumps(oc, indent=2))
        print(f"{tag}: overlap_fraction_bytes={rep[tag]['overlap_fraction_bytes']}")
    with open(path, "w") as f:
        json.dump(rep, f, indent=2)
    print("rewritten", path)


def project_update():
    """Fold the measured v5e schedule into the r05 projection: replace the
    ASSUMED comm-exposure band [25%, 100%] with the fraction the real
    compiler's schedule actually exposes, and bracket comm bytes between the
    GSPMD-census count (logical payloads) and the scheduled module's buffer
    payloads (post-rewrite upper bound: the compiler decomposed 34 logical
    all-gathers into 138 instructions). Appends a `schedule_informed`
    section to MULTICHIP_PROJECTION_r05.json — inputs and outputs, no
    hand-entered numbers."""
    with open("/root/repo/MULTICHIP_AOT_V5E8_r05.json") as f:
        aot = json.load(f)
    with open("/root/repo/MULTICHIP_PROJECTION_r05.json") as f:
        proj = json.load(f)
    oc = aot["guided_step_bf16"]["collectives_scheduled"]
    tot_mb = sum(v["mb"] for v in oc.values())
    hidden_mb = sum(v["mb_overlapped"] for v in oc.values())
    exposure = (tot_mb - hidden_mb) / tot_mb
    bytes_lo_mb = proj["comm"]["bytes_per_device_per_step_mb"]  # GSPMD census
    bytes_hi_mb = tot_mb                                        # scheduled buffers
    link = proj["comm"]["ici_link_bps"]
    comm_ms = [bytes_lo_mb * 2**20 / (2 * link) * 1e3,
               bytes_hi_mb * 2**20 / link * 1e3]
    exposed_ms = [comm_ms[0] * exposure, comm_ms[1] * 1.0]
    comp_ms = proj["projection"]["compute_ms_band"]
    step_ms = [c + x for c, x in zip(comp_ms, exposed_ms)]
    inv_s = proj["projection"]["inversion_s_band"]
    codec_s = proj["projection"]["codec_s_band"]
    resid = proj["projection"]["residual_host_s"]
    e2e = [i + 50 * s / 1e3 + c + resid
           for i, s, c in zip(inv_s, step_ms, codec_s)]
    proj["schedule_informed"] = {
        "source": "MULTICHIP_AOT_V5E8_r05.json (real v5e compiler, scheduled module)",
        "measured_exposure_fraction_bytes": round(exposure, 4),
        "schedule_facts": {
            "async": "collective-permute only (halo exchanges): "
                     f"{oc['collective-permute']['pairs_with_compute']}/"
                     f"{oc['collective-permute']['async_pairs']} pairs have "
                     "compute scheduled in flight",
            "sync": "all-gather/all-reduce scheduled synchronously — the "
                    "decode-VJP chain is serial, nothing independent exists "
                    "to overlap (the compiler DOES async-gather when slack "
                    "exists: verified on a probe module)",
        },
        "comm_bytes_band_mb": [bytes_lo_mb, round(bytes_hi_mb, 2)],
        "comm_bytes_note": "lo = GSPMD logical census; hi = scheduled-module "
                           "buffer payloads (post-decomposition upper bound; "
                           "ring all-gather wire bytes are (N-1)/N of buffer)",
        "exposed_ms_band": [round(x, 3) for x in exposed_ms],
        "step_ms_band": [round(s, 3) for s in step_ms],
        "e2e_s_band": [round(x, 3) for x in e2e],
    }
    with open("/root/repo/MULTICHIP_PROJECTION_r05.json", "w") as f:
        json.dump(proj, f, indent=2)
    print(json.dumps(proj["schedule_informed"], indent=2))


def main():
    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    devs = list(topo.devices)
    assert len(devs) == 8, devs
    print("topology:", devs[0].device_kind if hasattr(devs[0], "device_kind")
          else devs[0], flush=True)
    rep = {"topology": "v5e:2x4 (real TPU compiler, compile-only)",
           "note": ("text order == schedule order in a compiled TPU module; "
                    "compute instructions between *-start/*-done run while "
                    "the transfer is in flight")}

    # ---- 1. bf16 production guided edit step over cfg(2) x sp(4) -----------
    mesh = cfg_mesh(devices=np.array(devs), cfg=2, sp=4)
    eps_fn, dec_fn = build(mesh, dtype=jnp.bfloat16)
    sched = schedule_for_model("sd", num_inference_steps=50)
    af = SingleColorAttrFunc(target=0.9, color_idx=0, loss_scale=5.0,
                             t1=0, t2=50, mask_attr_grad=False)
    x = jax.ShapeDtypeStruct((1, LATENT, LATENT, 4), jnp.bfloat16)
    t = jax.ShapeDtypeStruct((), jnp.int32)
    idx = jax.ShapeDtypeStruct((), jnp.int32)
    print("compiling guided_step (bf16, cfg x sp) with the v5e compiler...",
          flush=True)
    comp = jax.jit(guided_step).lower(sched, eps_fn, dec_fn, af, x, t, idx
                                      ).compile()
    report(comp, "guided_step_bf16", rep)

    # ---- 2. timestep-parallel inversion group ------------------------------
    x_flat = jax.ShapeDtypeStruct((50, LATENT, LATENT, 4), jnp.bfloat16)
    ts_flat = jax.ShapeDtypeStruct((50,), jnp.int32)
    gidx = jax.ShapeDtypeStruct((), jnp.int32)
    print("compiling inversion group program...", flush=True)
    comp = (jax.jit(_ddpm_invert_group, static_argnames=("eta", "group"))
            .lower(sched, eps_fn, x_flat, x_flat, ts_flat, gidx,
                   eta=1.0, group=GROUP).compile())
    report(comp, "inversion_group_bf16", rep)

    # ---- 3. BiSeNet DP trainer step (dp=8, abn_sync) ------------------------
    from diffusion_image_editing_tpu.seg.train import (
        TrainConfig, create_model, create_train_state, make_sharded_train_step)
    SIZE, WIDTH, BATCH = 448, 64, 16
    dmesh = Mesh(np.array(devs), ("dp",))
    cfg = TrainConfig(image_size=SIZE, batch_size_per_device=BATCH,
                      norm="abn_sync", width=WIDTH)
    state_avals = jax.eval_shape(
        lambda: create_train_state(cfg, jax.random.PRNGKey(0), axis_name="dp")[1])
    model = create_model(cfg, axis_name="dp")
    step_fn = make_sharded_train_step(model, cfg, dmesh)
    repl = NamedSharding(dmesh, P())
    dp = NamedSharding(dmesh, P("dp"))
    state_avals = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=repl),
        state_avals)
    img = jax.ShapeDtypeStruct((BATCH * 8, SIZE, SIZE, 3), jnp.float32,
                               sharding=dp)
    lab = jax.ShapeDtypeStruct((BATCH * 8, SIZE, SIZE), jnp.int32, sharding=dp)
    print("compiling seg trainer step (dp=8, abn_sync)...", flush=True)
    comp = step_fn.lower(state_avals, img, lab).compile()
    report(comp, "seg_train_dp8", rep)

    print(json.dumps(rep, indent=2))
    with open("/root/repo/MULTICHIP_AOT_V5E8_r05.json", "w") as f:
        json.dump(rep, f, indent=2)
    for tag in ("guided_step_bf16", "inversion_group_bf16", "seg_train_dp8"):
        assert rep[tag].get("fits_16gb_hbm", True), f"{tag} exceeds v5e HBM"
    print("OK: all three programs compile on the real v5e toolchain",
          flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "reanalyze":
        reanalyze()
    elif len(sys.argv) > 1 and sys.argv[1] == "project":
        project_update()
    else:
        main()
