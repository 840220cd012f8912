"""AOT-validate the data-parallel BiSeNet trainer at REFERENCE scale over an
8-device 'dp' mesh (the trainer analog of `multichip_real_shapes.py`).

Compiles `make_sharded_train_step` at 448x448, width 64, batch 16/device
(global 128), norm=abn_sync (per-device moments psum'd over 'dp' — the
InPlaceABNSync capability) on the virtual CPU mesh via ShapeDtypeStruct
avals, then reports from the partitioned HLO:

  1. per-device memory (argument/output/temp) vs 16 GB v5e HBM;
  2. the collective census — expect one fused gradient all-reduce family
     (the DDP NCCL equivalent) plus the ABN moment psums;
  3. that conv operands stay at the PER-DEVICE batch (16), i.e. the batch
     axis is genuinely sharded, not all-gathered.

Run: PALLAS_AXON_POOL_IPS= python scripts/multichip_seg_train.py
Results recorded in PARITY.md (round 3); writes MULTICHIP_SEG_r04.json (r03 naming until round 4).
"""

from __future__ import annotations

import collections
import json
import re
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, "/root/repo")

from diffusion_image_editing_tpu.seg.train import (  # noqa: E402
    TrainConfig,
    create_train_state,
    make_sharded_train_step,
)

SIZE, WIDTH, BATCH = 448, 64, 16  # reference recipe, per device


def census(hlo: str):
    coll = collections.Counter()
    coll_bytes = collections.Counter()
    pat = re.compile(
        r"= \S* (all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)\("
    )
    dtype_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1}
    for line in hlo.splitlines():
        m = pat.search(line)
        if not m:
            continue
        kind = m.group(1)
        coll[kind] += 1
        for t_m in re.finditer(
            r"([a-z0-9]+)\[([0-9,]*)\]", line.split("=")[1].split(kind)[0]
        ):
            dt, dims = t_m.group(1), t_m.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            coll_bytes[kind] += n * dtype_bytes.get(dt, 4)
    return coll, coll_bytes


def main():
    assert len(jax.devices()) == 8
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    cfg = TrainConfig(image_size=SIZE, batch_size_per_device=BATCH,
                      norm="abn_sync", width=WIDTH)

    # abstract state: eval_shape through the real constructor
    def mk_state():
        _, s = create_train_state(cfg, jax.random.PRNGKey(0), axis_name="dp")
        return s

    state_avals = jax.eval_shape(mk_state)

    from diffusion_image_editing_tpu.seg.train import create_model

    model = create_model(cfg, axis_name="dp")
    step_fn = make_sharded_train_step(model, cfg, mesh)

    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    state_avals = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=rep), state_avals
    )
    img = jax.ShapeDtypeStruct((BATCH * 8, SIZE, SIZE, 3), jnp.float32, sharding=dp)
    lab = jax.ShapeDtypeStruct((BATCH * 8, SIZE, SIZE), jnp.int32, sharding=dp)

    print("lowering...", flush=True)
    lowered = step_fn.lower(state_avals, img, lab)
    print("compiling...", flush=True)
    compiled = lowered.compile()
    print("compiled.", flush=True)

    report = {
        "mesh": {"dp": 8},
        "shapes": {"image_global": [BATCH * 8, SIZE, SIZE, 3], "width": WIDTH},
        "norm": cfg.norm,
    }
    mem = compiled.memory_analysis()
    if mem is not None:
        report["memory_per_device"] = {
            "argument_gb": round(mem.argument_size_in_bytes / 2**30, 3),
            "output_gb": round(mem.output_size_in_bytes / 2**30, 3),
            "temp_gb": round(mem.temp_size_in_bytes / 2**30, 3),
        }
    hlo = compiled.as_text()
    coll, coll_bytes = census(hlo)
    report["collectives"] = {
        k: {"count": coll[k], "mb": round(coll_bytes[k] / 2**20, 2)} for k in coll
    }

    # batch-sharding check: no ACTIVATION conv operand may carry more than
    # the per-device batch. Activations are N,H,W,C with H == W > 7; weight
    # kernels ((O,3,3,I) / (3,3,I,O)) and reshaped reduction plumbing
    # ((256,1,1,19)) matched looser filters as false positives.
    bad = []
    for line in hlo.splitlines():
        if " convolution(" in line or " = convolution" in line:
            for m in re.finditer(r"f32\[([0-9,]+)\]", line):
                dims = tuple(int(d) for d in m.group(1).split(","))
                if (len(dims) == 4 and dims[0] > BATCH
                        and dims[1] == dims[2] and dims[1] > 7):
                    bad.append(dims)
    report["conv_batch_leaks"] = [list(d) for d in bad[:5]]
    report["batch_sharded"] = not bad

    print(json.dumps(report, indent=2))
    with open("/root/repo/MULTICHIP_SEG_r04.json", "w") as f:
        json.dump(report, f, indent=2)
    assert report["batch_sharded"], "global-batch conv operand leaked!"
    if "memory_per_device" in report:
        tot = sum(report["memory_per_device"].values())
        assert tot < 16.0, f"per-device memory {tot} GB exceeds v5e HBM"
    print("OK", flush=True)


if __name__ == "__main__":
    main()
