"""BiSeNet training step bench at the REFERENCE recipe scale (VERDICT r2
item 5): 448x448, width 64, batch 16/device, ~100 measured steps on the v5e
— the first capability-at-scale number for the seg trainer (reference:
2-GPU `src/Segmentation/train.py:56-59,91,111-160`).

Methodology (CLAUDE.md rule 2): the train loop chains TrainState through N
steps with NO host readback inside (async dispatch streams through the
relay), one `float(loss)` sync at the end; the fixed ~23.5 ms relay latency
per synced call is cancelled by timing two loop lengths and using the SLOPE
(t_hi - t_lo) / (N_hi - N_lo). Device-resident fixed batch isolates the
step; a host-fed pass through `batch_iterator` measures the input pipeline
on top.

Run on the chip:  python scripts/bench_seg_train.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jax.sharding import Mesh  # noqa: E402

from diffusion_image_editing_tpu.seg.data import SyntheticFaceMask, batch_iterator  # noqa: E402
from diffusion_image_editing_tpu.seg.train import (  # noqa: E402
    TrainConfig,
    create_train_state,
    make_sharded_train_step,
    shard_batch,
)

N_LO, N_HI = 10, 60
SIZE, BATCH, WIDTH = 448, 16, 64


def build(norm: str, mesh: Mesh, compute_dtype: str = "float32"):
    cfg = TrainConfig(image_size=SIZE, batch_size_per_device=BATCH,
                      norm=norm, width=WIDTH, compute_dtype=compute_dtype)
    axis_name = "dp" if norm == "abn_sync" else None
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), axis_name)
    step_fn = make_sharded_train_step(model, cfg, mesh)
    rng = np.random.default_rng(0)
    images, labels = shard_batch(
        (rng.normal(size=(BATCH, SIZE, SIZE, 3)).astype(np.float32),
         rng.integers(0, cfg.n_classes, (BATCH, SIZE, SIZE)).astype(np.int32)),
        mesh,
    )
    return state, step_fn, images, labels


def chained(step_fn, state, images, labels, n):
    for _ in range(n):
        state, loss = step_fn(state, images, labels)
    return state, float(loss)


def main():
    assert jax.default_backend() != "cpu", "bench needs the chip"
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    results = {}
    # bf16 A/B covers the VERDICT r3 item-4 dispatch question: does the
    # Pallas fused-ABN kernel or XLA's BN fusion win at bf16 compute?
    # SEG_TRAIN_NORMS / SEG_TRAIN_PASSES narrow/extend a re-run (VERDICT
    # r4 item 4: the abn_bf16 21.4 ms claim was a best-of-3 with 25%
    # spread — reproduce it with >= 5 slope passes).
    wanted = os.environ.get("SEG_TRAIN_NORMS", "").split(",")
    n_passes = int(os.environ.get("SEG_TRAIN_PASSES", "3"))
    for norm, cdt in (("bn", "float32"), ("bn_bf16", "bfloat16"),
                      ("abn", "float32"), ("abn_bf16", "bfloat16"),
                      ("abn_sync", "float32")):
        if wanted != [""] and norm not in wanted:
            continue
        state, step_fn, images, labels = build(norm.split("_")[0] if norm != "abn_sync" else norm, mesh, cdt)
        # compile + full warm (relay first-program artifact)
        state, _ = chained(step_fn, state, images, labels, N_LO)
        print(f"{norm}: compiled+warmed", flush=True)

        slopes = []
        for p in range(n_passes):
            t0 = time.perf_counter()
            state, _ = chained(step_fn, state, images, labels, N_LO)
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            state, _ = chained(step_fn, state, images, labels, N_HI)
            t_hi = time.perf_counter() - t0
            ms = (t_hi - t_lo) / (N_HI - N_LO) * 1e3
            if ms <= 0:  # relay stall hit the LO window — reject the pair
                print(f"  {norm} pass {p}: REJECTED non-positive slope "
                      f"({ms:.1f} ms/step)", flush=True)
                continue
            slopes.append(ms)
            print(f"  {norm} pass {p}: {ms:.1f} ms/step "
                  f"({BATCH/ms*1e3:.1f} img/s)", flush=True)
        if not slopes:
            raise FloatingPointError(f"{norm}: every slope pass stalled")
        best = min(slopes)
        results[norm] = {"best": best,
                         "median": float(np.median(slopes)),
                         "passes": [round(s, 2) for s in slopes]}

    # input pipeline on top: host-fed via batch_iterator (synthetic 448px
    # samples generated + stacked on the single host CPU core each step).
    # Variants (VERDICT r3 item 6): plain serial feed; background-thread
    # prefetch (aug overlaps device steps); prefetch with the device transfer
    # (shard_batch) ALSO inside the producer thread so the relay upload
    # overlaps device compute too.
    from diffusion_image_editing_tpu.seg.data import PrefetchIterator

    if wanted != [""]:  # targeted norm re-run: skip the feed matrix
        for norm, r in results.items():
            print(f"{norm}: best {r['best']:.1f} / median {r['median']:.1f} "
                  f"ms/step = {BATCH/r['median']*1e3:.1f} img/s (median) "
                  f"passes={r['passes']}", flush=True)
        return

    state, step_fn, images, labels = build("bn", mesh)
    state, _ = chained(step_fn, state, images, labels, 5)

    def make_feed(variant: str):
        raw = variant.endswith("+u8")
        ds = SyntheticFaceMask(n=64, size=SIZE, raw=raw)
        if variant == "plain":
            it = batch_iterator(ds, BATCH)
            return it, lambda: shard_batch(next(it), mesh)
        if variant == "prefetch":
            it = batch_iterator(ds, BATCH, prefetch=3, num_workers=2)
            return it, lambda: shard_batch(next(it), mesh)
        # prefetch+xfer: device_put happens in the producer thread;
        # +u8 additionally ships uint8 (4x fewer relay bytes, device-side
        # ImageNet normalize inside the step — train._prep_batch)
        base = batch_iterator(ds, BATCH, num_workers=2)
        it = PrefetchIterator((shard_batch(b, mesh) for b in base), size=3)
        return it, lambda: next(it)

    for variant in ("plain", "prefetch", "prefetch+xfer", "prefetch+xfer+u8"):
        it, feed = make_feed(variant)
        for _ in range(3):  # warm the feed path
            im, lb = feed()
            state, loss = step_fn(state, im, lb)
        float(loss)
        for n, tag in ((N_LO, "lo"), (N_HI, "hi")):
            t0 = time.perf_counter()
            for _ in range(n):
                im, lb = feed()
                state, loss = step_fn(state, im, lb)
            float(loss)
            if tag == "lo":
                t_lo = time.perf_counter() - t0
            else:
                t_hi = time.perf_counter() - t0
        fed = (t_hi - t_lo) / (N_HI - N_LO) * 1e3
        print(f"host-fed bn [{variant}]: {fed:.1f} ms/step "
              f"({BATCH/fed*1e3:.1f} img/s)", flush=True)
        if hasattr(it, "close"):
            it.close()

    for norm, r in results.items():
        print(f"{norm}: best {r['best']:.1f} / median {r['median']:.1f} "
              f"ms/step = {BATCH/r['median']*1e3:.1f} img/s (median, 448px, "
              f"width 64, batch {BATCH}/device) passes={r['passes']}",
              flush=True)


if __name__ == "__main__":
    main()
