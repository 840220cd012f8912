"""End-to-end A/B of the conv dispatch (DIE_TPU_CONV auto/shift9/xla) on
the SD-1.5 512px guided edit, per the project measurement rules: all
variants built as separate programs in ONE process, every program warmed
with full 50-step passes, then interleaved A/B/A/B passes of 50 chained
steps with a single readback per pass.

CRITICAL trace-time detail (the first version of this script was invalid):
`DIE_TPU_CONV` is read when the program is TRACED, and fresh `jax.jit`
wrappers trace lazily at first CALL — so each variant must be warmed
immediately after setting its env var, before building the next variant.
`ops.conv.TRACE_COUNTS` verifies at runtime which path each program
captured; the script aborts if a variant traced the wrong path.

RESULT (v5e, 2026-08-17, census-verified): xla 70.28 ms/step, shift9 on its
standalone win window 71.63, shift9 everywhere 160.11 — XLA's epilogue
fusion beats shift9's higher raw MXU rate end-to-end; auto dispatch is now
XLA on every shape (`ops/conv.py` docstring).

RESULT (v5e, 2026-08-18, int8 gate sweep, census-verified): xla 70.04,
int8_large@64 76.36, int8_large@128 **67.09** (= 14.90 steps/s, the first
e2e conv-dispatch win), int8_large@256 67.90 ms/step. Gate 32 measured
separately at 85.19. The winning gate quantizes ONLY the guidance decode's
H>=128 stages (22 of 82 convs); default DIE_TPU_INT8_MIN_H is now 128.
Opt-in regardless (approximate forward).

RESULT (v5e, 2026-08-19, fused GN+SiLU->conv Pallas kernel, census-verified
xla 82 convs vs fused 39 xla + 43 pallas): xla 69.87 ms/step (14.31
steps/s), fused 72.85 ms/step (13.73) — negative #4, 4.3% e2e loss on the
exact headline despite correct numerics at every planned shape
(scripts/smoke_fused_conv_chip.py, chip-passed same day). Dispatch
decision: auto stays XLA everywhere; DIE_TPU_FUSED_CONV stays opt-in.

Run on the chip:  python scripts/ab_conv_dispatch.py
Variant syntax:   AB_CONV_VARIANTS=xla,int8_large@64,int8_large@128
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STEPS = 50


def main():
    assert jax.default_backend() != "cpu", "A/B needs the chip"
    from bench import _build_models, build_edit_step
    from diffusion_image_editing_tpu.ops import conv as C

    models = _build_models(tiny=False)  # shared weights; programs differ

    variants = {}
    vlist = tuple(os.environ.get("AB_CONV_VARIANTS", "xla,auto,shift9").split(","))
    for v in vlist:
        # "int8_large@N" = gated int8 with DIE_TPU_INT8_MIN_H=N; a "+bwd"
        # suffix also quantizes the dgrad (DIE_TPU_INT8_BWD=1). All
        # trace-time, so each variant's programs capture their own flags.
        mode = v
        os.environ["DIE_TPU_INT8_BWD"] = "0"
        os.environ["DIE_TPU_FUSED_CONV"] = "0"
        if mode.endswith("+bwd"):
            mode = mode[: -len("+bwd")]
            os.environ["DIE_TPU_INT8_BWD"] = "1"
        if "@" in mode:
            mode, min_h = mode.split("@")
            os.environ["DIE_TPU_INT8_MIN_H"] = min_h
        if mode == "fused":
            # GN+SiLU->conv Pallas prologue fusion (ops/fused_conv.py) on the
            # H<=64 window, exact-path conv (auto = XLA) everywhere else.
            # Trace-time like every DIE_TPU_* flag.
            os.environ["DIE_TPU_FUSED_CONV"] = "1"
            os.environ["DIE_TPU_CONV"] = "auto"
        else:
            os.environ["DIE_TPU_CONV"] = mode
        denoise_step, guidance_nudge, eps_fn, decode_fn, attr, xt, sched = (
            build_edit_step(False, models=models)
        )
        timesteps = jnp.asarray(sched.timesteps)

        def run_pass(x, _d=denoise_step, _g=guidance_nudge, _e=eps_fn,
                     _dec=decode_fn, _a=attr, _ts=timesteps):
            for i in range(STEPS):
                t = _ts[i]
                x, eps = _d(_e, x, t)
                x = _g(_dec, _a, x, eps, t, jnp.int32(i))
            return float(jnp.sum(x))  # one sync per pass

        before = C.snapshot_trace_counts()
        run_pass(xt)  # traces + compiles NOW, under this variant's env var
        after = C.snapshot_trace_counts()
        delta = {k: after[k] - before[k] for k in after}
        print(f"built+traced {v}: conv trace census {delta}", flush=True)
        if mode == "xla" and delta["shift9"]:
            raise RuntimeError("xla variant traced shift9 convs — A/B invalid")
        if mode == "shift9" and delta["xla"]:
            raise RuntimeError("shift9 variant traced xla convs — A/B invalid")
        if mode == "int8" and not delta["int8"]:
            raise RuntimeError("int8 variant traced no int8 convs — A/B invalid")
        if mode == "int8_large" and (not delta["int8"] or not delta["xla"]):
            # the gated mode must split: int8 on H>=32, xla below
            raise RuntimeError(
                f"int8_large census not mixed ({delta}) — A/B invalid")
        if mode == "fused" and not delta.get("fused_pallas"):
            raise RuntimeError(
                f"fused variant traced no fused Pallas convs ({delta}) — "
                "A/B invalid")
        if mode != "fused" and delta.get("fused_pallas"):
            raise RuntimeError(
                f"{v} traced fused Pallas convs ({delta}) — A/B invalid")
        # (The decisive 2026-08-17 run used the pre-decision auto rule —
        # shift9 on 256<=rows<=32768 — census {'shift9': 53, 'xla': 29};
        # auto has since been set to the e2e winner, XLA everywhere.)
        variants[v] = (run_pass, xt)

    # second warm pass for every program (relay first-program artifact)
    for v, (run, xt) in variants.items():
        run(xt)
        print("warmed", v, flush=True)

    times = {v: [] for v in variants}
    for p in range(4):
        for v, (run, xt) in variants.items():
            t0 = time.perf_counter()
            run(xt)
            times[v].append(time.perf_counter() - t0)
        print(f"pass {p}:",
              {v: f"{min(ts)/STEPS*1e3:.2f} ms/step" for v, ts in times.items()},
              flush=True)

    for v, ts in times.items():
        best = min(ts)
        print(f"{v}: best {best:.3f} s/pass = {best/STEPS*1e3:.2f} ms/step "
              f"= {STEPS/best:.2f} steps/s", flush=True)


if __name__ == "__main__":
    main()
