"""Per-conv-shape MXU utilization survey for the SD-1.5 UNet + VAE decoder.

VERDICT r2 item 1: the ~17 ms conv/GN residual of the CFG step runs at ~18%
of MXU peak. This script measures, per distinct hot conv shape, the achieved
TFLOP/s of three implementations:

  xla     — `lax.conv_general_dilated` NHWC (what `nn.Conv` emits today)
  im2col  — extract 3x3 patches -> one (B*H*W, 9*Cin) x (9*Cin, Cout) matmul
  shift9  — 9 shifted (B*H*W, Cin) x (Cin, Cout) matmuls accumulated in f32
            (no 9x activation materialization; the classic TPU decomposition)

Methodology (CLAUDE.md rules 2/8, sharpened round 3): every SYNCED call
through the axon relay carries a fixed ~23.5 ms latency (measured: a scan of
N chained convs costs F + N*c with F ~= 23.5 ms for N in {1,10,30,100} —
`/tmp/scanlen_probe.py`), so per-op times from single calls are garbage.
Each variant is ONE jitted program scanning N back-to-back convs
(x_{i+1} = conv(x_i), true data dependence, no reduction barrier); the
per-conv cost is the N-SWEEP SLOPE c = (t(N_HI) - t(N_LO)) / (N_HI - N_LO),
which cancels F exactly. Variants are interleaved A/B/A/B across passes.

Run on the chip:  python scripts/conv_survey.py
Results go into PARITY.md round 3.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BF16_PEAK_TFLOPS = 197.0  # v5e per-chip bf16
SCAN_N = 30

# (tag, B, H, W, Cin, Cout)  — stride-1 pad-1 3x3 convs
SHAPES = [
    ("unet64_320", 2, 64, 64, 320, 320),
    ("unet32_640", 2, 32, 32, 640, 640),
    ("unet16_1280", 2, 16, 16, 1280, 1280),
    ("unet8_1280", 2, 8, 8, 1280, 1280),
    ("unet16_cat", 2, 16, 16, 2560, 1280),
    ("unet64_cat", 2, 64, 64, 960, 320),
    ("vae64_512", 1, 64, 64, 512, 512),
    ("vae128_512", 1, 128, 128, 512, 512),
    ("vae256_512", 1, 256, 256, 512, 512),
    ("vae256_256", 1, 256, 256, 256, 256),
    ("vae512_256to128", 1, 512, 512, 256, 128),
    ("vae512_128", 1, 512, 512, 128, 128),
]

DN = jax.lax.conv_dimension_numbers((1, 8, 8, 8), (3, 3, 8, 8), ("NHWC", "HWIO", "NHWC"))


def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def conv_im2col(x, w):
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    patches = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )  # (B, H, W, Cin*9) with Cin-major ordering matching HWIO reshape below
    mat = patches.reshape(b * h * wd, -1)
    # patches orders features as (Cin, KH, KW); reorder w to match
    wmat = jnp.transpose(w, (2, 0, 1, 3)).reshape(-1, cout)
    out = jax.lax.dot(mat, wmat, preferred_element_type=jnp.float32)
    return out.reshape(b, h, wd, cout).astype(x.dtype)


def conv_shift9(x, w):
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, h, wd, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            window = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, wd, cin))
            m = window.reshape(b * h * wd, cin)
            acc = acc + jax.lax.dot(
                m, w[dy, dx], preferred_element_type=jnp.float32
            ).reshape(b, h, wd, cout)
    return acc.astype(x.dtype)


def conv_int8(x, w):
    # full cost of the quantized path: dynamic act quant + s8xs8->s32 conv
    # + dequant (what DIE_TPU_CONV=int8 actually pays per conv). v5e int8
    # MXU peak is 2x bf16, so >100% of BF16_PEAK_TFLOPS is possible.
    from diffusion_image_editing_tpu.ops.conv import _conv3x3_int8_fwd

    return _conv3x3_int8_fwd(x, w)


IMPLS = {"xla": conv_xla, "im2col": conv_im2col, "shift9": conv_shift9,
         "int8": conv_int8}


N_LO, N_HI = 10, 110


def build_program(impl, shape, n):
    _, b, h, w_, cin, cout = shape
    f = IMPLS[impl]

    if cin == cout:
        # direct chain: x_{i+1} = conv(x_i) — true back-to-back convs.
        @functools.partial(jax.jit, static_argnums=2)
        def prog(x0, w, n_):
            def body(x, _):
                return f(x, w), ()

            final, _ = jax.lax.scan(body, x0, None, length=n_)
            return jnp.mean(final)

    else:
        @functools.partial(jax.jit, static_argnums=2)
        def prog(x0, w, n_):
            def body(carry, _):
                x = x0 + carry  # scalar-broadcast dependency; nothing hoists
                y = f(x, w)
                return (jnp.mean(y) * 1e-12).astype(x0.dtype), ()

            final, _ = jax.lax.scan(
                body, jnp.zeros((), x0.dtype), None, length=n_
            )
            return final

    return lambda x, w: prog(x, w, n)


OUT_PATH = os.environ.get("CONV_SURVEY_OUT", "/tmp/conv_survey.json")


def main():
    backend = jax.default_backend()
    print("backend:", backend, flush=True)
    if backend == "cpu":
        print("survey needs the TPU; aborting")
        return
    key = jax.random.PRNGKey(0)
    only = os.environ.get("CONV_SURVEY_ONLY")
    shapes = [s for s in SHAPES if (only is None or only in s[0])]
    results = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            results = json.load(f)

    for shape in shapes:
        tag, b, h, w_, cin, cout = shape
        if tag in results:
            print("skip (done):", tag, flush=True)
            continue
        x = jax.random.normal(key, (b, h, w_, cin), jnp.bfloat16)
        wgt = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.02
        progs = {
            (impl, n): build_program(impl, shape, n)
            for impl in IMPLS for n in (N_LO, N_HI)
        }
        # warm every variant fully (relay first-program artifact)
        for prog in progs.values():
            for _ in range(2):
                float(prog(x, wgt))
        # interleaved A/B/A/B passes
        times = {k: [] for k in progs}
        for _p in range(3):
            for k, prog in progs.items():
                t0 = time.perf_counter()
                float(prog(x, wgt))
                times[k].append(time.perf_counter() - t0)
        flops = 2 * b * h * w_ * cin * cout * 9
        row = {}
        for impl in IMPLS:
            # slope of the N-sweep cancels the fixed per-call relay latency
            t = (min(times[(impl, N_HI)]) - min(times[(impl, N_LO)])) / (N_HI - N_LO)
            tf = flops / t / 1e12
            row[impl] = {"ms": round(t * 1e3, 3), "tflops": round(tf, 1),
                         "pct_peak": round(100 * tf / BF16_PEAK_TFLOPS, 1)}
        results[tag] = {"shape": list(shape[1:]), "gflop": round(flops / 1e9, 2), **row}
        print(tag, json.dumps(row), flush=True)
        with open(OUT_PATH, "w") as f:
            json.dump(results, f, indent=2)
    print("wrote", OUT_PATH, flush=True)


if __name__ == "__main__":
    main()
