"""A/B the approximate int8 conv point (DIE_TPU_CONV=int8_large +
DIE_TPU_INT8_BWD=1, gate 128) on the WALL-CLOCK e2e phases: `e2e`
(invert+edit) and `e2e_seg` (align->segment->invert->masked edit).

Full-workload sequential A/B in one process (rule 2: full-bench A/Bs are
reliable; each phase call builds fresh jit wrappers, so the trace-time env
flags bind per-config). Census-verified per config.

RESULT (v5e, 2026-08-18 23:42-23:51, census-verified 123 int8 convs):
e2e 4.540 -> 4.208 s (-7.3%) — the guidance decode/dgrad savings carry
through the wall-clock invert+edit flow. e2e_seg 4.781 -> 4.854 (+1.5%),
a WASH within that phase's 4.70-5.82 run-to-run band: its guidance VJP is
dominated by the BiSeNet forward/backward (plain nn.Conv, not dispatched),
not the VAE decode.

Run on the chip:  python scripts/ab_e2e_int8.py
"""

import os
import sys

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = {
    "exact": {"DIE_TPU_CONV": "auto", "DIE_TPU_INT8_BWD": "0"},
    "int8": {"DIE_TPU_CONV": "int8_large", "DIE_TPU_INT8_MIN_H": "128",
             "DIE_TPU_INT8_BWD": "1"},
}


def main():
    assert jax.default_backend() != "cpu", "A/B needs the chip"
    from bench import _build_models, phase_e2e, phase_e2e_seg
    from diffusion_image_editing_tpu.ops import conv as C

    models = _build_models(tiny=False)
    results = {}
    for name, env in CONFIGS.items():
        os.environ.update(env)
        before = C.snapshot_trace_counts()
        e2e = phase_e2e(False, models, reps=2)
        e2e_seg = phase_e2e_seg(False, models, reps=2)
        delta = {k: C.TRACE_COUNTS[k] - before[k] for k in before}
        if name == "int8" and not delta["int8"]:
            raise RuntimeError(f"int8 config traced no int8 convs ({delta})")
        results[name] = (e2e, e2e_seg)
        print(f"{name}: e2e {e2e:.3f} s  e2e_seg {e2e_seg:.3f} s  "
              f"census {delta}", flush=True)

    ex, i8 = results["exact"], results["int8"]
    print(f"e2e: {ex[0]:.3f} -> {i8[0]:.3f} s ({(i8[0]/ex[0]-1)*100:+.1f}%)")
    print(f"e2e_seg: {ex[1]:.3f} -> {i8[1]:.3f} s ({(i8[1]/ex[1]-1)*100:+.1f}%)")


if __name__ == "__main__":
    main()
