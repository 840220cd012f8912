"""Pin the scheduled-HLO overlap parser of scripts/aot_v5e8_real.py.

The parser turns a compiled (scheduled) TPU module's text into async-overlap
evidence: collective `*-start`/`*-done` pairs, whether compute instructions
are scheduled between them (those run while the transfer is in flight), and
payload bytes. Pure text processing — pinned here on a synthetic module so
a jax/HLO-format drift breaks loudly instead of silently zeroing the
MULTICHIP_AOT_V5E8 numbers.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from aot_v5e8_real import overlap_census  # noqa: E402

HLO = """\
HloModule jit_step, is_scheduled=true

%fused_computation (p0: bf16[8,128]) -> bf16[8,128] {
  %p0 = bf16[8,128]{1,0} parameter(0)
  ROOT %add = bf16[8,128]{1,0} add(%p0, %p0)
}

ENTRY %main (a: bf16[8,128], b: f32[256]) -> bf16[8,128] {
  %a = bf16[8,128]{1,0} parameter(0)
  %b = f32[256]{0} parameter(1)
  %ag-start = (bf16[8,128]{1,0}, bf16[16,128]{1,0}) all-gather-start(%a), dimensions={0}
  %f1 = bf16[8,128]{1,0} fusion(%a), kind=kLoop, calls=%fused_computation
  %conv = bf16[8,128]{1,0} convolution(%f1, %f1), window={size=1}
  %ag-done = bf16[16,128]{1,0} all-gather-done(%ag-start)
  %cp-start = (f32[256]{0}, f32[256]{0}) collective-permute-start(%b), source_target_pairs={{0,1}}
  %cp-done = f32[256]{0} collective-permute-done(%cp-start)
  %ar = f32[256]{0} all-reduce(%b), to_apply=%fused_computation
  ROOT %out = bf16[8,128]{1,0} fusion(%f1), kind=kLoop, calls=%fused_computation
}
"""


def test_overlap_census_pairs_and_bytes():
    oc = overlap_census(HLO)
    ag = oc["all-gather"]
    # one async pair, two compute ops (fusion + convolution) inside it
    assert ag["async_pairs"] == 1
    assert ag["pairs_with_compute"] == 1
    assert ag["median_compute_between"] == 2.0
    # payload: lhs tuple (8*128 + 16*128) bf16 = 24576*2/2^20 MB, all overlapped
    assert ag["mb"] == ag["mb_overlapped"] > 0

    cp = oc["collective-permute"]
    # back-to-back start/done: async pair with NO compute between (exposed)
    assert cp["async_pairs"] == 1
    assert cp["pairs_with_compute"] == 0
    assert cp["mb_overlapped"] == 0.0

    ar = oc["all-reduce"]
    # synchronous (no -start form)
    assert ar["sync_instances"] == 1
    assert ar["async_pairs"] == 0


def test_overlap_census_empty_module():
    assert overlap_census("ENTRY %e () -> f32[] {\n  ROOT %c = f32[] constant(0)\n}\n") == {}
