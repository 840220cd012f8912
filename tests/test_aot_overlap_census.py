"""Pin the scheduled-HLO overlap parser of scripts/aot_v5e8_real.py.

The parser turns a compiled (scheduled) TPU module's text into async-overlap
evidence: collective `*-start`/`*-done` pairs, whether compute instructions
are scheduled between them (those run while the transfer is in flight), and
payload bytes. Pure text processing — pinned here on a synthetic module in
the REAL v5e compiler's output format (tiled layout annotations like
`T(8,128)(2,1)S(1)` whose parens must not be mistaken for opcodes; async
start tuples `(in, out, u32[], u32[])`; done-operands that themselves
contain the opcode name) so a jax/HLO-format drift breaks loudly instead of
silently zeroing the MULTICHIP_AOT_V5E8 numbers — exactly what the first
parser version did on all 705 collective-permute pairs of the real module.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from aot_v5e8_real import overlap_census  # noqa: E402

HLO = """\
HloModule jit_step, is_scheduled=true

%fused_computation (p0: bf16[1024,1024]) -> bf16[1024,1024] {
  %p0 = bf16[1024,1024]{1,0:T(8,128)(2,1)} parameter(0)
  ROOT %add = bf16[1024,1024]{1,0:T(8,128)(2,1)} add(%p0, %p0)
}

ENTRY %main (a: bf16[1024,1024], b: f32[256,1024]) -> bf16[1024,1024] {
  %a = bf16[1024,1024]{1,0:T(8,128)(2,1)} parameter(0)
  %b = f32[256,1024]{1,0:T(8,128)} parameter(1)
  %all-gather-start = (bf16[1024,1024]{1,0:T(8,128)(2,1)S(1)}, bf16[2048,1024]{1,0:T(8,128)(2,1)S(1)}, u32[]{:S(2)}, u32[]{:S(2)}) all-gather-start(%a), dimensions={0}, backend_config={"barrier_config":{"barrier_type":"CUSTOM","id":"3"}}
  %f1 = bf16[1024,1024]{1,0:T(8,128)(2,1)} fusion(%a), kind=kLoop, calls=%fused_computation
  %conv = bf16[1024,1024]{1,0:T(8,128)(2,1)} convolution(%f1, %f1), window={size=1}
  %all-gather-done = bf16[2048,1024]{1,0:T(8,128)(2,1)} all-gather-done(%all-gather-start), metadata={op_name="jit(step)/decode/conv_general_dilated" stack_frame_id=910}
  %collective-permute-start = (f32[256,1024]{1,0:T(8,128)S(1)}, f32[256,1024]{1,0:T(8,128)S(1)}, u32[]{:S(2)}, u32[]{:S(2)}) collective-permute-start(%b), channel_id=2, source_target_pairs={{0,1},{1,2}}
  %collective-permute-done = f32[256,1024]{1,0:T(8,128)} collective-permute-done(%collective-permute-start)
  %ar = f32[256,1024]{1,0:T(8,128)} all-reduce(%b), to_apply=%fused_computation
  ROOT %out = bf16[1024,1024]{1,0:T(8,128)(2,1)} fusion(%f1), kind=kLoop, calls=%fused_computation
}
"""


def test_overlap_census_real_format():
    oc = overlap_census(HLO)
    ag = oc["all-gather"]
    # one async pair, two compute ops (fusion + convolution) inside it
    assert ag["async_pairs"] == 1
    assert ag["pairs_with_compute"] == 1
    assert ag["median_compute_between"] == 2.0
    # payload = largest lhs tensor: bf16[2048,1024] = 4.0 MB, all overlapped
    assert ag["mb"] == ag["mb_overlapped"] == 4.0

    cp = oc["collective-permute"]
    # back-to-back start/done: async pair with NO compute between (exposed);
    # payload = f32[256,1024] = 1.0 MB
    assert cp["async_pairs"] == 1
    assert cp["pairs_with_compute"] == 0
    assert cp["mb"] == 1.0
    assert cp["mb_overlapped"] == 0.0

    ar = oc["all-reduce"]
    # synchronous (no -start form)
    assert ar["sync_instances"] == 1
    assert ar["async_pairs"] == 0
    assert ar["mb"] == 1.0


def test_overlap_census_empty_module():
    assert overlap_census("ENTRY %e () -> f32[] {\n  ROOT %c = f32[] constant(0)\n}\n") == {}
