"""The benchmark harnesses are tracked code (benchmarks/README.md); the
HLO-join classifier in step_itemize is the piece with real logic — it
exists precisely because name-based bucketing misclassified the round-3
profile (BASELINE.md round-4 itemization), so pin its semantics."""

from benchmarks.step_itemize import classify_hlo

_HLO = """
HloModule jit_step

%fused_computation.1 (p0: f32[8,8], p1: f32[8,8]) -> f32[8,8] {
  %p0 = f32[8,8] parameter(0)
  %p1 = f32[8,8] parameter(1)
  ROOT %dot.3 = f32[8,8] dot(%p0, %p1), lhs_contracting_dims={1}, rhs_contracting_dims={0}
}

%fused_computation.2 (p0: f32[8,8]) -> f32[8,8] {
  %p0 = f32[8,8] parameter(0)
  ROOT %add.1 = f32[8,8] add(%p0, %p0)
}

ENTRY %main (a: f32[8,8], b: f32[8,8]) -> f32[8,8] {
  %a = f32[8,8] parameter(0)
  %b = f32[8,8] parameter(1)
  %fusion.1 = f32[8,8] fusion(%a, %b), kind=kOutput, calls=%fused_computation.1
  %fusion.2 = f32[8,8] fusion(%fusion.1), kind=kLoop, calls=%fused_computation.2
  %copy.5 = f32[8,8] copy(%fusion.2)
  %custom-call.7 = f32[8,8] custom-call(%copy.5), custom_call_target="tpu_custom_call"
  ROOT %transpose.9 = f32[8,8] transpose(%custom-call.7), dimensions={1,0}
}
"""


def test_classify_hlo_buckets():
    out = classify_hlo(_HLO)
    # a fusion CONTAINING a dot is matmul even though its name says fusion
    assert out["fusion.1"] == "matmul"
    # a pure-elementwise fusion stays elementwise (the ENTRY body's
    # custom-call must NOT leak into the preceding computation's op set —
    # the exact bug the ENTRY-header regex fix covers)
    assert out["fusion.2"] == "elementwise"
    assert out["copy.5"] == "copy"
    assert out["custom-call.7"] == "pallas"
    assert out["transpose.9"] == "copy"
