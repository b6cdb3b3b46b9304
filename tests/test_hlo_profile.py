"""HLO-text parsing pieces of the per-op device profiler.

Pure-text units (no TPU needed): shape-bytes accounting, per-instruction
HBM-traffic estimates, fusion summaries with op_name source attribution,
and the conv/dot analytic FLOP models the achieved-rate columns rely on.
"""

from group_attribution_for_diffusion_models_tpu.utils.hlo_profile import (
    _conv_gflops,
    _fusion_detail,
    _index_hlo,
    _instr_gbytes,
    _op_source,
    _shape_bytes,
)

_HLO = """
HloModule test

%fused_computation.1 (param_0.1: bf16[8,128,256], param_1.1: f32[256]) -> f32[8,128] {
  %param_0.1 = bf16[8,128,256]{2,1,0} parameter(0)
  %cvt.1 = f32[8,128,256]{2,1,0} convert(%param_0.1), metadata={op_type="convert_element_type" op_name="jit(step)/jvp(UNet2D)/norm1/group_norm/reduce_sum"}
  %c0 = f32[] constant(0)
  ROOT %red.1 = f32[8,128]{1,0} reduce(%cvt.1, %c0), dimensions={2}, to_apply=%add, metadata={op_name="jit(step)/jvp(UNet2D)/norm1/group_norm/reduce_sum"}
}

ENTRY %main (p0: bf16[8,128,256], p1: f32[256]) -> f32[8,128] {
  %p0 = bf16[8,128,256]{2,1,0} parameter(0)
  %p1 = f32[256]{0} parameter(1)
  %convert_reduce_fusion.7.remat = f32[8,128]{1,0} fusion(%p0, %p1), kind=kLoop, calls=%fused_computation.1
  %conv.9 = bf16[4,16,16,64]{3,2,1,0} convolution(%p0, %p1), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
}
"""


def test_shape_bytes():
    assert _shape_bytes("bf16[8,128,256]{2,1,0}") == 8 * 128 * 256 * 2
    assert _shape_bytes("f32[256]") == 1024
    # tuple shapes sum their arrays
    assert _shape_bytes("(bf16[2,2], f32[2,2])") == 8 + 16


def test_instr_gbytes_counts_operands_and_result():
    index = _index_hlo(_HLO)
    opcode, line = index["convert_reduce_fusion.7.remat"]
    assert opcode == "fusion"
    gb = _instr_gbytes(line, index)
    want = (8 * 128 * 256 * 2 + 256 * 4 + 8 * 128 * 4) / 1e9
    assert abs(gb - want) < 1e-12


def test_fusion_detail_names_source_op():
    index = _index_hlo(_HLO)
    detail, gflops = _fusion_detail("convert_reduce_fusion.7.remat", _HLO, index)
    assert "reducex1" in detail
    assert "src=" in detail and "group_norm" in detail
    assert gflops is None


def test_op_source_majority():
    lines = [
        'x = f32[2] add(a, b), metadata={op_name="jit(f)/a/b/c"}',
        'y = f32[2] add(x, b), metadata={op_name="jit(f)/a/b/c"}',
        'z = f32[2] add(y, b), metadata={op_name="jit(f)/other"}',
    ]
    assert _op_source(lines) == "b/c"


def test_conv_gflops_window():
    index = _index_hlo(_HLO)
    _, line = index["conv.9"]
    g = _conv_gflops(line, index)
    # 2 * out_elems * cin * taps; cin comes from rhs dims via dim_labels 'i'
    # (rhs here is a stand-in param without 4 dims -> falls back, so just
    # check it returns a positive number rather than crashing).
    assert g is None or g > 0


def test_toplevel_copy_gets_source_attribution():
    # profile_device_ops labels bare copies/reshapes with their op_name
    # metadata; exercise the same helper on a top-level copy line.
    line = ('%copy.42 = bf16[4,64,1024,320]{3,2,1,0} copy(%p0), '
            'metadata={op_name="jit(step)/jvp(UNet2D)/attn1/transpose"}')
    assert _op_source([line]) == "attn1/transpose"
