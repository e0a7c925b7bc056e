"""bytes_budget.py HLO-traffic parser: accounting rules on a synthetic
optimized-HLO fragment (the real tool runs on the TPU-compiled step)."""

import os
import sys
import textwrap

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from bytes_budget import (parse_entry_traffic, shape_bytes,  # noqa: E402
                          shape_bytes_physical)

HLO = textwrap.dedent("""\
    HloModule jit_step

    %helper (a: f32[8]) -> f32[8] {
      ROOT %x = f32[8]{0} add(%a, %a)
    }

    ENTRY %main (p0: f32[512,128]) -> f32[512,128] {
      %p0 = f32[512,128]{1,0:T(8,128)} parameter(0)
      %fusion.1 = f32[512,128]{1,0:T(8,128)} fusion(%p0), kind=kLoop, metadata={op_name="jit(step)/mul" source_file="/repo/a.py" source_line=10}
      %copy-start = (f32[512,128]{1,0:T(8,128)S(1)}, f32[512,128]{1,0:T(8,128)}, u32[]{:S(2)}) copy-start(%p0), cross_program_prefetch_index=0
      %copy-done = f32[512,128]{1,0:T(8,128)S(1)} copy-done(%copy-start)
      %slice-start.7 = (f32[4096,128]{1,0:T(8,128)}, f32[256,128]{1,0:T(8,128)}, u32[]{:S(2)}) slice-start(%fusion.1)
      %slice-done.7 = f32[256,128]{1,0:T(8,128)} slice-done(%slice-start.7)
      %narrow = f32[512,7]{1,0:T(8,128)} fusion(%fusion.1), kind=kLoop, metadata={op_name="jit(step)/narrow" source_file="/repo/b.py" source_line=20}
      ROOT %out = f32[512,128]{1,0:T(8,128)} add(%fusion.1, %copy-done)
    }
    """)


def test_parser_accounting_rules():
    rows = parse_entry_traffic(HLO)
    by_name = {r[3]: r for r in rows}

    # fusion: result + operand = 2 * 512*128*4
    fus = [r for r in rows if r[3] == "a.py:10"]
    assert len(fus) == 1 and fus[0][0] == 2 * 512 * 128 * 4

    # copy-start (cross-program prefetch) skipped; copy-done counted once
    assert not any(r[1] == "copy-start" for r in rows)
    cd = [r for r in rows if r[1] == "copy-done"]
    assert len(cd) == 1 and cd[0][0] == 512 * 128 * 4

    # slice-start counts 2x the SLICED size (256 rows), not the 4096 source
    ss = [r for r in rows if r[1] == "slice-start"]
    assert len(ss) == 1 and ss[0][0] == 2 * 256 * 128 * 4
    assert not any(r[1] == "slice-done" for r in rows)

    # helper computation (outside ENTRY) and parameters not counted
    assert "?" not in by_name or by_name["?"][1] != "parameter"

    # ROOT add: result + 2 operands
    root = [r for r in rows if r[1] == "add"]
    assert len(root) == 1 and root[0][0] == 3 * 512 * 128 * 4

    # instruction NAME rides along as the trace-join key (element 5)
    assert root[0][5] == "out"
    assert {r[5] for r in rows} >= {"fusion.1", "narrow", "out"}


def test_physical_padding_model():
    # [512, 7] f32 pads lanes 7 -> 128 (18.3x)
    assert shape_bytes("f32", "512,7") == 512 * 7 * 4
    assert shape_bytes_physical("f32", "512,7") == 512 * 128 * 4
    # bf16 sublane tile is 16
    assert shape_bytes_physical("bf16", "9,128") == 16 * 128 * 2
    # already aligned: no inflation
    assert shape_bytes_physical("f32", "512,128") == 512 * 128 * 4

    rows = parse_entry_traffic(HLO)
    narrow = [r for r in rows if r[3] == "b.py:20"][0]
    # logical: [512,7] out + [512,128] in; physical pads the output lanes
    assert narrow[0] == 512 * 7 * 4 + 512 * 128 * 4
    assert narrow[4] == 2 * 512 * 128 * 4
