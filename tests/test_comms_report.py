"""GSPMD collective-traffic accounting (parallel/comms_report.py) —
SURVEY §2.6 scaling-evidence tooling (round-4 verdict, missing #4).

The HLO parser is unit-tested on synthetic text; the compile path is
exercised at a tiny grid over the 8-virtual-device CPU mesh and acts as
a regression guard on the data-parallel design: per-step collective
traffic must stay O(param bytes) — a batch-dependent term appearing
there would mean GSPMD started resharding the ray batch mid-step."""

import numpy as np

from iris_tpu.parallel.comms_report import (
    CollectiveOp, collectives_from_hlo, report, ring_allreduce_seconds,
)


def test_hlo_parser_shapes_and_kinds():
    txt = """
  HloModule jit_step
  %ar = f32[4194304,8]{1,0} all-reduce(f32[4194304,8]{1,0} %g), replica_groups={{0,1,2,3,4,5,6,7}}
  %ag.1 = (f32[1024]{0}, f32[2048]{0}) all-gather-start(f32[128]{0} %x), dimensions={0}
  %ag.2 = f32[1024]{0} all-gather-done((f32[1024]{0}) %ag.1)
  %cp = bf16[256,128]{1,0} collective-permute(bf16[256,128]{1,0} %y), source_target_pairs={{0,1}}
  %rs = f32[524288]{0} reduce-scatter(f32[4194304]{0} %z), dimensions={0}
  %not_a_collective = f32[8]{0} add(f32[8]{0} %a, f32[8]{0} %b)
    """
    ops = collectives_from_hlo(txt)
    kinds = sorted(o.kind for o in ops)
    assert kinds == ["all-gather", "all-reduce", "collective-permute",
                     "reduce-scatter"]
    by = {o.kind: o.bytes for o in ops}
    assert by["all-reduce"] == 4194304 * 8 * 4
    assert by["all-gather"] == (1024 + 2048) * 4   # start carries shapes
    assert by["collective-permute"] == 256 * 128 * 2
    assert by["reduce-scatter"] == 524288 * 4


def test_ring_model():
    # 8-way ring all-reduce of 1 GB at 100 GB/s: 2*(7/8)*1e9/1e11 s
    t = ring_allreduce_seconds(1e9, 8, 100e9)
    assert np.isclose(t, 2 * 7 / 8 * 1e-2)


def test_report_traffic_is_param_bound():
    r = report(n_devices=8, hash_levels=4, hash_features=4, log2_table=8)
    assert r["collective_ops"] > 0
    # data-parallel contract: total per-step collective bytes stay within
    # a small multiple of the trainable-param footprint (reduce-scatter +
    # all-gather of params/updates ~ 2x worst case, plus scalar psums)
    assert r["collective_bytes_total"] <= 4 * r["param_bytes"] + (1 << 16)
    # and are nonzero (the grad psum exists)
    assert r["collective_bytes_total"] > 0
