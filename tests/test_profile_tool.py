"""profile_step trace analysis on a synthetic chrome trace."""

import gzip
import json
import os

from avion_tpu.tools.profile_step import analyze_trace


def test_analyze_trace_aggregates_device_ops(tmp_path):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    os.makedirs(d)
    evs = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        # two steps of the same fusion (fwd, vision)
        {"ph": "X", "pid": 3, "name": "fusion.1", "dur": 2000, "ts": 0,
         "args": {"tf_op": "jit(step)/jvp(CLIP)/CLIP.encode_image/visual/mlp/dot_general:"}},
        {"ph": "X", "pid": 3, "name": "fusion.1", "dur": 2000, "ts": 9000,
         "args": {"tf_op": "jit(step)/jvp(CLIP)/CLIP.encode_image/visual/mlp/dot_general:"}},
        # bwd pad
        {"ph": "X", "pid": 3, "name": "pad.5", "dur": 1000, "ts": 1,
         "args": {"tf_op": "jit(step)/transpose(jvp(CLIP))/visual/x:"}},
        {"ph": "X", "pid": 3, "name": "pad.6", "dur": 1000, "ts": 2,
         "args": {"tf_op": "jit(step)/transpose(jvp(CLIP))/visual/x:"}},
        # envelope + host events must be ignored
        {"ph": "X", "pid": 3, "name": "jit_step", "dur": 99999, "ts": 0},
        {"ph": "X", "pid": 3, "name": "7", "dur": 99999, "ts": 0},
        {"ph": "X", "pid": 7, "name": "fusion.9", "dur": 99999, "ts": 0},
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": evs}, f)

    rows, total = analyze_trace(str(tmp_path), top=10, steps=2)
    assert abs(total - 3.0) < 1e-6  # (2*2ms + 2*1ms) / 2 steps
    kinds = {(r[2], r[4]): r[0] for r in rows}
    assert abs(kinds[("fusion", "fwd")] - 2.0) < 1e-6
    assert abs(kinds[("pad", "bwd")] - 1.0) < 1e-6
