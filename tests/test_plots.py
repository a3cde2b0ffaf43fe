"""Tests for tools/plots.py (consolidated second_party plot scripts)."""

import csv
import json
import os.path as osp
import pickle

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from avion_tpu.tools.plots import (
    load_segment_lengths,
    main,
    relative_improvements,
    segment_lengths_from_rows,
)


def test_segment_lengths_row_formats():
    four = [("v", 1.0, 3.5, "c"), ("v", 0.0, 1.0, "c")]
    five = [("u", "v", 1.0, 3.5, "c")]
    assert segment_lengths_from_rows(four) == [2.5, 1.0]
    assert segment_lengths_from_rows(five) == [2.5]
    assert segment_lengths_from_rows([]) == []


def test_load_segment_lengths_inputs(tmp_path):
    pklp = str(tmp_path / "m.pkl")
    pickle.dump([("v", 0.0, 2.0, "c")], open(pklp, "wb"))
    assert load_segment_lengths(pklp) == [2.0]

    jp = str(tmp_path / "r.jsonl")
    with open(jp, "w") as f:
        f.write(json.dumps({"model_output": {"start": 1.0, "end": 4.0}}) + "\n")
        f.write(json.dumps({"model_output": {"start": 5.0, "end": 2.0}}) + "\n")
        f.write(json.dumps({"other": 1}) + "\n")
        f.write("not json\n")
    assert load_segment_lengths(jp) == [3.0]

    cp = str(tmp_path / "m.csv")
    with open(cp, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["uuid", "video_id", "start_s",
                                          "end_s", "caption"])
        w.writeheader()
        w.writerow({"uuid": "u", "video_id": "v", "start_s": 1.5,
                    "end_s": 4.0, "caption": "c"})
    assert load_segment_lengths(cp) == [2.5]


def test_relative_improvements():
    rows = [
        {"run_name": "base", "a": "10", "b": "20"},
        {"run_name": "x", "a": "12", "b": "19"},
    ]
    imps = relative_improvements(rows, "base", ["a", "b"])
    assert imps["x"]["a"] == 2.0 and imps["x"]["b"] == -1.0
    assert imps["x"]["mean"] == pytest.approx(0.5)
    with pytest.raises(ValueError):
        relative_improvements(rows, "missing", ["a"])


def test_cli_end_to_end(tmp_path, capsys):
    pkl_a = str(tmp_path / "a.pkl")
    pkl_b = str(tmp_path / "b.pkl")
    r = np.random.RandomState(0)
    pickle.dump([("v", 0.0, float(d), "c") for d in r.rand(50) * 10],
                open(pkl_a, "wb"))
    pickle.dump([("u", "v", 0.0, float(d), "c") for d in r.rand(30) * 5],
                open(pkl_b, "wb"))

    out1 = str(tmp_path / "seg.png")
    assert main(["segments", "--input", pkl_a, "--out", out1,
                 "--log-scale"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["count"] == 50 and osp.exists(out1)

    out2 = str(tmp_path / "cmp.png")
    assert main(["compare", "--input", pkl_a, "--input", pkl_b,
                 "--out", out2]) == 0
    assert "cmp.png" in capsys.readouterr().out
    assert osp.exists(out2)

    cp = str(tmp_path / "peaks.csv")
    with open(cp, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["run_name", "m1", "m2"])
        w.writeheader()
        w.writerow({"run_name": "base", "m1": 1.0, "m2": 2.0})
        w.writerow({"run_name": "better", "m1": 2.0, "m2": 2.5})
    out3 = str(tmp_path / "imp.png")
    assert main(["improvement", "--input", cp, "--baseline", "base",
                 "--out", out3]) == 0
    imps = json.loads(capsys.readouterr().out)
    assert imps["better"]["m1"] == 1.0 and osp.exists(out3)
