"""CI smoke for the driver-facing bench.py CLI (no device needed):
locks the --model flag semantics, per-geometry remat policy choice,
and the one-JSON-line output contract the driver parses."""

import importlib.util
import json
import os.path as osp
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_cli_test", osp.join(osp.dirname(osp.dirname(
            osp.abspath(__file__))), "bench.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_bench_main_contract(capsys, monkeypatch):
    bench = _load_bench()
    calls = []

    def fake_bench_batch(batch, warmup=3, iters=20,
                         remat_policy="save_attn",
                         model_name="CLIP_VITB16", accum=1,
                         loss_type="clip"):
        calls.append((batch, remat_policy, model_name, accum, loss_type))
        return 200.0, 1.0

    monkeypatch.setattr(bench, "bench_batch", fake_bench_batch)

    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    row = json.loads(out[-1])
    # default: flagship H128 geometry headline + embedded parity row
    assert row["metric"] == \
        "clips_per_sec_per_chip_clip_vitb16_h128_pretrain_b256"
    assert set(row) >= {"value", "unit", "vs_baseline", "mfu", "step_ms"}
    assert row["parity_metric"] == \
        "clips_per_sec_per_chip_vitb16_pretrain_b256"
    assert row["parity_value"] == 200.0
    # H128 frees the lse residual: full save_attn at b256; the parity
    # geometry at b256 uses the probed k10 policy
    assert calls[0] == (256, "save_attn", "CLIP_VITB16_H128", 1, "clip")
    assert calls[1] == (256, "save_attn_k10", "CLIP_VITB16", 1, "clip")

    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--model", "CLIP_VITB16"])
    bench.main()
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # explicit --model: no second (parity) measurement run
    assert row["metric"] == "clips_per_sec_per_chip_vitb16_pretrain_b256"
    assert "parity_metric" not in row
    assert calls[-1] == (256, "save_attn_k10", "CLIP_VITB16", 1, "clip")

    # variant knobs: pinned batch + cached accumulation + siglip (no
    # second parity run for variant measurements)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--model", "CLIP_VITB16",
                                      "--batch", "512",
                                      "--accum", "2", "--loss", "siglip"])
    n_before = len(calls)
    bench.main()
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["metric"] == \
        "clips_per_sec_per_chip_vitb16_siglip_accum2_pretrain_b512"
    assert calls[-1] == (512, "save_attn", "CLIP_VITB16", 2, "siglip")
    assert len(calls) == n_before + 1


def test_bench_main_usage_error(monkeypatch):
    bench = _load_bench()
    import pytest

    monkeypatch.setattr(sys, "argv", ["bench.py", "--model"])
    with pytest.raises(SystemExit):
        bench.main()
