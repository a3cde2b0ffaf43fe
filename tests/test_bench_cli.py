"""CI smoke for the driver-facing bench.py CLI (no device needed):
locks the --model flag semantics, per-geometry remat policy choice,
and the progressive-JSON-line output contract the driver parses (the
LAST line wins; an early flagship line survives any later kill)."""

import importlib.util
import json
import os
import os.path as osp
import signal
import subprocess
import sys
import time


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_cli_test", osp.join(osp.dirname(osp.dirname(
            osp.abspath(__file__))), "bench.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_bench_main_contract(capsys, monkeypatch, tmp_path):
    bench = _load_bench()
    calls = []

    def fake_bench_batch(batch, warmup=3, iters=20,
                         remat_policy="save_attn",
                         model_name="CLIP_VITB16", accum=1,
                         loss_type="clip"):
        calls.append((batch, remat_policy, model_name, accum, loss_type))
        return 200.0, 1.0

    monkeypatch.setattr(bench, "bench_batch", fake_bench_batch)

    # fake the live duty segment (now a retried SUBPROCESS of
    # tools/bench_pipeline) + the videomae extra row (the real ones
    # build datasets and compile models — not for a CI smoke)
    import avion_tpu.tools.bench_videomae as bv

    live_json = json.dumps({
        "metric": "pipeline_clips_per_sec_e2e", "value": 21.0,
        "duty_cycle": 0.105, "data_time_s": 2.713, "step_time_s": 0.319,
        "decode_clips_per_sec_per_core": 23.1, "host_cores": 1,
        "live_batch": 64, "loss": 4.1,
        "echoed": {"echo_factor": 8, "clips_per_sec": 178.3,
                   "duty_cycle": 0.9999, "data_time_s": 0.0,
                   "step_time_s": 0.36},
        "replay_pre_decoded": {"clips_per_sec": 180.0, "duty_cycle": 0.91,
                               "data_time_s": 0.1, "step_time_s": 1.0}})

    class _FakeCompleted:
        returncode = 0
        stdout = (live_json + "\n").encode()
        stderr = b"[probe] fused decode: 23.1 clips/s/core\n"

    def fake_run(cmd, capture_output=True, timeout=None):
        assert any("bench_pipeline" in str(c) for c in cmd)
        assert "--replay" in cmd
        assert "--echo-also" in cmd
        return _FakeCompleted()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bv, "bench", lambda b, model_name=None: 353.6)
    extra_path = tmp_path / "BENCH_EXTRA.json"
    monkeypatch.setenv("AVION_BENCH_EXTRA_PATH", str(extra_path))

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
    # the MEASURED live duty fields ride in the same driver line
    assert row["duty_cycle"] == 0.105
    assert row["e2e_clips_per_sec"] == 21.0
    assert row["data_stall_ms"] == 2713.0
    assert row["replay_duty_cycle"] == 0.91
    assert row["echo_duty_cycle"] == 0.9999
    assert row["echo_clips_per_sec"] == 178.3
    assert row["echo_factor"] == 8
    # secondary rows (videomae + vitl) land in BENCH_EXTRA, not stdout
    extra_rows = [json.loads(line)
                  for line in extra_path.read_text().splitlines()]
    assert extra_rows[0]["metric"] == \
        "clips_per_sec_per_chip_videomae_vitb16_h128_b128"
    assert extra_rows[0]["value"] == 353.6
    assert any(r["metric"].startswith("clips_per_sec_per_chip_vitl14_h128")
               for r in extra_rows[1:])
    # output contract: EVERY stdout json line is parseable (the driver
    # takes the last one).  Line 1 is the pre-ladder sentinel (survives
    # even a wedged-tunnel hang), line 2 the bare flagship record
    # printed before the live/parity segments — a kill at any later
    # point still leaves a valid record
    json_lines = [ln for ln in out if ln.startswith("{")]
    assert len(json_lines) >= 3
    sentinel = json.loads(json_lines[0])
    assert sentinel["status"] == "startup_sentinel"
    assert sentinel["value"] == 0.0
    first = json.loads(json_lines[1])
    assert first["metric"] == row["metric"]
    assert first["value"] == row["value"]
    assert "duty_cycle" not in first and "parity_metric" not in first
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


def test_bench_deadline_skips_segments(capsys, monkeypatch, tmp_path):
    """With the budget already exhausted, bench.py still prints the
    flagship line (the driver's minimum record) and skips live duty,
    parity, and both extras."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "bench_batch",
                        lambda *a, **k: (200.0, 1.0))

    def boom(*a, **k):
        raise AssertionError("live duty subprocess must not run")

    monkeypatch.setattr(bench.subprocess, "run", boom)
    extra_path = tmp_path / "BENCH_EXTRA.json"
    monkeypatch.setenv("AVION_BENCH_EXTRA_PATH", str(extra_path))
    monkeypatch.setenv("AVION_BENCH_DEADLINE_S", "0")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    cap = capsys.readouterr()
    json_lines = [ln for ln in cap.out.strip().splitlines()
                  if ln.startswith("{")]
    assert len(json_lines) == 2  # sentinel + flagship, nothing else
    assert json.loads(json_lines[0])["status"] == "startup_sentinel"
    row = json.loads(json_lines[-1])
    assert row["metric"] == \
        "clips_per_sec_per_chip_clip_vitb16_h128_pretrain_b256"
    assert "duty_cycle" not in row and "parity_metric" not in row
    assert not extra_path.exists()


def test_bench_killed_midrun_leaves_parseable_line(tmp_path):
    """Simulate the r4 failure: the driver kills bench.py while a later
    segment (here: a hung live-duty subprocess) is still running.  The
    flagship JSON line must already be on stdout."""
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    driver = tmp_path / "driver.py"
    driver.write_text(f"""
import importlib.util, sys, time
spec = importlib.util.spec_from_file_location(
    "bench_kill_test", {json.dumps(osp.join(repo, "bench.py"))})
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
bench.bench_batch = lambda *a, **k: (200.0, 1.0)
bench.wait_for_chip = lambda *a, **k: True


def hang(*a, **k):
    time.sleep(600)


bench.subprocess.run = hang
sys.argv = ["bench.py"]
bench.main()
""")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo,
               AVION_BENCH_EXTRA_PATH=str(tmp_path / "extra.json"))
    p = subprocess.Popen([sys.executable, str(driver)], cwd=repo,
                         stdout=subprocess.PIPE, env=env)
    try:
        # sentinel then flagship must arrive while the live segment
        # hangs; both flushed line-by-line
        rows = []
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline and len(rows) < 2:
            line = p.stdout.readline()
            if line.strip():
                rows.append(json.loads(line))
        assert rows[0]["status"] == "startup_sentinel"
        assert rows[1]["metric"] == \
            "clips_per_sec_per_chip_clip_vitb16_h128_pretrain_b256"
        assert rows[1]["value"] == 200.0
    finally:
        p.send_signal(signal.SIGKILL)
        p.wait()


def test_extras_merge_with_previous_rows(capsys, monkeypatch, tmp_path):
    """A later (possibly degraded) run updates only the rows it
    measured; prior canaries survive."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "bench_batch", lambda *a, **k: (75.0, 1.0))
    monkeypatch.setattr(bench.subprocess, "run",
                        lambda *a, **k: (_ for _ in ()).throw(
                            __import__("subprocess").TimeoutExpired("x", 1)))
    import avion_tpu.tools.bench_videomae as bv

    monkeypatch.setattr(bv, "bench", lambda b, model_name=None: 111.1)
    extra_path = tmp_path / "BENCH_EXTRA.json"
    extra_path.write_text(json.dumps({
        "metric": "clips_per_sec_per_chip_legacy_canary_b32",
        "value": 50.0, "unit": "clips/s/chip", "vs_baseline": 3.0}) + "\n")
    monkeypatch.setenv("AVION_BENCH_EXTRA_PATH", str(extra_path))
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    rows = {json.loads(l)["metric"]: json.loads(l)
            for l in extra_path.read_text().splitlines()}
    # this run's rows were (re)measured; the prior unrelated canary
    # persists instead of being erased by the truncate-write
    assert rows["clips_per_sec_per_chip_videomae_vitb16_h128_b128"][
        "value"] == 111.1
    assert rows["clips_per_sec_per_chip_legacy_canary_b32"]["value"] == 50.0


def test_bench_unreachable_chip_exits_with_sentinel(capsys, monkeypatch):
    """A chip that never becomes healthy must not reach the ladder
    (blocked RPCs hang unkillably): bench retries within the budget,
    then exits cleanly with the sentinel as the record."""
    bench = _load_bench()
    waits = []

    class FakeTime:  # real wait_for_chip consumes its window; the
        t = 0.0      # fake must advance the module clock the same way

        def monotonic(self):
            return self.t

        def perf_counter(self):
            return self.t

    clock = FakeTime()
    monkeypatch.setattr(bench, "time", clock)

    def fake_wait(max_wait_s=0.0, **k):
        waits.append(max_wait_s)
        clock.t += max_wait_s
        return False

    monkeypatch.setattr(bench, "wait_for_chip", fake_wait)
    monkeypatch.setattr(bench, "bench_batch",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("ladder must not run")))
    # selfcheck is an in-process chip touch too: must stay behind the
    # health gate
    monkeypatch.setattr(bench, "selfcheck",
                        lambda: (_ for _ in ()).throw(
                            AssertionError("selfcheck must not run")))
    monkeypatch.setenv("AVION_BENCH_DEADLINE_S", "500")
    monkeypatch.delenv("AVION_BENCH_MAX_WAIT_S", raising=False)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--selfcheck"])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(l) for l in out if l.startswith("{")]
    assert len(rows) == 1
    assert rows[0]["status"] == "chip_unreachable"
    assert rows[0]["value"] == 0.0
    assert len(waits) >= 2  # kept retrying with the remaining budget
