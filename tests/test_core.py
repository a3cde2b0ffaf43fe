import json
import os
import time

import jax.numpy as jnp
import numpy as np
import pytest

from avion_tpu.core.config import TrainConfig, load_dotenv
from avion_tpu.core.logging import MetricLogger
from avion_tpu.core.meters import AverageMeter, ProgressMeter, StepTimer
from avion_tpu.core.policy import get_policy


def test_config_overrides_and_roundtrip():
    cfg = TrainConfig()
    cfg.apply_overrides([
        "model.name=CLIP_VITL14",
        "data.batch_size=512",
        "optim.lr=0.001",
        "optim.betas=0.9,0.95",
        "optim.grad_clip_norm=none",
        "mesh.fsdp=4",
        "wandb=true",
    ])
    assert cfg.model.name == "CLIP_VITL14"
    assert cfg.data.batch_size == 512
    assert cfg.optim.lr == 0.001
    assert cfg.optim.betas == (0.9, 0.95)
    assert cfg.optim.grad_clip_norm is None
    assert cfg.mesh.fsdp == 4
    assert cfg.wandb is True

    d = cfg.to_dict()
    cfg2 = TrainConfig.from_dict(d)
    assert cfg2.model.name == "CLIP_VITL14"
    assert cfg2.optim.betas == (0.9, 0.95)
    assert cfg2.mesh.fsdp == 4


def test_config_unknown_key_raises():
    with pytest.raises(ValueError):
        TrainConfig().apply_overrides(["model.nope=1"])
    with pytest.raises(ValueError):
        TrainConfig().apply_overrides(["badtoken"])


def test_policy():
    p = get_policy("bf16")
    assert p.compute_dtype == jnp.bfloat16
    assert p.param_dtype == jnp.float32
    assert get_policy("fp32").compute_dtype == jnp.float32
    with pytest.raises(ValueError):
        get_policy("fp8")


def test_meters():
    m = AverageMeter("x", ":.2f")
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    assert "x" in str(m)

    t = StepTimer()
    time.sleep(0.01)
    t.mark_data()
    time.sleep(0.02)
    t.mark_step()
    assert t.step_time.avg > t.data_time.avg * 0.5
    assert 0 < t.duty_cycle <= 1.0
    stats = t.stats()
    # cumulative keys always present; *_win keys appear once a window
    # has been closed by mark_window
    assert {"data_time", "step_time", "batch_time",
            "duty_cycle"} <= set(stats)


def test_metric_logger_jsonl(tmp_path):
    logger = MetricLogger(str(tmp_path), use_wandb=False)
    logger.log({"loss": 1.5, "acc": np.float32(2.0)}, step=3)
    logger.log({"loss": 1.0}, step=4)
    logger.finish()
    lines = [json.loads(l) for l in open(tmp_path / "log.jsonl")]
    assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 3
    assert lines[1]["step"] == 4


def test_load_dotenv(tmp_path, monkeypatch):
    envfile = tmp_path / ".env"
    envfile.write_text("MY_TEST_ROOT=/data/x\n# comment\nQUOTED='abc'\n")
    monkeypatch.delenv("MY_TEST_ROOT", raising=False)
    loaded = load_dotenv(str(envfile))
    assert loaded["MY_TEST_ROOT"] == "/data/x"
    assert os.environ["MY_TEST_ROOT"] == "/data/x"
    assert loaded["QUOTED"] == "abc"
    # does not clobber existing env
    os.environ["MY_TEST_ROOT"] = "/keep"
    load_dotenv(str(envfile))
    assert os.environ["MY_TEST_ROOT"] == "/keep"


def test_steptimer_first_window_counts():
    """The first mark_window must produce step/batch samples (it used
    to be silently dropped because the window start was unset)."""
    import time

    from avion_tpu.core.meters import StepTimer

    t = StepTimer()
    time.sleep(0.02)
    t.data_time.update(0.005)
    t.mark_window(2)
    s = t.stats()
    assert s["batch_time"] > 0
    assert s["step_time"] > 0
    assert 0 < s["duty_cycle"] <= 1.0
    # window view: last closed window only (steady-state duty, no
    # compile pollution from earlier windows)
    assert 0 < s["duty_cycle_win"] <= 1.0
    assert s["batch_time_win"] > 0
    assert abs(s["step_time_win"] + s["data_time_win"]
               - s["batch_time_win"]) < 1e-6


def test_profiling_helpers_smoke(tmp_path):
    """trace/annotate/wallclock run on the CPU backend and capture a
    device trace directory."""
    import glob

    import jax.numpy as jnp

    from avion_tpu.core.profiling import annotate, trace, wallclock

    logs = []
    with wallclock("unit", sink=logs.append):
        with trace(str(tmp_path)):
            with annotate("matmul"):
                x = jnp.ones((64, 64))
                (x @ x).block_until_ready()
    assert logs and logs[0].startswith("[unit]")
    assert glob.glob(str(tmp_path) + "/**/*.pb", recursive=True) or \
        glob.glob(str(tmp_path) + "/**/*.json.gz", recursive=True)


def test_step_timer_partial_window_accounting():
    """mark_window(n) must be called with the ACTUAL number of steps in
    the window (the bench loops pass n - last_marked): a 12-step run
    marked as 5+5+2 yields 12 batch_time samples whose total equals the
    wall time, with the partial window weighted by its true length."""
    import time as _t

    from avion_tpu.core.meters import StepTimer

    timer = StepTimer()
    t0 = _t.perf_counter()
    marked = 0
    for n in range(1, 13):
        _t.sleep(0.004)
        if n % 5 == 0 or n == 12:
            timer.mark_window(n - marked)
            marked = n
    wall = _t.perf_counter() - t0
    assert timer.batch_time.count == 12
    total = timer.batch_time.sum
    assert abs(total - wall) < 0.02, (total, wall)
    # per-step time is ~uniform: the 2-step window must not be spread
    # over 5 phantom steps (which would drop its per-step average ~2.5x)
    assert timer.batch_time.avg > 0.003
