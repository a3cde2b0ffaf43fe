"""End-to-end test of the duty-cycle measurement core
(tools/bench_pipeline.live_segment): real worker decode concurrent
with a jitted train step on the CPU backend, warmed decode probe,
replay segment, and the field contract bench.py merges into the
driver line."""

import os.path as osp

import pytest

pytestmark = pytest.mark.slow  # builds videos + compiles a model


def test_live_segment_fields(tmp_path):
    from avion_tpu.data.video_reader import native_available
    from avion_tpu.tools.bench_pipeline import live_segment

    if not native_available():
        pytest.skip("native decode library unavailable")
    try:
        seg = live_segment(model_name="CLIP_TINY", batch=8, steps=3,
                           workers=1, clip_length=2, crop_size=32,
                           root=str(tmp_path), videos=2, replay=True)
    except Exception as e:  # pragma: no cover - encoder-less hosts
        if "encoder" in str(e).lower():
            pytest.skip(f"video encoder unavailable: {e}")
        raise
    # the exact field set bench.py reads (bench.py live-merge block)
    assert {"e2e_clips_per_sec", "duty_cycle", "data_stall_ms",
            "step_time_s", "live_batch", "live_steps", "host_cores",
            "loss", "decode_clips_per_sec_per_core",
            "replay_pre_decoded"} <= set(seg)
    assert seg["live_batch"] == 8 and seg["live_steps"] == 3
    assert 0.0 <= seg["duty_cycle"] <= 1.0
    assert seg["e2e_clips_per_sec"] > 0
    assert seg["decode_clips_per_sec_per_core"] > 0
    rp = seg["replay_pre_decoded"]
    assert 0.0 <= rp["duty_cycle"] <= 1.0
    assert rp["clips_per_sec"] > 0
    # the dataset dir is reusable across runs (bench.py passes a
    # fixed --root so retries skip regeneration)
    assert osp.exists(osp.join(str(tmp_path), "meta.pkl"))
