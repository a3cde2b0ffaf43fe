import csv
import pickle

import numpy as np
import pytest

from avion_tpu.tools.alignment_ablation import (
    augment_ego4d_pkl,
    augment_ek100_csv,
    perturb_window,
)
from avion_tpu.tools.dataset_tools import (
    dataset_statistics,
    dedup_consecutive_captions,
    hierarchical_merge,
    subset_metadata,
)
from avion_tpu.tools.narration_refinement import (
    RefineItem,
    build_refine_items,
    merge_to_train_pkl,
    refine_samples,
)
from avion_tpu.tools.refinement_eval import evaluate_refinement, interval_iou
from avion_tpu.tools.metrics_extractor import peak_metrics


def test_perturb_window_modes():
    assert perturb_window(10, 20, "add", 2) == (8, 22)
    s, e = perturb_window(10, 20, "scale", 2.0)
    assert (s, e) == (5, 25)
    assert perturb_window(10, 20, "shift", 5) == (15, 25)
    s, e = perturb_window(1, 3, "add", 5)
    assert s == 0.0  # clamped


def test_augment_pkl_roundtrip(tmp_path):
    rows = [("vid1", 5.0, 8.0, "caption a"), ("vid2", 0.5, 2.0, ["x", "y"])]
    inp = str(tmp_path / "in.pkl")
    out = str(tmp_path / "out.pkl")
    pickle.dump(rows, open(inp, "wb"))
    n = augment_ego4d_pkl(inp, out, "add", 1.0)
    assert n == 2
    new = pickle.load(open(out, "rb"))
    assert new[0][1] == 4.0 and new[0][2] == 9.0
    assert new[1][3] == ["x", "y"]


def test_augment_ek100_csv(tmp_path):
    inp = str(tmp_path / "in.csv")
    out = str(tmp_path / "out.csv")
    with open(inp, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "pid", "vid", "ts", "start", "stop", "a", "b"])
        w.writerow(["0", "P01", "P01_01", "x", "00:00:10.00",
                    "00:00:20.00", "1", "2"])
    augment_ek100_csv(inp, out, "scale", 1.5)
    rows = list(csv.reader(open(out)))
    from avion_tpu.data.metadata import datetime2sec

    assert abs(datetime2sec(rows[1][4]) - 7.5) < 0.01
    assert abs(datetime2sec(rows[1][5]) - 22.5) < 0.01


def test_refinement_pipeline(tmp_path):
    samples = [("v1", 10.0, 14.0, "opens door"), ("v2", 5.0, 6.0, "closes")]
    items = build_refine_items(samples, window_pad=5.0)
    assert items[0].window_start == 5.0

    def fake_llm(item):
        if item.vid == "v1":
            return {"start": 11.0, "end": 13.0, "caption": "opens the door"}
        return {"start": 99.0, "end": 98.0}  # inverted -> rejected

    results = refine_samples(items, fake_llm)
    assert results[0]["refined"] and results[0]["start"] == 11.0
    assert not results[1]["refined"]
    assert results[1]["start"] == 5.0  # falls back to original

    out = str(tmp_path / "train.pkl")
    n = merge_to_train_pkl(results, out)
    rows = pickle.load(open(out, "rb"))
    assert n == 2 and rows[0][1] == 11.0
    merge_to_train_pkl(results, out, variant="scaled", scale=2.0)
    rows = pickle.load(open(out, "rb"))
    assert rows[0][1] == 10.0 and rows[0][2] == 14.0  # 2s span scaled x2


def test_refinement_eval():
    refined = {"a": (0.0, 10.0), "b": (0.0, 10.0)}
    annotated = {"a": (0.0, 10.0), "b": (20.0, 30.0), "c": (0, 1)}
    out = evaluate_refinement(refined, annotated)
    assert out["n_matched"] == 2
    assert out["mean_iou"] == pytest.approx(0.5)
    assert out["recall@0.5"] == pytest.approx(0.5)
    assert interval_iou((0, 4), (2, 6)) == pytest.approx(2 / 6)


def test_refinement_scaling_analysis():
    """Windows at half the annotated width: the sweep's mIoU peak must
    land at scale 2.0 and peak_summary must recommend it."""
    from avion_tpu.tools.refinement_eval import peak_summary, scaling_analysis

    annotated = {k: (10.0, 20.0) for k in "abcd"}
    refined = {k: (12.5, 17.5) for k in "abcd"}
    sweep = scaling_analysis(refined, annotated, min_scale=0.5,
                             max_scale=3.0, step=0.25)
    assert len(sweep["scales"]) == len(sweep["mIoU"])
    best = sweep["scales"][int(np.argmax(sweep["mIoU"]))]
    assert best == pytest.approx(2.0)
    peaks = peak_summary(sweep)
    assert peaks["mIoU"]["scale"] == pytest.approx(2.0)
    assert peaks["mIoU"]["value"] == pytest.approx(1.0)
    # recall@0.5 first reaches 1.0 at scale 1.0 (IoU exactly 0.5);
    # argmax-first tie-breaking recommends that earliest peak
    assert peaks["recall@0.5"]["value"] == pytest.approx(1.0)
    assert peaks["recommended_scale"] == pytest.approx(1.0)
    # recall@0.9 is 0 at scale 0.5 (IoU=0.25) and 1 at scale 2.0
    i_half = sweep["scales"].index(0.5)
    assert sweep["recall@0.9"][i_half] == 0.0
    # duration clamp: with the video 20 s long, scale 3.0 spills past
    # the end and gets clipped (reference jitter_scale_window
    # semantics), which here matches GT better than the free window
    clamped = scaling_analysis(refined, annotated, min_scale=3.0,
                               max_scale=3.0, step=1.0,
                               durations={k: 20.0 for k in "abcd"})
    free = scaling_analysis(refined, annotated, min_scale=3.0,
                            max_scale=3.0, step=1.0)
    assert clamped["mIoU"][0] > free["mIoU"][0]


def test_subset_and_statistics(tmp_path):
    rows = [(f"v{i}", i, i + 2.0, f"cap {i}") for i in range(10)]
    inp = str(tmp_path / "m.pkl")
    pickle.dump(rows, open(inp, "wb"))
    out = str(tmp_path / "s.pkl")
    assert subset_metadata(inp, out, stride=2) == 5
    assert subset_metadata(inp, out, fraction=0.3) == 3
    stats = dataset_statistics(rows)
    assert stats["n_samples"] == 10
    assert stats["duration_mean"] == pytest.approx(2.0)


def test_compute_video_lengths(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from avion_tpu.tools.dataset_tools import compute_video_lengths

    def write(path, frames, fps=10):
        vw = cv2.VideoWriter(str(path),
                             cv2.VideoWriter_fourcc(*"mp4v"), fps, (32, 32))
        for i in range(frames):
            vw.write(np.full((32, 32, 3), i % 255, np.uint8))
        vw.release()

    root = tmp_path / "vids"
    root.mkdir()
    write(root / "flat.mp4", 40)               # 4 s
    chunked = root / "vidA.mp4"
    chunked.mkdir()
    write(chunked / "0.mp4", 20)               # 2 s
    write(chunked / "2.mp4", 10)               # 1 s
    (root / "bad.mp4").write_bytes(b"junk")    # unreadable -> 0.0
    out_json = str(tmp_path / "lengths.json")
    out = compute_video_lengths(str(root), out_json)
    assert out["flat.mp4"] == pytest.approx(4.0, abs=0.2)
    assert out["vidA.mp4"] == pytest.approx(3.0, abs=0.2)
    assert out["bad.mp4"] == 0.0
    import json as _json

    assert _json.load(open(out_json)) == out


def test_attach_and_transplant_timestamps():
    from avion_tpu.tools.dataset_tools import (
        attach_uuids,
        strip_uuid,
        transplant_timestamps,
    )

    original = [("u0", "vidA", 1.0, 2.0, "cap a"),
                ("u1", "vidB", 3.0, 4.0, "cap b")]
    rephrased = [("vidA", 1.0, 2.0, ["ra1", "ra2"]),
                 ("vidB", 3.0, 4.0, ["rb1"])]
    stamped = attach_uuids(original, rephrased)
    assert stamped == [("u0", "vidA", 1.0, 2.0, ["ra1", "ra2"]),
                       ("u1", "vidB", 3.0, 4.0, ["rb1"])]
    with pytest.raises(ValueError):
        attach_uuids(original, [("vidA", 9.0, 2.0, ["x"])])

    refined = [("u1", "vidB", 2.8, 4.4, "cap b"),
               ("u9", "vidZ", 0.0, 1.0, "zz")]
    merged = transplant_timestamps(refined, stamped)
    # u0 has no refined counterpart -> dropped; u1 gets refined window
    # with the rephrased captions
    assert merged == [("u1", "vidB", 2.8, 4.4, ["rb1"])]
    assert strip_uuid(merged) == [("vidB", 2.8, 4.4, ["rb1"])]


def test_dedup_and_hierarchical_merge():
    rows = [
        ("v1", 0.0, 2.0, "opens the drawer"),
        ("v1", 2.5, 4.0, "opens the drawer"),   # near-dup, merged
        ("v1", 10.0, 12.0, "washes hands"),
    ]
    merged = dedup_consecutive_captions(rows)
    assert len(merged) == 2
    assert merged[0][2] == 4.0

    def merge_fn(a, b):
        return f"{a}; then {b}"

    h = hierarchical_merge(rows, merge_fn, max_gap=1.0)
    assert any("then" in str(r[3]) for r in h)


def test_peak_metrics():
    records = [{"step": 1, "m": 0.5}, {"step": 2, "m": 0.9},
               {"step": 3, "m": 0.7}]
    out = peak_metrics(records, ["m"], "max")
    assert out["m"] == 0.9 and out["m_step"] == 2
    out = peak_metrics(records, ["m"], "final")
    assert out["m"] == 0.7


def test_narrator_windowing(tmp_path):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "v.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 32))
    for i in range(40):
        vw.write(np.full((32, 32, 3), i * 6, np.uint8))
    vw.release()

    calls = []

    def fake_captioner(frames):
        calls.append(frames.shape)
        return [f"caption {len(calls)}", "alt"]

    from avion_tpu.tools.narrator import narrate_dataset

    out = str(tmp_path / "narr.pkl")
    n = narrate_dataset([path], fake_captioner, out, window_sec=2.0,
                        stride_sec=2.0, clip_length=2, crop_size=32,
                        dedup_threshold=1.1)
    rows = pickle.load(open(out, "rb"))
    assert n == len(rows) == 2  # 4s video, 2s windows
    assert rows[0][0] == "v"
    assert isinstance(rows[0][3], list) and len(rows[0][3]) == 2


def test_phase2_group_captions_and_apply():
    """Phase-2 semantics (dataset_preprocessing_phase2.py): only
    temporally-overlapping consecutive pairs with similar embeddings
    merge; exact-duplicate captions are skipped (phase-1 territory)."""
    import numpy as np

    from avion_tpu.tools.dataset_tools import (apply_merge_pairs,
                                               phase2_group_captions)

    # rows: (uuid, video_id, start, end, caption)
    samples = [
        ("u1", "v1", 0.0, 2.0, "opens the drawer"),
        ("u2", "v1", 1.5, 3.0, "opens drawer"),        # overlap + similar
        ("u3", "v1", 5.0, 6.0, "cuts a tomato"),       # gap -> no pair
        ("u4", "v1", 5.8, 7.0, "washes the plate"),    # overlap, dissimilar
        ("u5", "v2", 0.0, 1.0, "pours water"),
        ("u6", "v2", 0.5, 2.0, "pours water"),         # identical -> skip
    ]

    vocab = {"opens the drawer": [1, 0, 0], "opens drawer": [0.99, 0.14, 0],
             "cuts a tomato": [0, 1, 0], "washes the plate": [0, 0, 1],
             "pours water": [0.5, 0.5, 0.5]}

    def embed(texts):
        return np.asarray([vocab[t] for t in texts], np.float32)

    pairs = phase2_group_captions(samples, embed, similarity_threshold=0.9)
    assert pairs == [("u1", "u2")]

    merged = apply_merge_pairs(samples, pairs)
    spans = {r[0]: r for r in merged}
    assert len(merged) == 5
    assert spans["u1"][2:5] == (0.0, 3.0, "opens the drawer")
    assert spans["u3"][2:4] == (5.0, 6.0)


def test_multi_response_refinement_majority_vote():
    """N sampled refinements merge by IoU clustering: the majority
    cluster's centroid wins, outliers are ignored, <2 valid responses
    fall back to the original span
    (vllm_refine_multiple_captions.py + merge_results_multiple_responses.py)."""
    from avion_tpu.tools.narration_refinement import (
        RefineItem,
        cluster_spans,
        merge_multi_responses,
        refine_samples_multi,
        temporal_iou,
    )

    assert temporal_iou((0, 2), (0, 2)) == 1.0
    assert temporal_iou((0, 1), (2, 3)) == 0.0

    # 3 near-identical spans + 1 outlier -> two clusters, majority of 3
    labels = cluster_spans([(10.0, 12.0), (10.05, 12.0), (10.0, 11.95),
                            (30.0, 40.0)])
    assert labels[0] == labels[1] == labels[2] != labels[3]

    item = RefineItem(vid="v", start=9.0, end=13.0, caption="opens door",
                      window_start=0.0, window_end=60.0)
    cands = [{"start": 10.0, "end": 12.0}, {"start": 10.05, "end": 12.0},
             {"start": 10.0, "end": 11.95}, {"start": 30.0, "end": 40.0},
             {"start": 5.0, "end": 1.0},   # inverted: invalid
             None, {"bogus": 1}]
    rec = merge_multi_responses(item, cands)
    assert rec["refined"] and rec["n_valid"] == 4 and rec["n_majority"] == 3
    np.testing.assert_allclose(rec["start"], np.mean([10.0, 10.05, 10.0]),
                               atol=1e-6)
    np.testing.assert_allclose(rec["end"], np.mean([12.0, 12.0, 11.95]),
                               atol=1e-6)
    # caption preserved (multi-response merge refines boundaries only)
    assert rec["caption"] == "opens door"

    # <2 valid -> fallback to original
    rec2 = merge_multi_responses(item, [{"start": 10.0, "end": 12.0}, None])
    assert not rec2["refined"]
    assert rec2["start"] == 9.0 and rec2["end"] == 13.0

    # end-to-end over synthetic multi-response records
    items = [item, RefineItem(vid="w", start=1.0, end=2.0, caption="c2",
                              window_start=0.0, window_end=20.0)]

    def infer_multi(it):
        if it.vid == "v":
            return cands
        raise RuntimeError("llm down")  # -> fallback

    out = refine_samples_multi(items, infer_multi)
    assert out[0]["refined"] and not out[1]["refined"]
    assert out[1]["start"] == 1.0 and out[1]["end"] == 2.0


def test_parse_vlm_reply_contract():
    from avion_tpu.tools.narration_refinement import (RefineItem,
                                                      parse_vlm_reply)

    item = RefineItem("v", 10.0, 12.0, "c", window_start=7.5,
                      window_end=22.5)
    out = parse_vlm_reply(
        'Sure! {"start": 2.0, "end": 4.5, "caption": "opens drawer"}',
        item)
    assert out["start"] == 9.5 and out["end"] == 12.0
    assert out["caption"] == "opens drawer"
    assert parse_vlm_reply("no json here", item) is None
    assert parse_vlm_reply('{"start": "x", "end": 1}', item) is None


def test_local_vlm_infer_plumbing(tmp_path, monkeypatch):
    """local transformers backend: frames -> chat template -> generate
    -> parsed window-relative span, with the model/processor doubled
    (real weights need a downloaded snapshot)."""
    import sys
    import types

    import numpy as np

    from avion_tpu.tools import narration_refinement as nr

    class FakeTensor:
        def __init__(self, shape):
            self.shape = shape

        def to(self, device):
            return self

    class FakeProcessor:
        def apply_chat_template(self, messages, add_generation_prompt):
            assert messages[0]["content"][-1]["type"] == "text"
            return "TEMPLATED"

        def __call__(self, text, images, return_tensors):
            assert text == "TEMPLATED" and len(images) == 2
            return {"input_ids": FakeTensor((1, 5))}

        def batch_decode(self, ids, skip_special_tokens):
            return ['{"start": 1.0, "end": 3.0, "caption": "c2"}']

    class FakeModel:
        def to(self, device):
            return self

        def eval(self):
            return self

        def generate(self, **kw):
            import numpy as np

            class Out:
                def __getitem__(self, idx):
                    return "SLICE"

            return Out()

    fake_tf = types.SimpleNamespace(
        AutoProcessor=types.SimpleNamespace(
            from_pretrained=lambda p: FakeProcessor()),
        AutoModelForImageTextToText=types.SimpleNamespace(
            from_pretrained=lambda p: FakeModel()),
    )
    monkeypatch.setitem(sys.modules, "transformers", fake_tf)
    monkeypatch.setattr(
        "avion_tpu.data.sampling.load_clip",
        lambda *a, **k: np.zeros((2, 8, 8, 3), np.uint8))

    infer = nr.local_vlm_infer("/fake/path", video_root="/fake",
                               clip_length=2, crop_size=8)
    item = nr.RefineItem("v", 10.0, 12.0, "c", window_start=7.5,
                         window_end=22.5)
    out = infer(item)
    assert out == {"start": 8.5, "end": 10.5, "caption": "c2"}
