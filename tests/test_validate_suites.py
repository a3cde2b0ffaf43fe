"""Integration tests for the zero-shot suite builders: synthetic EGTEA,
Charades-Ego, and EgoMCQ data through the real dataset parsers and
evaluation runners with a tiny CLIP."""

import csv
import json
import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from avion_tpu.data.datasets import (
    AugmentSpec,
    VideoCaptionMCQDataset,
    VideoClassyDataset,
)
from avion_tpu.data.loader import DataLoader
from avion_tpu.eval.runners import (
    CLIPEncoders,
    build_text_classifier,
    validate_egomcq,
    validate_zeroshot_cls,
)


def _write_video(path, n_frames=12, w=48, h=48):
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
    for i in range(n_frames):
        vw.write(np.random.RandomState(i).randint(0, 255, (h, w, 3), np.uint8))
    vw.release()


@pytest.fixture(scope="module")
def tiny_encoders():
    from avion_tpu.models.clip import CLIP

    model = CLIP(
        embed_dim=16, image_size=32, patch_size=16, num_frames=2,
        vision_width=32, vision_layers=1, vision_heads=2, context_length=77,
        vocab_size=49408, text_width=16, text_heads=2, text_layers=1,
        use_flash=False, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 2, 32, 32, 3)),
                        jnp.zeros((1, 77), jnp.int32))["params"]
    return CLIPEncoders(model, params, batch=4)


def test_egtea_suite(tmp_path, tiny_encoders):
    data = tmp_path / "egtea_data"
    meta = tmp_path / "egtea_meta"
    os.makedirs(data / "P01-R01-V01")
    os.makedirs(meta)
    for clip in ("P01-R01-V01-C01", "P01-R01-V01-C02"):
        _write_video(str(data / "P01-R01-V01" / f"{clip}.mp4"))
    (meta / "action_idx.txt").write_text(
        "Cut_tomato 1\nPour_water 2\n")
    (meta / "test_split1.txt").write_text(
        "P01-R01-V01-C01 1 x\nP01-R01-V01-C02 2 x\n")

    ds = VideoClassyDataset(
        "egtea", str(data), str(meta / "test_split1.txt"),
        is_training=False, clip_length=2, chunk_len=-1,
        augment=AugmentSpec(crop_size=32, mode="center"),
    )
    assert len(ds) == 2
    assert ds.samples[0].label == 0
    assert ds.samples[0].caption == "cut tomato"
    loader = DataLoader(ds, 2, shuffle=False, drop_last=False, num_workers=0)
    clf = build_text_classifier(tiny_encoders, ["cut tomato", "pour water"])
    out = validate_zeroshot_cls(tiny_encoders, loader, clf, n_classes=2)
    assert "acc1" in out and "mean_class_acc" in out


def test_charades_suite(tmp_path, tiny_encoders):
    data = tmp_path / "cha_data"
    meta = tmp_path / "cha_meta"
    os.makedirs(data)
    os.makedirs(meta)
    for vid in ("VID1EGO", "VID2EGO"):
        _write_video(str(data / f"{vid}.mp4"), n_frames=20)
    header = ["id", "a", "b", "c", "d", "e", "f", "g", "h", "actions",
              "length"]
    with open(meta / "CharadesEgo_v1_test_only1st.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerow(["VID1EGO"] + [""] * 8 + ["c000 0.2 1.0;c001 1.0 1.8", "2.0"])
        w.writerow(["VID2EGO"] + [""] * 8 + ["c001 0.0 1.5", "2.0"])
    (meta / "Charades_v1_classes.txt").write_text(
        "c000 Holding a cup\nc001 Opening a door\n")

    mapping = {"c000": 0, "c001": 1}
    ds = VideoClassyDataset(
        "charades_ego", str(data),
        str(meta / "CharadesEgo_v1_test_only1st.csv"),
        is_training=False, clip_length=2, chunk_len=-1,
        label_mapping=mapping,
        augment=AugmentSpec(crop_size=32, mode="center"),
    )
    # untrimmed eval: one sample per video with multi-label vector
    assert len(ds) == 2
    item = ds[0]
    np.testing.assert_array_equal(item["label"], [1.0, 1.0])
    loader = DataLoader(ds, 2, shuffle=False, drop_last=False, num_workers=0)
    clf = build_text_classifier(tiny_encoders,
                                ["Holding a cup", "Opening a door"])
    out = validate_zeroshot_cls(tiny_encoders, loader, clf, multilabel=True)
    assert "mAP" in out


def test_egomcq_suite(tmp_path, tiny_encoders):
    root = tmp_path / "mcq"
    os.makedirs(root)
    for vid in ("uidA", "uidB"):
        d = root / f"{vid}.mp4"
        os.makedirs(d)
        _write_video(str(d / "0.mp4"), n_frames=20)
    ann = {}
    for i in range(2):
        ann[str(i)] = {
            "query": {"clip_text": f"does thing {i}"},
            "choices": {
                str(k): {"video_uid": "uidA" if k % 2 else "uidB",
                         "clip_start": 0.0, "clip_end": 1.5,
                         "clip_text": f"option {k}"}
                for k in range(5)
            },
            "answer": i % 5,
            "types": 1 + i % 2,
        }
    ann_path = root / "egomcq.json"
    json.dump(ann, open(ann_path, "w"))
    ds = VideoCaptionMCQDataset(str(root), str(ann_path), clip_length=2,
                                chunk_len=2, fps=10, crop_size=32)
    assert len(ds) == 2
    item = ds[0]
    assert item["videos"].shape == (5, 2, 32, 32, 3)
    assert item["options"].shape == (5, 77)
    loader = DataLoader(ds, 1, shuffle=False, drop_last=False, num_workers=0)
    out = validate_egomcq(tiny_encoders, loader)
    assert "Intra-video" in out and "Inter-video" in out
