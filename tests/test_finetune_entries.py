"""Smoke tests for the EK100 finetune entries (MIR + CLS) on a synthetic
EPIC-Kitchens-style layout."""

import csv
import json
import os
import os.path as osp
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the quick CI tier

cv2 = pytest.importorskip("cv2")

FPS = 10
CHUNK = 2


def _write_video(path, n_frames, w=48, h=48):
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (w, h))
    for i in range(n_frames):
        vw.write(np.random.RandomState(i).randint(0, 255, (h, w, 3), np.uint8))
    vw.release()


def _ts(sec):
    return f"00:00:{sec:05.2f}"


@pytest.fixture(scope="module")
def ek100(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ek"))
    # chunked video dirs: root/P01/P01_01.MP4/{0,2}.MP4
    for pid, vid in (("P01", "P01_01"), ("P01", "P01_02")):
        d = osp.join(root, pid, f"{vid}.MP4")
        os.makedirs(d)
        for c in (0, 2):
            _write_video(osp.join(d, f"{c}.MP4"), CHUNK * FPS)

    meta_dir = str(tmp_path_factory.mktemp("ekmeta"))
    n = 8
    rows = []
    for i in range(n):
        vid = "P01_01" if i % 2 == 0 else "P01_02"
        rows.append([
            str(i), "P01", vid, "x", _ts(0.3), _ts(3.2), "9", "91",
            f"take thing {i}", "t", str(i % 2), "n", str(i % 3),
        ])
    header = ["narration_id", "participant_id", "video_id", "narration_timestamp",
              "start_timestamp", "stop_timestamp", "start_frame", "stop_frame",
              "narration", "verb", "verb_class", "noun", "noun_class"]

    for split in ("train", "test"):
        with open(osp.join(meta_dir, f"EPIC_100_retrieval_{split}.csv"), "w",
                  newline="") as f:
            w = csv.writer(f)
            w.writerow(header)
            w.writerows(rows)
        with open(osp.join(meta_dir, f"EPIC_100_retrieval_{split}_sentence.csv"),
                  "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["narration_id", "narration"])
            for r in rows:
                w.writerow([r[0], r[8]])
    os.makedirs(osp.join(meta_dir, "relevancy"))
    rel = np.eye(n, dtype=np.float32)
    for split in ("train", "test"):
        with open(osp.join(meta_dir, "relevancy",
                           f"caption_relevancy_EPIC_100_retrieval_{split}.pkl"),
                  "wb") as f:
            pickle.dump(rel, f)

    # actions csv: id,verb,noun,action
    with open(osp.join(meta_dir, "actions.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "verb", "noun", "action"])
        k = 0
        for v in range(2):
            for nn in range(3):
                w.writerow([k, v, nn, f"verb_{v} noun_{nn}"])
                k += 1
    return root, meta_dir


def test_mir_subsample_keeps_relevancy_aligned(ek100):
    """subsample_stride must slice relevancy rows with the samples:
    with an identity relevancy matrix, every item's relevancy-swapped
    caption is its own narration (the reference leaves the matrix
    unsliced — clip_dataset.py:471 vs :676 — which would swap in the
    wrong sentence here)."""
    from avion_tpu.data.datasets import AugmentSpec, VideoCaptionDataset
    from avion_tpu.data.tokenizer import tokenize

    root, meta = ek100
    ds = VideoCaptionDataset(
        "ek100_mir", root, osp.join(meta, "EPIC_100_retrieval_train.csv"),
        is_training=True, clip_length=2, chunk_len=CHUNK,
        augment=AugmentSpec(crop_size=32), subsample_stride=2)
    assert len(ds) == 4
    assert ds.relevancy_mat.shape[0] == 4
    item = ds[1]  # original sample 2
    np.testing.assert_array_equal(item["text"], tokenize("take thing 2", 77))
    assert item["relevancy"] == np.float32(1.0)


def test_finetune_mir_entry(ek100, tmp_path):
    root, meta = ek100
    out = str(tmp_path / "mir")
    from avion_tpu.train.finetune_mir import main

    main([
        "model.name=CLIP_TINY",
        "model.use_flash_attn=false",
        f"data.root={root}",
        f"data.train_metadata={osp.join(meta, 'EPIC_100_retrieval_train.csv')}",
        f"data.val_metadata={osp.join(meta, 'EPIC_100_retrieval_test.csv')}",
        f"data.relevancy_path={osp.join(meta, 'relevancy', 'caption_relevancy_EPIC_100_retrieval_test.pkl')}",
        f"data.chunk_len={CHUNK}",
        "data.clip_length=2",
        "data.crop_size=32",
        "data.batch_size=8",
        "data.val_batch_size=8",
        "data.num_workers=0",
        "optim.epochs=1",
        "optim.lr=1e-4",
        "optim.warmup_epochs=0",
        f"output_dir={out}",
        "print_freq=1",
        "eval_freq=1",
        "mesh.data=8",
    ])
    logs = [json.loads(l) for l in open(osp.join(out, "log.jsonl"))]
    assert any("train/loss" in l for l in logs)
    assert any("avg_map" in k for l in logs for k in l)


def test_finetune_cls_entry(ek100, tmp_path):
    root, meta = ek100
    out = str(tmp_path / "cls")
    from avion_tpu.train.finetune_cls import main

    main([
        "model.name=CLIP_TINY",
        "model.image_size=32",
        "model.vision_width=64",
        "model.vision_layers=2",
        "model.vision_heads=2",
        "model.use_flash_attn=false",
        f"data.root={root}",
        f"data.train_metadata={osp.join(meta, 'EPIC_100_retrieval_train.csv')}",
        f"data.val_metadata={osp.join(meta, 'EPIC_100_retrieval_test.csv')}",
        f"data.label_map={osp.join(meta, 'actions.csv')}",
        f"data.chunk_len={CHUNK}",
        "data.clip_length=2",
        "data.crop_size=32",
        "data.batch_size=8",
        "data.val_batch_size=8",
        "data.num_workers=0",
        "optim.epochs=1",
        "optim.lr=1e-4",
        "optim.warmup_epochs=0",
        "mixup=0.8",
        f"output_dir={out}",
        "print_freq=1",
        "eval_freq=1",
        "mesh.data=8",
    ])
    logs = [json.loads(l) for l in open(osp.join(out, "log.jsonl"))]
    assert any("train/loss" in l for l in logs)
    assert any("verb_acc1" in l for l in logs)
