"""Tests for the tar-sharded input path (data/shards.py): pack a tiny
chunked ego4d tree into shards, read it back through the map-style
dataset + loader, and train the pretrain entry from ``data.shard_dir``.
"""

import json
import os
import os.path as osp
import pickle
import tarfile

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from avion_tpu.data.datasets import AugmentSpec
from avion_tpu.data.shards import (
    INDEX_NAME,
    ShardedVideoCaptionDataset,
    pack_shards,
)
from avion_tpu.data.tokenizer import tokenize

FPS = 10
CHUNK = 2


def _write_chunk(path, n_frames, first_index, w=48, h=48):
    """Frames whose blue channel encodes the global frame index."""
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (w, h))
    for i in range(n_frames):
        f = np.zeros((h, w, 3), np.uint8)
        f[:, :, 0] = min(255, 2 * (first_index + i))  # BGR blue
        vw.write(f)
    vw.release()


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ego4d_src"))
    samples = []
    for v in range(8):
        vid = f"vid{v}"
        d = osp.join(root, f"{vid}.mp4")
        os.makedirs(d)
        for ci, chunk in enumerate((0, 2)):
            _write_chunk(osp.join(d, f"{chunk}.mp4"), CHUNK * FPS,
                         ci * CHUNK * FPS)
        cap = [f"opt {v} a", f"opt {v} b"] if v == 5 \
            else f"does action number {v}"
        samples.append((vid, 0.5, 3.5, cap))
    meta = osp.join(root, "meta.pkl")
    with open(meta, "wb") as f:
        pickle.dump(samples, f)

    out_dir = str(tmp_path_factory.mktemp("shards"))
    index = pack_shards("ego4d", root, meta, out_dir,
                        samples_per_shard=4, chunk_len=CHUNK, fps=FPS,
                        pack_fps=FPS, short_side=0)
    return root, meta, out_dir, index


def test_pack_layout_and_offsets(packed):
    _, _, out_dir, index = packed
    assert index["meta"]["count"] == 8
    shards = sorted({r["shard"] for r in index["samples"]})
    assert shards == ["shard-000000.tar", "shard-000001.tar"]
    assert osp.exists(osp.join(out_dir, INDEX_NAME))
    # offsets in the index must agree with the tar reader's own view
    with tarfile.open(osp.join(out_dir, shards[0])) as tf:
        members = {m.name: m for m in tf.getmembers()}
    row = index["samples"][0]
    m = members[f"{row['key']}.mp4"]
    assert (row["mp4_off"], row["mp4_len"]) == (m.offset_data, m.size)
    # raw seek+read really is the member payload (an mp4 box header)
    with open(osp.join(out_dir, shards[0]), "rb") as f:
        f.seek(row["mp4_off"])
        payload = f.read(row["mp4_len"])
    assert payload[4:8] == b"ftyp"


def test_sharded_dataset_items(packed):
    _, _, out_dir, _ = packed
    ds = ShardedVideoCaptionDataset(
        out_dir, is_training=False, clip_length=4,
        augment=AugmentSpec(crop_size=32, mode="center"))
    assert len(ds) == 8
    item = ds[1]
    assert item["video"].shape == (4, 32, 32, 3)
    assert item["video"].dtype == np.uint8
    np.testing.assert_array_equal(
        item["text"], tokenize("does action number 1", 77))
    assert item["relevancy"] == np.float32(1.0)
    # window [0.5, 3.5) spans both chunks: centered 4-frame sampling
    # must see the blue ramp rising across the clip
    blues = item["video"][:, :, :, 2].astype(int).mean(axis=(1, 2))
    assert blues[-1] > blues[0] + 20
    # list captions honor narration_selection
    ds_c = ShardedVideoCaptionDataset(
        out_dir, is_training=False, clip_length=2,
        narration_selection="concat",
        augment=AugmentSpec(crop_size=32, mode="center"))
    np.testing.assert_array_equal(
        ds_c[5]["text"], tokenize("opt 5 a. opt 5 b", 77))


def test_sharded_dataset_device_rrc_contract(packed):
    _, _, out_dir, _ = packed
    ds = ShardedVideoCaptionDataset(
        out_dir, is_training=True, clip_length=2,
        augment=AugmentSpec(mode="device_rrc", decode_size=40))
    item = ds[0]
    assert item["video"].shape == (2, 40, 40, 3)
    assert item["crop"].shape == (4,)
    assert item["hflip"].dtype == np.bool_


def test_sharded_dataset_through_worker_loader(packed):
    from avion_tpu.data.loader import DataLoader

    _, _, out_dir, _ = packed
    ds = ShardedVideoCaptionDataset(
        out_dir, is_training=True, clip_length=2,
        augment=AugmentSpec(crop_size=32))
    loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                        num_workers=2, seed=0)
    batch = next(iter(loader))
    assert batch["video"].shape == (4, 2, 32, 32, 3)
    assert batch["text"].shape == (4, 77)


def test_pack_and_read_ek100_mir(tmp_path):
    """ek100_mir shards: csv metadata, MP4 chunk dirs, per-video fps,
    and the relevancy caption swap via mir_metadata."""
    import csv

    root = str(tmp_path / "ek")
    for vid in ("P01_01", "P01_02"):
        d = osp.join(root, "P01", f"{vid}.MP4")
        os.makedirs(d)
        _write_chunk(osp.join(d, "0.MP4"), 2 * CHUNK * FPS, 0)

    def ts(sec):
        return f"00:00:{sec:05.2f}"

    meta_dir = str(tmp_path / "meta")
    os.makedirs(osp.join(meta_dir, "relevancy"))
    header = ["narration_id", "participant_id", "video_id",
              "narration_timestamp", "start_timestamp", "stop_timestamp",
              "start_frame", "stop_frame", "narration", "verb",
              "verb_class", "noun", "noun_class"]
    rows = [[str(i), "P01", "P01_01" if i % 2 == 0 else "P01_02", "x",
             ts(0.3), ts(3.0), "9", "90", f"cut onion {i}", "v", "0",
             "n", "0"] for i in range(4)]
    meta_csv = osp.join(meta_dir, "EPIC_100_retrieval_train.csv")
    with open(meta_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)
    with open(osp.join(meta_dir, "EPIC_100_retrieval_train_sentence.csv"),
              "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["narration_id", "narration"])
        for r in rows:
            w.writerow([r[0], r[8]])
    with open(osp.join(meta_dir, "relevancy",
                       "caption_relevancy_EPIC_100_retrieval_train.pkl"),
              "wb") as f:
        pickle.dump(np.eye(4, dtype=np.float32), f)

    out_dir = str(tmp_path / "ek_shards")
    index = pack_shards("ek100_mir", root, meta_csv, out_dir,
                        samples_per_shard=4, chunk_len=CHUNK,
                        pack_fps=FPS, short_side=0)
    assert index["meta"]["count"] == 4

    ds = ShardedVideoCaptionDataset(
        out_dir, is_training=True, clip_length=2,
        augment=AugmentSpec(crop_size=32), mir_metadata=meta_csv)
    item = ds[2]
    # identity relevancy: the swap must return the row's own narration
    np.testing.assert_array_equal(item["text"], tokenize("cut onion 2", 77))
    assert item["relevancy"] == np.float32(1.0)
    # subsample keeps the matrix aligned
    ds2 = ShardedVideoCaptionDataset(
        out_dir, is_training=True, clip_length=2,
        augment=AugmentSpec(crop_size=32), mir_metadata=meta_csv,
        subsample_stride=2)
    np.testing.assert_array_equal(ds2[1]["text"],
                                  tokenize("cut onion 2", 77))


def test_corrupt_member_yields_placeholder(packed):
    _, _, out_dir, _ = packed
    ds = ShardedVideoCaptionDataset(
        out_dir, is_training=False, clip_length=2,
        augment=AugmentSpec(crop_size=32, mode="center"))
    rng = np.random.RandomState(0)
    frames, crop, hflip = ds._decode(b"definitely not an mp4", "bad", rng)
    assert frames.shape == (2, 32, 32, 3)
    assert frames.sum() == 0 and crop is None


def test_subsample_stride(packed):
    _, _, out_dir, _ = packed
    ds = ShardedVideoCaptionDataset(out_dir, subsample_stride=2)
    assert len(ds) == 4


def test_pack_cli(packed, tmp_path, capsys):
    from avion_tpu.data.shards import main

    root, meta, _, _ = packed
    out = str(tmp_path / "cli_shards")
    rc = main(["--root", root, "--metadata", meta, "--out-dir", out,
               "--samples-per-shard", "3", "--chunk-length", str(CHUNK),
               "--fps", str(FPS), "--pack-fps", str(FPS),
               "--short-side", "0", "--limit", "5"])
    assert rc == 0
    assert "packed 5 samples into 2 shards" in capsys.readouterr().out
    with open(osp.join(out, INDEX_NAME)) as f:
        assert len(json.load(f)["samples"]) == 5


def test_pretrain_entry_from_shards(packed, tmp_path):
    from avion_tpu.train.pretrain_clip import main

    _, _, out_dir, _ = packed
    out = str(tmp_path / "run")
    main([
        "model.name=CLIP_TINY",
        "model.use_flash_attn=false",
        f"data.shard_dir={out_dir}",
        "data.clip_length=2",
        "data.crop_size=32",
        "data.batch_size=8",
        "data.num_workers=0",
        "optim.epochs=1",
        "optim.lr=1e-3",
        "optim.warmup_epochs=0",
        f"output_dir={out}",
        "eval_freq=0",
        "print_freq=1",
        "mesh.data=4",
        "mesh.fsdp=2",
    ])
    assert osp.exists(osp.join(out, "config.json"))
    log = osp.join(out, "log.jsonl")
    assert osp.exists(log)
