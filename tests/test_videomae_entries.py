"""Smoke tests for the VideoMAE pretrain/finetune entries (tiny models,
synthetic K400 lists, CPU mesh)."""

import json
import os
import os.path as osp

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the quick CI tier

cv2 = pytest.importorskip("cv2")


def _write_video(path, n_frames, w=48, h=48):
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
    for i in range(n_frames):
        vw.write(np.random.RandomState(i).randint(0, 255, (h, w, 3), np.uint8))
    vw.release()


@pytest.fixture(scope="module")
def tiny_k400(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("k400"))
    lines = []
    for i in range(8):
        name = f"clip{i}.mp4"
        _write_video(osp.join(root, name), 20)
        lines.append(f"{name} {i % 3}")
    train_list = osp.join(root, "train.txt")
    open(train_list, "w").write("\n".join(lines))
    return root, train_list


def test_videomae_pretrain_entry(tiny_k400, tmp_path):
    root, train_list = tiny_k400
    out = str(tmp_path / "mae")
    from avion_tpu.train.videomae_pretrain import main

    main([
        "model.name=VIDEOMAE_TINY",
        "model.use_flash_attn=false",
        "model.tubelet_size=2",
        f"data.root={root}",
        f"data.train_metadata={train_list}",
        "data.clip_length=4",
        "data.clip_stride=2",
        "data.mask_ratio=0.5",
        "data.batch_size=8",
        "data.num_workers=0",
        "optim.epochs=1",
        "optim.lr=1e-3",
        "optim.warmup_epochs=0",
        f"output_dir={out}",
        "print_freq=1",
        "mesh.data=8",
    ])
    logs = [json.loads(l) for l in open(osp.join(out, "log.jsonl"))]
    assert any("train/loss" in l for l in logs)
    assert np.isfinite([l.get("train/loss", 0) for l in logs]).all()


def test_videomae_finetune_entry(tiny_k400, tmp_path):
    root, train_list = tiny_k400
    out = str(tmp_path / "ft")
    from avion_tpu.train.videomae_finetune import main

    main([
        "model.name=VIDEOMAE_TINY_FT",
        "model.num_classes=3",
        "model.use_flash_attn=false",
        f"data.root={root}",
        f"data.train_metadata={train_list}",
        f"data.val_metadata={train_list}",
        "data.clip_length=4",
        "data.clip_stride=2",
        "data.batch_size=8",
        "data.val_batch_size=8",
        "data.num_workers=0",
        "optim.epochs=1",
        "optim.lr=1e-3",
        "optim.warmup_epochs=0",
        "optim.layer_decay=0.75",
        "mixup=0.8",
        "cutmix=1.0",
        "use_ema=true",
        f"output_dir={out}",
        "print_freq=1",
        "eval_freq=1",
        "mesh.data=8",
    ])
    logs = [json.loads(l) for l in open(osp.join(out, "log.jsonl"))]
    assert any("train/loss" in l for l in logs)
    assert any("acc1" in l for l in logs)


def test_videomae_pretrain_entry_echoed(tiny_k400, tmp_path):
    """data.echo_factor=2 on the MAE entry: regen_mask kicks in (tube
    masks drawn on-device per step so echoed repeats reconstruct
    different tokens) and the epoch runs 2x the decoded batches."""
    root, train_list = tiny_k400
    out = str(tmp_path / "mae_echo")
    from avion_tpu.train.videomae_pretrain import main

    main([
        "model.name=VIDEOMAE_TINY", "model.use_flash_attn=false",
        "model.tubelet_size=2", f"data.root={root}",
        f"data.train_metadata={train_list}", "data.clip_length=4",
        "data.clip_stride=2", "data.mask_ratio=0.5",
        "data.batch_size=8", "data.num_workers=0",
        "data.echo_factor=2", "optim.epochs=1", "optim.lr=1e-3",
        "optim.warmup_epochs=0", f"output_dir={out}", "print_freq=1",
        "mesh.data=8",
    ])
    logs = [json.loads(l) for l in open(osp.join(out, "log.jsonl"))]
    rows = [l for l in logs if "train/loss" in l]
    assert np.isfinite([r["train/loss"] for r in rows]).all()
    # echoed repeats see different on-device masks: consecutive losses
    # at identical pixels still differ
    assert len({round(r["train/loss"], 6) for r in rows}) > 1
