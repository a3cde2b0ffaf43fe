"""End-to-end smoke: the pretrain CLI entry trains a tiny CLIP on a
synthetic chunked ego4d dataset over the 8-device CPU mesh, writes
checkpoints, and resumes."""

import json
import os
import os.path as osp
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

FPS = 10
CHUNK = 2


def _write_video(path, n_frames, w=48, h=48):
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (w, h))
    for i in range(n_frames):
        f = np.random.RandomState(i).randint(0, 255, (h, w, 3), np.uint8)
        vw.write(f)
    vw.release()


@pytest.fixture(scope="module")
def tiny_ego4d(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ego4d"))
    samples = []
    for v in range(8):
        vid = f"vid{v}"
        d = osp.join(root, f"{vid}.mp4")
        os.makedirs(d)
        for chunk in (0, 2):
            _write_video(osp.join(d, f"{chunk}.mp4"), CHUNK * FPS)
        samples.append((vid, 0.3, 3.5, f"does action number {v}"))
    meta = osp.join(root, "meta.pkl")
    with open(meta, "wb") as f:
        pickle.dump(samples, f)
    return root, meta


def test_pretrain_entry_end_to_end(tiny_ego4d, tmp_path):
    root, meta = tiny_ego4d
    out = str(tmp_path / "run")
    from avion_tpu.train.pretrain_clip import main

    args = [
        "model.name=CLIP_TINY",
        "model.use_flash_attn=false",
        f"data.root={root}",
        f"data.train_metadata={meta}",
        f"data.chunk_len={CHUNK}",
        f"data.fps={FPS}",
        "data.clip_length=2",
        "data.crop_size=32",
        "data.batch_size=8",
        "data.num_workers=0",
        "optim.epochs=2",
        "optim.lr=1e-3",
        "optim.warmup_epochs=0",
        f"output_dir={out}",
        "eval_freq=0",
        "print_freq=1",
        "mesh.data=4",
        "mesh.fsdp=2",
    ]
    main(args)
    assert osp.exists(osp.join(out, "config.json"))
    assert osp.exists(osp.join(out, "log.jsonl"))
    logs = [json.loads(l) for l in open(osp.join(out, "log.jsonl"))]
    assert any("train/loss" in l for l in logs)
    ckpts = os.listdir(osp.join(out, "ckpt"))
    assert len(ckpts) >= 1

    # resume: run again, should restore from the checkpoint
    main(args)
