"""End-to-end convergence of the NLQ training entry.

Drives the real ``avion_tpu.egonlq.train_nlq`` CLI surface (config
parsing, feature dataset, VSLNet step, evaluation) on a synthetic
feature set where the ground-truth span is detectable from the
video/query feature correlation — the entry-level analogue of the
reference's ``egonlq/main.py`` loop.
"""

import json
import os.path as osp

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the quick CI tier

VDIM, QDIM = 96, 64


def _write_nlq_set(root, n, seed, lv=32, duration=64.0):
    """Annotations + feat_<i>.npz where rows inside the gt span carry a
    shared linear image of the query vector (learnable correlation)."""
    rs = np.random.RandomState(seed)
    proj = np.random.RandomState(7).randn(QDIM, VDIM).astype(np.float32)
    videos = []
    for i in range(n):
        q = rs.randn(QDIM).astype(np.float32)
        q /= np.linalg.norm(q)
        video = 0.3 * rs.randn(lv, VDIM).astype(np.float32)
        s = int(rs.randint(0, lv - 6))
        e = s + int(rs.randint(2, 6))
        video[s : e + 1] += q @ proj
        scale = duration / lv
        np.savez(osp.join(root, f"feat_{i}.npz"), video=video, text=q)
        videos.append({
            "video_uid": f"v{i}",
            "clips": [{
                "clip_uid": f"c{i}", "video_start_sec": 0.0,
                "video_end_sec": duration,
                "annotations": [{"language_queries": [
                    {"query": f"synthetic query {i}",
                     "clip_start_sec": s * scale,
                     "clip_end_sec": (e + 1) * scale},
                ]}],
            }],
        })
    path = osp.join(root, f"nlq_{seed}.json")
    with open(path, "w") as f:
        json.dump({"videos": videos}, f)
    return path


def test_train_nlq_entry_converges(tmp_path):
    from avion_tpu.egonlq import train_nlq

    root = str(tmp_path)
    train_ann = _write_nlq_set(root, 48, seed=0)
    # val shares the feature dir: samples 0..15 with the same layout
    # (train-set evaluation — the signal is span *localization*)
    params = train_nlq.main([
        f"annotations={train_ann}", f"feature_dir={root}",
        f"output_dir={osp.join(root, 'out')}",
        "dim=64", "num_heads=4", "max_pos_len=32",
        f"video_feature_dim={VDIM}", f"query_feature_dim={QDIM}",
        "drop_rate=0.0", "lr=2e-3", "epochs=12", "batch_size=16",
    ])
    cfg = train_nlq.NLQConfig(
        annotations=train_ann, val_annotations=train_ann,
        feature_dir=root, dim=64, num_heads=4, max_pos_len=32,
        video_feature_dim=VDIM, query_feature_dim=QDIM,
        drop_rate=0.0, batch_size=16)
    model_kwargs = dict(dim=cfg.dim, num_heads=cfg.num_heads,
                        max_pos_len=cfg.max_pos_len,
                        video_feature_dim=cfg.video_feature_dim,
                        query_feature_dim=cfg.query_feature_dim,
                        drop_rate=cfg.drop_rate, use_cq_attention=True)
    from avion_tpu.egonlq.vslnet import VSLNet

    metrics = train_nlq.evaluate(cfg, VSLNet(**model_kwargs), params)
    # spans are detectable: R@1 IoU=0.5 well above the ~8% random floor
    assert metrics["Rank@1_mIoU@0.5"] > 50.0, metrics
    assert metrics["mIoU"] > 40.0, metrics


def test_train_nlq_first_epoch_preempt_saves_nothing(tmp_path, monkeypatch):
    """SIGTERM before any epoch boundary must NOT checkpoint the
    mid-epoch params as a boundary (resume would re-train epoch 0 on
    already-stepped state); a later clean run then checkpoints and
    auto-resumes normally."""
    import avion_tpu.parallel.launch as launch
    from avion_tpu.core.checkpoint import Checkpointer
    from avion_tpu.egonlq import train_nlq

    root = str(tmp_path)
    ann = _write_nlq_set(root, 16, seed=3)
    out = str(tmp_path / "run")
    args = [f"annotations={ann}", f"feature_dir={root}",
            f"output_dir={out}", "epochs=2", "batch_size=8", "dim=16",
            "num_heads=2", "max_pos_len=32",
            f"video_feature_dim={VDIM}", f"query_feature_dim={QDIM}",
            "print_freq=1"]

    monkeypatch.setattr(launch, "preempted", lambda: True)
    train_nlq.main(args)
    ckpt = Checkpointer(osp.join(out, "ckpt"))
    assert ckpt.latest_step() is None
    ckpt.close()

    monkeypatch.setattr(launch, "preempted", lambda: False)
    train_nlq.main(args)
    ckpt = Checkpointer(osp.join(out, "ckpt"))
    assert ckpt.latest_step() == 4  # 2 epochs x 2 steps, boundary-saved
    ckpt.close()
    # resume run: restores at epoch 2, trains nothing more, still clean
    train_nlq.main(args)
    ckpt = Checkpointer(osp.join(out, "ckpt"))
    assert ckpt.latest_step() == 4
    ckpt.close()
