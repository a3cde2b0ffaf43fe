import json
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avion_tpu.egonlq.nlq_dataset import (
    NLQFeatureDataset,
    make_labels,
    parse_nlq_annotations,
)
from avion_tpu.egonlq.nlq_eval import evaluate_nlq, temporal_iou
from avion_tpu.egonlq.vslnet import (
    VSLNet,
    extract_top_spans,
    highlight_loss,
    vslnet_loss,
)


def test_temporal_iou():
    pred = np.array([[0.0, 10.0], [5.0, 15.0], [20.0, 30.0]])
    gt = np.array([0.0, 10.0])
    ious = temporal_iou(pred, gt)
    np.testing.assert_allclose(ious, [1.0, 5 / 15, 0.0])


def test_evaluate_nlq_perfect():
    preds = [np.array([[0.0, 10.0]]), np.array([[3.0, 5.0]])]
    gts = [(0.0, 10.0), (3.0, 5.0)]
    out = evaluate_nlq(preds, gts)
    assert out["Rank@1_mIoU@0.5"] == 100.0
    assert out["mIoU"] == pytest.approx(100.0)


def test_evaluate_nlq_partial():
    preds = [np.array([[0.0, 10.0], [50.0, 60.0]]),
             np.array([[100.0, 110.0]])]
    gts = [(50.0, 60.0), (0.0, 10.0)]
    out = evaluate_nlq(preds, gts)
    assert out["Rank@1_mIoU@0.5"] == 0.0
    assert out["Rank@5_mIoU@0.5"] == 50.0


def test_make_labels():
    s, e, h = make_labels(2.0, 4.0, duration=10.0, n_features=10,
                          extend_ratio=0.0)
    assert (s, e) == (2, 4)
    np.testing.assert_array_equal(np.nonzero(h)[0], [2, 3, 4])


def test_vslnet_forward_and_loss(rng):
    model = VSLNet(dim=32, num_heads=4, max_pos_len=16,
                   video_feature_dim=24, query_feature_dim=12,
                   drop_rate=0.1)
    B, Lv, Lq = 2, 16, 5
    video = jnp.asarray(np.random.RandomState(0).randn(B, Lv, 24), jnp.float32)
    query = jnp.asarray(np.random.RandomState(1).randn(B, Lq, 12), jnp.float32)
    v_mask = jnp.ones((B, Lv)).at[:, 12:].set(0)
    q_mask = jnp.ones((B, Lq))
    params = model.init(rng, video, v_mask, query, q_mask)["params"]
    h, s, e = model.apply({"params": params}, video, v_mask, query, q_mask)
    assert h.shape == (B, Lv) and s.shape == (B, Lv) and e.shape == (B, Lv)
    # masked positions get huge negative logits
    assert float(s[0, 13]) < -1e20
    batch = {
        "v_mask": v_mask,
        "h_labels": jnp.zeros((B, Lv)).at[:, 2:5].set(1.0),
        "start_label": jnp.asarray([2, 3]),
        "end_label": jnp.asarray([4, 6]),
    }
    loss, aux = vslnet_loss(h, s, e, batch)
    assert np.isfinite(float(loss))
    assert float(aux["highlight_loss"]) >= 0

    # training reduces the loss
    import optax

    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def lf(p):
            h, s, e = model.apply({"params": p}, video, v_mask, query, q_mask)
            return vslnet_loss(h, s, e, batch)[0]
        l, g = jax.value_and_grad(lf)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    losses = []
    for _ in range(10):
        params, opt, l = step(params, opt)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_vslnet_small_variant(rng):
    """use_cq_attention=False = the reference's VSLNet_small: no
    cq_attention params, same output contract, trainable."""
    model = VSLNet(dim=32, num_heads=4, max_pos_len=16,
                   video_feature_dim=24, query_feature_dim=12,
                   use_cq_attention=False)
    B, Lv, Lq = 2, 16, 5
    r = np.random.RandomState(2)
    video = jnp.asarray(r.randn(B, Lv, 24), jnp.float32)
    query = jnp.asarray(r.randn(B, Lq, 12), jnp.float32)
    v_mask = jnp.ones((B, Lv))
    q_mask = jnp.ones((B, Lq))
    params = model.init(rng, video, v_mask, query, q_mask)["params"]
    assert "cq_attention" not in params
    assert "cq_concat" in params
    h, s, e = model.apply({"params": params}, video, v_mask, query, q_mask)
    assert h.shape == (B, Lv) and s.shape == (B, Lv) and e.shape == (B, Lv)
    batch = {
        "v_mask": v_mask,
        "h_labels": jnp.zeros((B, Lv)).at[:, 2:5].set(1.0),
        "start_label": jnp.asarray([2, 3]),
        "end_label": jnp.asarray([4, 6]),
    }
    loss, _ = vslnet_loss(h, s, e, batch)
    g = jax.grad(lambda p: vslnet_loss(*model.apply(
        {"params": p}, video, v_mask, query, q_mask), batch)[0])(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), g, 0.0)
    assert np.isfinite(float(loss)) and gnorm > 0


def test_extract_top_spans_respects_order():
    s = jnp.asarray([[0.0, 10.0, 0.0, 0.0]])
    e = jnp.asarray([[0.0, 0.0, 10.0, 0.0]])
    si, ei = extract_top_spans(s, e, k=2)
    assert int(si[0, 0]) == 1 and int(ei[0, 0]) == 2
    # spans are upper-triangular: end >= start everywhere
    assert (np.asarray(ei) >= np.asarray(si)).all()


def test_parse_nlq_annotations(tmp_path):
    ann = {
        "videos": [{
            "video_uid": "vid1",
            "clips": [{
                "clip_uid": "c1", "video_start_sec": 0.0,
                "video_end_sec": 100.0,
                "annotations": [{
                    "language_queries": [
                        {"query": "where did I put the keys",
                         "clip_start_sec": 4.0, "clip_end_sec": 9.0},
                        {"query": None},
                    ],
                }],
            }],
        }],
    }
    p = str(tmp_path / "nlq.json")
    json.dump(ann, open(p, "w"))
    samples = parse_nlq_annotations(p)
    assert len(samples) == 1
    assert samples[0]["query"].startswith("where")
    assert samples[0]["gt_end"] == 9.0
