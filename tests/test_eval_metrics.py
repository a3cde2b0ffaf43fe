import numpy as np
import jax.numpy as jnp
import jax
import pytest

from avion_tpu.eval.retrieval_metrics import (
    calculate_map,
    calculate_ndcg,
    k_count_mask,
    get_map,
    get_ndcg,
)
from avion_tpu.eval.classification_metrics import (
    topk_accuracy,
    confusion_matrix,
    mean_class_accuracy,
    charades_map,
    marginalize,
    get_marginal_indexes,
    egomcq_accuracy,
)


def test_map_perfect_ranking():
    sim = np.array([[0.9, 0.1, 0.2], [0.1, 0.8, 0.2]])
    rel = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    assert calculate_map(sim, rel) == 1.0


def test_map_known_value():
    # one query, relevant items at ranks 1 and 3 -> AP = (1/1 + 2/3)/2
    sim = np.array([[0.9, 0.5, 0.7]])
    rel = np.array([[1.0, 1.0, 0.0]])
    np.testing.assert_allclose(calculate_map(sim, rel), (1 + 2 / 3) / 2)


def test_k_count_mask():
    rel = np.array([[1, 0.5, 0], [0, 0, 1]])
    np.testing.assert_array_equal(
        k_count_mask(rel), [[1, 1, 0], [1, 0, 0]]
    )


def test_ndcg_perfect_is_one():
    rel = np.array([[1.0, 0.5, 0.0], [0.2, 1.0, 0.0]])
    assert abs(calculate_ndcg(rel.copy(), rel) - 1.0) < 1e-9


def test_ndcg_truncates_to_k():
    # only relevant item ranked outside top-k (k=1) -> nDCG 0
    rel = np.array([[1.0, 0.0, 0.0]])
    sim = np.array([[0.0, 0.5, 1.0]])
    assert calculate_ndcg(sim, rel) == 0.0
    # two relevant, one recovered in top-2: DCG=1, IDCG=1+1/log2(3)
    rel2 = np.array([[1.0, 1.0, 0.0]])
    sim2 = np.array([[0.9, 0.1, 0.5]])
    np.testing.assert_allclose(
        calculate_ndcg(sim2, rel2), 1.0 / (1.0 + 1.0 / np.log2(3))
    )


def _reference_ndcg(sim, rel):
    """Literal loop transcription of the reference algorithm
    (avion/utils/evaluation_ek100mir.py:17-150): k_counts mask, DCG via
    argsort(sim)[:, ::-1], IDCG = DCG(rel, rel), mean of DCG/IDCG."""
    k_counts = (np.sort(rel, axis=1)[:, ::-1] > 0).astype(int)

    def dcg(s, r):
        out = np.zeros(s.shape[0])
        for i in range(s.shape[0]):
            ranks = np.argsort(s[i])[::-1]
            num = r[i][ranks] * k_counts[i]
            out[i] = np.sum(num / np.log2(np.arange(s.shape[1]) + 2))
        return out

    return float(np.mean(dcg(sim, rel) / dcg(rel, rel)))


def test_ndcg_tie_handling_matches_reference():
    """VERDICT r3 #8: tied similarities must produce the same nDCG as
    the reference's reversed-argsort — bit-identical, not just close.

    The constructed case puts UNEQUAL relevancies on tied similarity
    scores spanning the k-count cutoff, which is exactly where a
    different tie order changes the result."""
    sim = np.array(
        [
            # ties at 0.5 with relevancies 1.0 / 0.2 / 0.0 across the cutoff
            [0.5, 0.5, 0.5, 0.9, 0.1],
            # all-equal similarities: order is purely the tie-break
            [0.3, 0.3, 0.3, 0.3, 0.3],
            # tied pair inside the relevant window
            [0.8, 0.8, 0.2, 0.1, 0.0],
        ]
    )
    rel = np.array(
        [
            [1.0, 0.2, 0.0, 0.5, 0.0],
            [0.0, 1.0, 0.3, 0.0, 0.7],
            [0.4, 1.0, 0.0, 0.6, 0.0],
        ]
    )
    assert calculate_ndcg(sim, rel) == _reference_ndcg(sim, rel)
    assert calculate_ndcg(sim.T, rel.T) == _reference_ndcg(sim.T, rel.T)


def test_ndcg_tie_handling_random_with_heavy_ties():
    rng = np.random.RandomState(0)
    for _ in range(5):
        # quantized similarities -> many exact ties
        sim = np.round(rng.rand(17, 23), 1)
        rel = rng.choice([0.0, 0.2, 0.5, 1.0], size=(17, 23))
        rel[rel.sum(axis=1) == 0, 0] = 1.0  # every query has a relevant
        assert calculate_ndcg(sim, rel) == _reference_ndcg(sim, rel)


def test_topk_accuracy():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.2, 0.3, 0.5]])
    labels = np.array([1, 0, 0])
    a1, a5 = topk_accuracy(logits, labels, (1, 3))
    np.testing.assert_allclose(a1, 200 / 3)
    np.testing.assert_allclose(a5, 100.0)


def test_mean_class_accuracy():
    cm = confusion_matrix(np.array([0, 0, 1, 1]), np.array([0, 1, 1, 1]), 2)
    mean_acc, overall = mean_class_accuracy(cm)
    np.testing.assert_allclose(mean_acc, 100 * (1.0 + 2 / 3) / 2)
    np.testing.assert_allclose(overall, 75.0)


def test_charades_map_excludes_empty_rows():
    scores = np.array([[0.9, 0.1], [0.8, 0.2], [0.1, 0.9]])
    gt = np.array([[1, 0], [0, 0], [0, 1]])
    m_ap, _, aps = charades_map(scores, gt)
    np.testing.assert_allclose(m_ap, 1.0)


def test_marginalize():
    actions = [(0, 0), (0, 1), (1, 0)]  # (verb, noun) per action
    probs = np.array([[0.2, 0.3, 0.5]])
    vi = get_marginal_indexes(actions, "verb")
    vp = marginalize(probs, vi)
    np.testing.assert_allclose(vp, [[0.5, 0.5]])
    ni = get_marginal_indexes(actions, "noun")
    np_ = marginalize(probs, ni)
    np.testing.assert_allclose(np_, [[0.7, 0.3]])


def test_egomcq_accuracy():
    preds = np.array([[0.9, 0.1, 0, 0, 0], [0, 0.9, 0.1, 0, 0],
                      [0.9, 0, 0.1, 0, 0]])
    labels = np.array([0, 1, 2])
    types = np.array([1, 1, 2])
    m = egomcq_accuracy(preds, labels, types)
    assert m["Intra-video"] == 100.0
    assert m["Inter-video"] == 0.0


def test_clip_encoders_and_zeroshot(mesh_dp):
    from avion_tpu.models.clip import CLIP
    from avion_tpu.eval.runners import (
        CLIPEncoders, build_text_classifier, validate_zeroshot_cls,
    )

    model = CLIP(
        embed_dim=16, image_size=32, patch_size=16, num_frames=2,
        vision_width=32, vision_layers=1, vision_heads=2, context_length=77,
        vocab_size=49408, text_width=16, text_heads=2, text_layers=1,
        use_flash=False, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    video = jnp.zeros((1, 2, 32, 32, 3))
    text = jnp.zeros((1, 77), jnp.int32)
    params = model.init(rng, video, text)["params"]
    enc = CLIPEncoders(model, params, batch=4)

    # classifier from label texts
    clf = build_text_classifier(enc, ["open door", "close door"])
    assert clf.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(clf, axis=1), 1.0, rtol=1e-5)

    # zero-shot over a fake loader (uint8 videos)
    rs = np.random.RandomState(0)
    loader = [
        {"video": rs.randint(0, 255, (3, 2, 32, 32, 3), np.uint8),
         "label": np.array([0, 1, 0])}
    ]
    out = validate_zeroshot_cls(enc, loader, clf, n_classes=2)
    assert set(out) >= {"acc1", "acc5", "mean_class_acc"}

    # odd-size sweep exercises padding
    emb = enc.encode_images(rs.randint(0, 255, (5, 2, 32, 32, 3), np.uint8))
    assert emb.shape == (5, 16)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-4)


def test_clip_encoders_mesh_sharded(mesh_dp):
    from avion_tpu.models.clip import CLIP
    from avion_tpu.eval.runners import CLIPEncoders

    model = CLIP(
        embed_dim=16, image_size=32, patch_size=16, num_frames=2,
        vision_width=32, vision_layers=1, vision_heads=2, context_length=77,
        vocab_size=49408, text_width=16, text_heads=2, text_layers=1,
        use_flash=False, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 2, 32, 32, 3)),
                        jnp.zeros((1, 77), jnp.int32))["params"]
    enc_local = CLIPEncoders(model, params, batch=8)
    enc_mesh = CLIPEncoders(model, params, batch=6, mesh=mesh_dp)
    assert enc_mesh.batch == 8  # rounded up to shard count
    rs = np.random.RandomState(0)
    vids = rs.randint(0, 255, (11, 2, 32, 32, 3), np.uint8)
    np.testing.assert_allclose(
        enc_mesh.encode_images(vids), enc_local.encode_images(vids),
        rtol=1e-4,
    )
