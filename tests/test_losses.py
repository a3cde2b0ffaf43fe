import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avion_tpu.losses import (
    clip_loss,
    max_margin_ranking_loss,
    softmax_cross_entropy,
    soft_target_cross_entropy,
)
from avion_tpu.losses.losses import videomae_loss


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_clip_loss_perfect_alignment():
    emb = _norm(np.random.RandomState(0).randn(8, 16).astype(np.float32))
    out = clip_loss(jnp.asarray(emb), jnp.asarray(emb), jnp.asarray(100.0))
    assert float(out["clip_acc"]) == 100.0
    assert float(out["loss"]) < 0.01


def test_clip_loss_vs_manual():
    rs = np.random.RandomState(1)
    img = _norm(rs.randn(6, 8).astype(np.float32))
    txt = _norm(rs.randn(6, 8).astype(np.float32))
    scale = 10.0
    out = clip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(scale))
    logits = scale * img @ txt.T
    def ce(lg):
        lg = lg - lg.max(-1, keepdims=True)
        lsm = lg - np.log(np.exp(lg).sum(-1, keepdims=True))
        return -np.mean(np.diag(lsm))
    expected = (ce(logits) + ce(logits.T)) / 2
    np.testing.assert_allclose(float(out["loss"]), expected, rtol=1e-5)


def test_clip_loss_matches_sharded(mesh_dp):
    """Global-batch formulation gives identical loss when batch-sharded
    under jit over the mesh (the pjit 'gathered InfoNCE')."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rs = np.random.RandomState(2)
    img = _norm(rs.randn(16, 8).astype(np.float32))
    txt = _norm(rs.randn(16, 8).astype(np.float32))
    ref = clip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(5.0))

    sh = NamedSharding(mesh_dp, P(("data", "fsdp")))
    gi = jax.device_put(img, sh)
    gt = jax.device_put(txt, sh)
    f = jax.jit(lambda a, b: clip_loss(a, b, jnp.asarray(5.0))["loss"])
    np.testing.assert_allclose(float(f(gi, gt)), float(ref["loss"]), rtol=1e-5)


def test_max_margin_reference_semantics():
    rs = np.random.RandomState(3)
    img = rs.randn(5, 7).astype(np.float32)
    txt = rs.randn(5, 7).astype(np.float32)
    out = max_margin_ranking_loss(jnp.asarray(img), jnp.asarray(txt), margin=0.2)
    # manual: hinge(margin - diag_i + x_ij) over rows and cols, no diag
    a, b = _norm(txt), _norm(img)
    x = a @ b.T
    n = x.shape[0]
    d = np.diag(x)[:, None]
    row = np.maximum(0.2 - d + x, 0)
    col = np.maximum(0.2 - d + x.T, 0)
    off = 1 - np.eye(n)
    expected = ((row * off).sum() + (col * off).sum()) / (2 * n * (n - 1))
    np.testing.assert_allclose(float(out["loss"]), expected, rtol=1e-5)


def test_label_smoothing_ce():
    logits = jnp.asarray([[2.0, 0.0, -1.0]])
    labels = jnp.asarray([0])
    base = softmax_cross_entropy(logits, labels)
    smoothed = softmax_cross_entropy(logits, labels, label_smoothing=0.1)
    assert float(smoothed) > float(base)


def test_soft_target_ce_matches_hard():
    logits = jnp.asarray([[1.0, 2.0, 3.0], [0.0, 1.0, -1.0]])
    labels = jnp.asarray([2, 1])
    onehot = jax.nn.one_hot(labels, 3)
    np.testing.assert_allclose(
        float(soft_target_cross_entropy(logits, onehot)),
        float(softmax_cross_entropy(logits, labels)),
        rtol=1e-6,
    )


def _reference_norm_target(video, p, ts):
    """Reference target (main_videomae_pretrain.py:322-328): per-channel
    stats over the tube's spatial elements, unbiased var, std + eps."""
    from avion_tpu.models.videomae import tube_patchify

    tubes = np.asarray(tube_patchify(jnp.asarray(video), p, ts))
    b, n, d = tubes.shape
    ch = tubes.reshape(b, n, ts * p * p, d // (ts * p * p))
    mean = ch.mean(-2, keepdims=True)
    var = ch.var(-2, keepdims=True, ddof=1)
    return ((ch - mean) / (np.sqrt(var) + 1e-6)).reshape(b, n, d)


def test_videomae_loss_zero_when_pred_equals_target():
    rs = np.random.RandomState(4)
    video = rs.randn(2, 4, 32, 32, 3).astype(np.float32)
    tubes = _reference_norm_target(video, 16, 2)
    masked_idx = jnp.asarray([[0, 3, 5], [1, 2, 7]])
    pred = jnp.asarray(
        np.stack([tubes[b][np.asarray(masked_idx)[b]] for b in range(2)])
    )
    out = videomae_loss(pred, jnp.asarray(video), masked_idx, 16, 2)
    assert float(out["loss"]) < 1e-10


def test_videomae_normalize_target_matches_torch_reference():
    """Bit-for-bit vs the reference's einops/torch formulation
    (main_videomae_pretrain.py:322-328)."""
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(11)
    video = rs.randn(2, 4, 32, 32, 3).astype(np.float32)
    p, ts = 16, 2
    # reference operates on [B, C, T, H, W]
    v = torch.from_numpy(video.transpose(0, 4, 1, 2, 3))
    b, c, t, h, w = v.shape
    sq = (v.reshape(b, c, t // ts, ts, h // p, p, w // p, p)
          .permute(0, 2, 4, 6, 3, 5, 7, 1)   # b t' h' w' p0 p1 p2 c
          .reshape(b, -1, ts * p * p, c))
    norm = (sq - sq.mean(dim=-2, keepdim=True)) / (
        sq.var(dim=-2, unbiased=True, keepdim=True).sqrt() + 1e-6)
    ref = norm.reshape(b, norm.shape[1], -1).numpy()
    ours = _reference_norm_target(video, p, ts)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
    # and videomae_loss consumes exactly this target
    masked_idx = jnp.asarray([[0, 1], [2, 3]])
    pred = jnp.asarray(
        np.stack([ref[i][np.asarray(masked_idx)[i]] for i in range(2)]))
    out = videomae_loss(pred, jnp.asarray(video), masked_idx, p, ts)
    assert float(out["loss"]) < 1e-9
