import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avion_tpu.data.rand_augment import rand_augment_clip, random_erase_clip
from avion_tpu.train.augment_device import mixup_cutmix, smooth_one_hot


def test_smooth_one_hot():
    t = smooth_one_hot(jnp.asarray([1]), 4, smoothing=0.1)
    np.testing.assert_allclose(t.sum(-1), 1.0, rtol=1e-6)
    assert float(t[0, 1]) == pytest.approx(0.925)
    assert float(t[0, 0]) == pytest.approx(0.025)


def test_mixup_targets_sum_to_one():
    key = jax.random.PRNGKey(0)
    video = jnp.ones((4, 2, 8, 8, 3))
    labels = jnp.asarray([0, 1, 2, 3])
    mixed, soft = mixup_cutmix(key, video, labels, num_classes=4,
                               mixup_alpha=0.8, cutmix_alpha=1.0)
    assert mixed.shape == video.shape
    np.testing.assert_allclose(np.asarray(soft).sum(-1), 1.0, rtol=1e-5)


def test_mixup_mixes_pixels():
    key = jax.random.PRNGKey(1)
    video = jnp.concatenate([jnp.zeros((2, 1, 8, 8, 3)),
                             jnp.ones((2, 1, 8, 8, 3))])
    labels = jnp.asarray([0, 0, 1, 1])
    mixed, soft = mixup_cutmix(key, video, labels, num_classes=2,
                               cutmix_alpha=0.0, switch_prob=0.0,
                               smoothing=0.0)
    m = np.asarray(mixed)
    assert 0.0 < m.mean() < 1.0


def test_mixup_modes_lambda_granularity():
    """timm --mixup-mode semantics: batch shares one coefficient, elem
    draws per element, pair shares within flip pairs
    (main_videomae_finetune.py mixup args)."""
    key = jax.random.PRNGKey(2)
    b = 8
    # per-sample constant frames make the realized lambda readable:
    # mixed[i] = lam*v[i] + (1-lam)*v[b-1-i]
    vals = jnp.arange(b, dtype=jnp.float32)
    video = jnp.broadcast_to(vals[:, None, None, None, None],
                             (b, 1, 8, 8, 3))
    labels = jnp.arange(b) % 4

    def realized_lams(mode):
        mixed, _ = mixup_cutmix(key, video, labels, num_classes=4,
                                mixup_alpha=0.8, cutmix_alpha=0.0,
                                switch_prob=0.0, smoothing=0.0, mode=mode)
        m = np.asarray(mixed).mean(axis=(1, 2, 3, 4))
        out = []
        for i in range(b):
            a, c = float(vals[i]), float(vals[b - 1 - i])
            out.append(0.5 if a == c else (m[i] - c) / (a - c))
        return np.asarray(out)

    lb = realized_lams("batch")
    assert np.allclose(lb, lb[0], atol=1e-5)
    le = realized_lams("elem")
    assert np.unique(np.round(le, 5)).size > 2  # independent draws
    lp = realized_lams("pair")
    np.testing.assert_allclose(lp, lp[::-1], atol=1e-5)  # pair-shared
    assert np.unique(np.round(lp[: b // 2], 5)).size > 1

    with pytest.raises(ValueError):
        mixup_cutmix(key, video, labels, num_classes=4, mode="nope")


def test_cutmix_minmax_box_fraction_bounds():
    """--cutmix-minmax: box side fractions drawn uniformly in [lo, hi];
    lam derived from the realized box area (timm rand_bbox_minmax)."""
    key = jax.random.PRNGKey(3)
    b, h = 16, 16
    video = jnp.concatenate([jnp.zeros((b // 2, 1, h, h, 3)),
                             jnp.ones((b // 2, 1, h, h, 3))])
    labels = (jnp.arange(b) >= b // 2).astype(jnp.int32)
    lo, hi = 0.25, 0.5
    mixed, soft = mixup_cutmix(key, video, labels, num_classes=2,
                               mixup_alpha=0.0, cutmix_alpha=0.0,
                               switch_prob=1.0, smoothing=0.0,
                               mode="elem", cutmix_minmax=(lo, hi))
    m = np.asarray(mixed)
    s = np.asarray(soft)
    for i in range(b // 2):  # zeros frame, partner is ones: box mean
        frac = m[i].mean()  # = box area fraction
        assert lo * lo - 1e-6 <= frac <= hi * hi + 1e-6
        # soft target mass on the partner class == box fraction
        np.testing.assert_allclose(s[i, 1], frac, atol=1e-5)
    np.testing.assert_allclose(s.sum(-1), 1.0, rtol=1e-5)


def test_mixup_cutmix_only_configuration():
    """mixup_alpha=0 + cutmix enabled: every applied sample is cutmix
    (the reference can train cutmix-only via --mixup 0 --cutmix 1)."""
    key = jax.random.PRNGKey(4)
    video = jnp.concatenate([jnp.zeros((2, 1, 8, 8, 3)),
                             jnp.ones((2, 1, 8, 8, 3))])
    labels = jnp.asarray([0, 0, 1, 1])
    mixed, _ = mixup_cutmix(key, video, labels, num_classes=2,
                            mixup_alpha=0.0, cutmix_alpha=1.0,
                            switch_prob=0.0,  # ignored when mixup off
                            smoothing=0.0)
    m = np.asarray(mixed)
    # cutmix only pastes 0/1 pixels — never interpolates
    assert set(np.unique(m)) <= {0.0, 1.0}


def test_rand_augment_consistent_across_frames():
    rng = np.random.RandomState(0)
    clip = np.random.RandomState(1).randint(0, 255, (4, 16, 16, 3), np.uint8)
    out = rand_augment_clip(clip, rng)
    assert out.shape == clip.shape
    assert out.dtype == np.uint8
    # same input frames -> same output frames (op consistency)
    clip2 = np.repeat(clip[:1], 4, axis=0)
    out2 = rand_augment_clip(clip2, np.random.RandomState(2))
    for t in range(1, 4):
        np.testing.assert_array_equal(out2[0], out2[t])


def test_random_erase_cube():
    rng = np.random.RandomState(3)
    clip = np.zeros((4, 32, 32, 3), np.uint8)
    out = random_erase_clip(clip, rng, probability=1.0)
    changed = (out != clip).any(axis=(1, 2, 3))
    assert changed.all()  # cube: every frame has the same erased box
    diff_mask = (out != clip).any(axis=(0, 3))
    ys, xs = np.nonzero(diff_mask)
    # erased region is one rectangle
    assert (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1) == len(ys)


def test_random_erase_prob_zero():
    rng = np.random.RandomState(0)
    clip = np.zeros((2, 16, 16, 3), np.uint8)
    out = random_erase_clip(clip, rng, probability=0.0)
    np.testing.assert_array_equal(out, clip)
