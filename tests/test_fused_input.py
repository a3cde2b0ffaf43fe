import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avion_tpu.data.transforms import OPENAI_MEAN, OPENAI_STD
from avion_tpu.data.video_reader import CropSpec
from avion_tpu.ops.fused_input import (
    batch_crop_array,
    crop_resize_flip_normalize,
)


def _ref_resize(img, crop, out_w, out_h):
    cv2 = pytest.importorskip("cv2")
    h, w = img.shape[:2]
    sx, sy = int(crop.x * w), int(crop.y * h)
    sw, sh = int(crop.w * w), int(crop.h * h)
    patch = img[sy : sy + sh, sx : sx + sw]
    out = cv2.resize(patch.astype(np.float32), (out_w, out_h),
                     interpolation=cv2.INTER_LINEAR)
    if crop.hflip:
        out = out[:, ::-1]
    return out


def test_identity_resize():
    rs = np.random.RandomState(0)
    video = rs.randint(0, 255, (2, 1, 16, 16, 3), np.uint8)
    crops = jnp.asarray([[0, 0, 1, 1]] * 2, jnp.float32)
    out = crop_resize_flip_normalize(
        jnp.asarray(video), crops, out_size=(16, 16), dtype=jnp.float32)
    expected = (video.astype(np.float32) - np.array(OPENAI_MEAN) * 255) / (
        np.array(OPENAI_STD) * 255)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-3)


def test_matches_cv2_bilinear():
    rs = np.random.RandomState(1)
    video = rs.randint(0, 255, (1, 2, 64, 48, 3), np.uint8)
    crop = CropSpec(0.25, 0.125, 0.5, 0.75)
    crops, flips = batch_crop_array([crop])
    out = crop_resize_flip_normalize(
        jnp.asarray(video), crops, flips, out_size=(32, 32),
        dtype=jnp.float32)
    out_px = np.asarray(out) * (np.array(OPENAI_STD) * 255) + (
        np.array(OPENAI_MEAN) * 255)
    for t in range(2):
        ref = _ref_resize(video[0, t], crop, 32, 32)
        # interpolation-position conventions differ sub-pixel at borders
        diff = np.abs(out_px[0, t] - ref)
        assert np.median(diff) < 3.0
        assert diff.mean() < 6.0


def test_hflip():
    rs = np.random.RandomState(2)
    video = rs.randint(0, 255, (2, 1, 8, 8, 3), np.uint8)
    crops = jnp.asarray([[0, 0, 1, 1]] * 2, jnp.float32)
    flips = jnp.asarray([False, True])
    out = crop_resize_flip_normalize(
        jnp.asarray(video), crops, flips, out_size=(8, 8), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(out[1, :, :, ::-1])[:, :, ::-1],
        atol=1e-5)
    # flipped sample equals manual flip of unflipped computation
    out0 = crop_resize_flip_normalize(
        jnp.asarray(video[1:2]), crops[:1], jnp.asarray([False]),
        out_size=(8, 8), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out[1]),
                               np.asarray(out0[0, :, :, ::-1]), atol=1e-5)


def test_jit_and_grad_free():
    video = jnp.zeros((4, 2, 32, 32, 3), jnp.uint8)
    crops = jnp.asarray([[0.1, 0.1, 0.8, 0.8]] * 4, jnp.float32)
    f = jax.jit(lambda v, c: crop_resize_flip_normalize(
        v, c, out_size=(16, 16)))
    out = f(video, crops)
    assert out.shape == (4, 2, 16, 16, 3)
    assert out.dtype == jnp.bfloat16
