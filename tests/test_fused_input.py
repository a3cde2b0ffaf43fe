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

pytestmark = pytest.mark.slow  # excluded from the quick CI tier


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


def test_device_augment_pipeline_end_to_end(tmp_path):
    """dataset(device_rrc) -> batch with crop params -> jitted clip step
    applies crop+resize+normalize on device."""
    import os, os.path as osp, pickle
    cv2 = pytest.importorskip("cv2")

    root = str(tmp_path)
    d = osp.join(root, "vidx.mp4")
    os.makedirs(d)
    vw = cv2.VideoWriter(osp.join(d, "0.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    for i in range(20):
        vw.write(np.random.RandomState(i).randint(0, 255, (64, 64, 3),
                                                  np.uint8))
    vw.release()
    meta = osp.join(root, "m.pkl")
    pickle.dump([("vidx", 0.2, 1.8, "acts")] * 8, open(meta, "wb"))

    from avion_tpu.data.datasets import AugmentSpec, VideoCaptionDataset
    from avion_tpu.data.loader import DataLoader

    ds = VideoCaptionDataset(
        "ego4d", root, meta, is_training=True, clip_length=2, chunk_len=2,
        fps=10,
        augment=AugmentSpec(mode="device_rrc", crop_size=32, decode_size=48),
    )
    item = ds[0]
    assert item["video"].shape == (2, 48, 48, 3)
    assert item["crop"].shape == (4,)

    loader = DataLoader(ds, 8, shuffle=False, num_workers=0)
    batch = next(iter(loader))
    assert batch["crop"].shape == (8, 4)

    # run the clip step with device augmentation
    from avion_tpu.core.config import OptimConfig
    from avion_tpu.core.train_state import TrainState
    from avion_tpu.models.clip import CLIP
    from avion_tpu.optim import build_optimizer
    from avion_tpu.train.steps import make_clip_train_step

    model = CLIP(embed_dim=16, image_size=32, patch_size=16, num_frames=2,
                 vision_width=32, vision_layers=1, vision_heads=2,
                 context_length=77, vocab_size=49408, text_width=16,
                 text_heads=2, text_layers=1, use_flash=False,
                 dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 2, 32, 32, 3)),
                        jnp.zeros((1, 77), jnp.int32))["params"]
    cfg = OptimConfig(optimizer="adamw", lr=1e-3, warmup_epochs=0, epochs=1)
    tx, _ = build_optimizer(cfg, params, niter_per_ep=10)
    state = TrainState.create(params, tx)
    step = jax.jit(make_clip_train_step(model, tx, crop_size=32))
    state, metrics = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                          jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
