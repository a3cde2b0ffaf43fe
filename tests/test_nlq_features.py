"""EgoNLQ feature extraction end-to-end with a tiny CLIP."""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from avion_tpu.egonlq.features import FeatureExtractor, strip_projection
from avion_tpu.models.clip import CLIP


@pytest.fixture(scope="module")
def clip_model():
    model = CLIP(
        embed_dim=16, image_size=32, patch_size=16, num_frames=2,
        vision_width=32, vision_layers=1, vision_heads=2, context_length=77,
        vocab_size=49408, text_width=16, text_heads=2, text_layers=1,
        use_flash=False, dtype=jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 32, 32, 3)),
                        jnp.zeros((1, 77), jnp.int32))["params"]
    return model, params


def _write_video(path, n=30, w=48, h=48):
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
    for i in range(n):
        vw.write(np.random.RandomState(i).randint(0, 255, (h, w, 3), np.uint8))
    vw.release()


def test_strip_projection(clip_model):
    model, params = clip_model
    vis, vparams = strip_projection(model, params)
    assert vis.output_dim is None
    assert "proj" not in vparams
    out = vis.apply({"params": vparams}, jnp.zeros((1, 2, 32, 32, 3)))
    assert out.shape == (1, 32)  # width features, not embed_dim


def test_feature_extraction_to_dir(clip_model, tmp_path):
    model, params = clip_model
    _write_video(str(tmp_path / "uidX.mp4"))
    fx = FeatureExtractor(model, params, clip_length=2, window_sec=1.0,
                          crop_size=32, batch=4)
    feats = fx.video_features(str(tmp_path / "uidX.mp4"))
    assert feats.shape == (3, 16)  # 3s video, 1s windows
    assert np.isfinite(feats).all()

    tf = fx.text_features(["where is the cup", "who did I talk to"])
    assert tf.shape == (2, 16)

    samples = [{"video_uid": "uidX", "query": "where is the cup"},
               {"video_uid": "uidX", "query": "what did I pour"}]
    out_dir = str(tmp_path / "feats")
    fx.extract_to_dir(samples, str(tmp_path), out_dir)
    for i in range(2):
        d = np.load(osp.join(out_dir, f"feat_{i}.npz"))
        assert d["video"].shape == (3, 16)
        assert d["text"].shape == (16,)
