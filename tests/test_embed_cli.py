"""embed_videos CLI end-to-end: tiny exported .pt checkpoint -> video +
text embeddings written to .npz."""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the quick CI tier

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")


def test_embed_videos_cli(tmp_path):
    from avion_tpu.models import create_model
    from avion_tpu.tools.convert_checkpoint import export_clip_to_pt
    from avion_tpu.tools.embed_videos import main

    model = create_model("CLIP_TINY", num_frames=2)
    rng = jax.random.PRNGKey(0)
    params = jax.tree_util.tree_map(np.asarray, model.init(
        rng, jnp.zeros((1, 2, 32, 32, 3)),
        jnp.zeros((1, 77), jnp.int32))["params"])
    ckpt = str(tmp_path / "tiny.pt")
    export_clip_to_pt(params, ckpt)

    vids = tmp_path / "vids"
    vids.mkdir()
    for i in range(2):
        vw = cv2.VideoWriter(str(vids / f"v{i}.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 48))
        for f in range(20):
            vw.write(np.random.RandomState(f + i).randint(
                0, 255, (48, 48, 3), np.uint8))
        vw.release()
    texts = tmp_path / "caps.txt"
    texts.write_text("opens a door\ncuts an onion\n")

    out = str(tmp_path / "embeds.npz")
    main(["--ckpt", ckpt, "--model", "CLIP_TINY", "--videos", str(vids),
          "--texts", str(texts), "--out", out, "--clip-length", "2",
          "--crop-size", "32", "--batch", "4"])

    z = np.load(out)
    assert z["video_embeds"].shape == (2, 32)
    assert z["text_embeds"].shape == (2, 32)
    assert list(z["video_names"]) == ["v0.mp4", "v1.mp4"]
    assert np.isfinite(z["video_embeds"]).all()
    # embeddings discriminate: different clips differ
    assert np.abs(z["video_embeds"][0] - z["video_embeds"][1]).max() > 1e-5


def test_extract_features_cli(tmp_path):
    """egonlq extract_features CLI end-to-end on a tiny NLQ json."""
    import json

    from avion_tpu.egonlq.extract_features import main as fx_main
    from avion_tpu.models import create_model
    from avion_tpu.tools.convert_checkpoint import export_clip_to_pt

    model = create_model("CLIP_TINY", num_frames=2)
    params = jax.tree_util.tree_map(np.asarray, model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 32, 32, 3)),
        jnp.zeros((1, 77), jnp.int32))["params"])
    ckpt = str(tmp_path / "tiny.pt")
    export_clip_to_pt(params, ckpt)

    root = tmp_path / "videos"
    root.mkdir()
    vw = cv2.VideoWriter(str(root / "vid_a.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 48))
    for f in range(40):
        vw.write(np.random.RandomState(f).randint(0, 255, (48, 48, 3),
                                                  np.uint8))
    vw.release()

    ann = {"videos": [{"video_uid": "vid_a", "clips": [{
        "clip_uid": "c0", "video_start_sec": 0.0, "video_end_sec": 4.0,
        "annotations": [{"language_queries": [
            {"query": "where is the knife",
             "clip_start_sec": 1.0, "clip_end_sec": 2.0}]}]}]}]}
    annp = str(tmp_path / "nlq.json")
    json.dump(ann, open(annp, "w"))

    out = str(tmp_path / "features")
    fx_main(["--ckpt", ckpt, "--model", "CLIP_TINY",
             "--annotations", annp, "--video-root", str(root),
             "--out", out, "--clip-length", "2", "--window-sec", "1.0",
             "--batch", "4"])
    import glob
    files = glob.glob(out + "/*")
    assert files, "no feature files written"
