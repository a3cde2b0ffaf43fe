"""Feature extraction for NLQ grounding with the AVION-TPU dual encoder.

Counterpart of ``egonlq/main.py:69-199`` (``fused_feature_extract``):
slide a fixed-length window over the full video, encode each window
with the *projection-stripped* visual tower (backbone-width features,
``main.py:101-108``), and encode the query text with the text tower.
Features are cached to .npz per sample.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from avion_tpu.data.sampling import get_frame_ids
from avion_tpu.data.tokenizer import tokenize
from avion_tpu.data.transforms import center_crop_spec, normalize_video
from avion_tpu.data.video_reader import CropSpec, VideoReader


def strip_projection(clip_model, clip_params):
    """Build a width-feature visual tower from a CLIP model + params
    (the reference nulls ``image_projection``, ``egonlq/main.py:101-108``).
    Returns (vision_module, vision_params)."""
    from avion_tpu.models.vit import VisionTransformer

    v = VisionTransformer(
        image_size=clip_model.image_size, patch_size=clip_model.patch_size,
        num_frames=clip_model.num_frames, width=clip_model.vision_width,
        layers=clip_model.vision_layers, heads=clip_model.vision_heads,
        output_dim=None, dtype=clip_model.dtype,
        use_flash=clip_model.use_flash,
    )
    params = dict(clip_params["visual"])
    params.pop("proj", None)
    return v, params


class FeatureExtractor:
    def __init__(self, model, params, *, clip_length: int = 4,
                 window_sec: float = 2.0, fps: float = 30.0,
                 crop_size: int = 224, batch: int = 32):
        from avion_tpu.eval.runners import cast_inference_params

        self.model = model
        # bf16 weight storage: exact for bf16-compute models, halves
        # weight HBM reads per window batch (docs/SERVING.md)
        self.params = cast_inference_params(params, model)
        self.clip_length = clip_length
        self.window_sec = window_sec
        self.fps = fps
        self.crop_size = crop_size
        self.batch = batch

        @jax.jit
        def _vis(params, video):
            v = normalize_video(video, dtype=model.dtype)
            # width features: visual tower output without projection
            feats = model.apply({"params": params}, v,
                                method=lambda m, v: m.visual(v))
            return feats

        @jax.jit
        def _txt(params, text):
            return model.apply({"params": params}, text,
                               method=model.encode_text)

        self._vis, self._txt = _vis, _txt

    def video_features(self, path: str) -> np.ndarray:
        """[n_windows, D] features over the whole video."""
        vr = VideoReader(path)
        n = len(vr)
        fps = vr.get_avg_fps() or self.fps
        win = max(1, int(self.window_sec * fps))
        crop = center_crop_spec(vr.width, vr.height)
        windows = []
        for start in range(0, n, win):
            ids = get_frame_ids(start, min(start + win, n),
                                num_segments=self.clip_length, jitter=False)
            windows.append(vr.get_batch(ids, crop,
                                        (self.crop_size, self.crop_size)))
        clips = np.stack(windows)  # [W, T, H, W, C]
        out = []
        for i in range(0, len(clips), self.batch):
            chunk = clips[i : i + self.batch]
            pad = 0
            if len(chunk) < self.batch:
                pad = self.batch - len(chunk)
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, 0)], 0)
            f = np.asarray(self._vis(self.params, chunk), np.float32)
            out.append(f[: len(f) - pad] if pad else f)
        return np.concatenate(out, 0)

    def text_features(self, queries) -> np.ndarray:
        toks = tokenize(list(queries))
        return np.asarray(self._txt(self.params, toks), np.float32)

    def extract_to_dir(self, samples, video_root: str, out_dir: str):
        """samples: iterable of dicts {video_uid, query, ...}; writes
        ``feat_<i>.npz`` like the reference's per-sample ``feat_*.pt``."""
        os.makedirs(out_dir, exist_ok=True)
        vid_cache = {}
        for i, s in enumerate(samples):
            vid = s["video_uid"]
            if vid not in vid_cache:
                vid_cache = {vid: self.video_features(
                    osp.join(video_root, f"{vid}.mp4"))}
            np.savez(
                osp.join(out_dir, f"feat_{i}.npz"),
                video=vid_cache[vid],
                text=self.text_features([s["query"]])[0],
            )
