"""Pseudo-narration generation (the LaViLa-narrator stage).

Counterpart of ``second_party/lavilla_narrator/main.py``: run a video
captioning model over fixed windows of unlabeled video to generate
pseudo-narrations, producing the LLM-augmented training pkl that gives
the reference its "33.2 mAP @ 260 GPU-h" configuration
(``README.md:31-36``).

The reference vendors a full VCLM (TimeSformer-L + gated-cross-attn
GPT-2 XL, ~6k LoC).  Here the captioner is pluggable:

- ``caption_fn(frames: np.ndarray) -> List[str]`` — any callable that
  maps a [T, H, W, 3] uint8 clip to candidate narrations (nucleus
  samples).  ``hf_captioner`` builds one from a HuggingFace
  image/video-to-text checkpoint when transformers weights are
  available; an HTTP client against a serving endpoint also fits.

The windowing, decode, dedup, and output-format logic (the part that
defines dataset semantics) is fully implemented and tested.
"""

from __future__ import annotations

import os.path as osp
import pickle
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from avion_tpu.data.sampling import get_frame_ids
from avion_tpu.data.video_reader import CropSpec, VideoReader


def narrate_video(
    path: str,
    caption_fn: Callable[[np.ndarray], List[str]],
    *,
    window_sec: float = 4.0,
    stride_sec: float = 2.0,
    clip_length: int = 4,
    crop_size: int = 224,
    dedup_threshold: float = 0.9,
) -> List[Tuple[float, float, List[str]]]:
    """Slide a window over one video; returns (start, end, narrations)
    per window with near-duplicate consecutive captions collapsed."""
    vr = VideoReader(path)
    fps = vr.get_avg_fps() or 30.0
    n = len(vr)
    duration = n / fps
    out: List[Tuple[float, float, List[str]]] = []
    t = 0.0
    prev: Optional[List[str]] = None
    while t < duration:
        end = min(t + window_sec, duration)
        ids = get_frame_ids(int(t * fps), int(end * fps),
                            num_segments=clip_length, jitter=False)
        frames = vr.get_batch(ids, CropSpec(), (crop_size, crop_size))
        caps = caption_fn(frames)
        if prev is not None and caps and prev and _overlap(caps[0], prev[0]) >= dedup_threshold:
            s0, _, caps0 = out[-1]
            out[-1] = (s0, end, caps0)
        else:
            out.append((t, end, caps))
        prev = caps
        t += stride_sec
    return out


def _overlap(a: str, b: str) -> float:
    ta, tb = set(a.lower().split()), set(b.lower().split())
    if not ta or not tb:
        return 0.0
    return len(ta & tb) / len(ta | tb)


def narrate_dataset(
    video_paths: Sequence[str],
    caption_fn,
    output_pkl: str,
    **kwargs,
) -> int:
    """Produce the training-pkl format consumed by the pretrain entry:
    rows of (video_id, start_sec, end_sec, [narrations])."""
    rows = []
    for path in video_paths:
        vid = osp.splitext(osp.basename(path))[0]
        for start, end, caps in narrate_video(path, caption_fn, **kwargs):
            rows.append((vid, start, end, caps))
    with open(output_pkl, "wb") as f:
        pickle.dump(rows, f)
    return len(rows)


def vclm_captioner(model, params, *, num_samples: int = 3,
                   max_len: int = 30, top_p: float = 0.95,
                   temperature: float = 0.7, seed: int = 0):
    """Build a caption_fn from this framework's native VCLM narrator
    (``avion_tpu/models/narrator.py``) — the in-repo counterpart of the
    reference's TimeSformer+gated-GPT2 LaViLa narrator."""
    import jax
    import jax.numpy as jnp

    from avion_tpu.data.tokenizer import _default_tokenizer
    from avion_tpu.data.transforms import normalize_video
    from avion_tpu.eval.runners import cast_inference_params
    from avion_tpu.models.narrator import make_generator

    # bf16 weight storage: exact (weights cast to compute dtype at use
    # anyway) and halves the per-decode-step weight reads the cached
    # generator is bound by (docs/SERVING.md)
    params = cast_inference_params(params, model)
    tk = _default_tokenizer()
    gen = jax.jit(make_generator(model, max_len=max_len, top_p=top_p,
                                 temperature=temperature,
                                 sot=tk.sot_token, eot=tk.eot_token))
    state = {"key": jax.random.PRNGKey(seed)}

    def caption(frames: np.ndarray) -> List[str]:
        video = normalize_video(jnp.asarray(frames)[None], dtype=model.dtype)
        outs = []
        for _ in range(num_samples):
            state["key"], sub = jax.random.split(state["key"])
            toks = np.asarray(gen(params, video, sub))[0]
            ids = [int(t) for t in toks[1:]
                   if t not in (0, tk.sot_token, tk.eot_token)]
            outs.append(tk.decode(ids).strip())
        return outs

    return caption


def hf_captioner(model_name: str = "Salesforce/blip2-opt-2.7b",
                 num_samples: int = 3, device: str = "cpu"):
    """Build a caption_fn from a HuggingFace checkpoint (requires model
    weights on disk; this image has no network egress)."""
    from transformers import pipeline  # gated import

    pipe = pipeline("image-to-text", model=model_name, device=device)

    def caption(frames: np.ndarray) -> List[str]:
        from PIL import Image

        mid = Image.fromarray(frames[len(frames) // 2])
        outs = pipe(mid, generate_kwargs={
            "do_sample": True, "top_p": 0.95,
            "num_return_sequences": num_samples,
        })
        return [o["generated_text"].strip() for o in outs]

    return caption


def lavila_captioner(checkpoint: Optional[str] = None, *,
                     model_name: str =
                     "VCLM_OPENAI_TIMESFORMER_LARGE_336PX_GPT2_XL",
                     num_frames: int = 4, num_samples: int = 3,
                     max_len: int = 77, top_p: float = 0.95,
                     temperature: float = 0.7, seed: int = 0,
                     model=None, params=None, tokenizer=None):
    """Build a caption_fn from the LaViLa narrator proper
    (``models/lavila.LavilaNarrator``): TimeSformer + gated GPT-2 with
    the released checkpoint imported through
    ``models/lavila_import.import_lavila_narrator_pt``.

    The reference downloads the checkpoint in ``lavilla_narrator/
    main.py:42-49``; point ``checkpoint`` at the same .pt.  ``model`` /
    ``params`` / ``tokenizer`` may be injected directly (tests use a
    tiny narrator).  The tokenizer must expose ``__call__(text) ->
    ids`` and ``decode(ids) -> str`` with ``eos_token_id`` (GPT-2 BPE —
    ``transformers.GPT2Tokenizer`` fits; the narrator prompts with EOS,
    ``MyGPT2Tokenizer`` semantics)."""
    import jax
    import jax.numpy as jnp

    from avion_tpu.data.transforms import normalize_video
    from avion_tpu.models import create_model

    if model is None:
        model = create_model(model_name, num_frames=num_frames)
    if params is None:
        if not checkpoint:
            raise ValueError("need checkpoint=... or params=...")
        from avion_tpu.models.lavila_import import import_lavila_narrator_pt
        from avion_tpu.models.pt_import import merge_into_params

        video0 = jnp.zeros((1, num_frames, model.image_size,
                            model.image_size, 3), model.dtype)
        text0 = jnp.zeros((1, 8), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), video0, text0)["params"]
        params = merge_into_params(
            params, import_lavila_narrator_pt(checkpoint), strict=False)
    if tokenizer is None:
        from transformers import GPT2Tokenizer

        tokenizer = GPT2Tokenizer.from_pretrained("gpt2")
    bos = getattr(tokenizer, "eos_token_id", 50256)  # GPT-2: BOS == EOS

    from avion_tpu.eval.runners import cast_inference_params

    params = cast_inference_params(params, model)  # exact; see SERVING.md

    @jax.jit
    def _generate(params, video, rng):
        return model.apply({"params": params}, video,
                           jnp.full((1, 1), bos, jnp.int32),
                           method=model.generate, max_len=max_len,
                           temperature=temperature, top_p=top_p, rng=rng)

    state = {"key": jax.random.PRNGKey(seed)}

    def caption(frames: np.ndarray) -> List[str]:
        video = normalize_video(jnp.asarray(frames)[None],
                                dtype=model.dtype)
        outs = []
        for _ in range(num_samples):
            state["key"], sub = jax.random.split(state["key"])
            ids = np.asarray(_generate(params, video, sub))[0].tolist()
            # strip the BOS prompt; cut at the first EOS after it
            ids = ids[1:]
            if bos in ids:
                ids = ids[: ids.index(bos)]
            outs.append(tokenizer.decode(ids).strip())
        return outs

    return caption
