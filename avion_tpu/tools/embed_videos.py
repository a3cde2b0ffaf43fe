"""Batch inference: CLIP embeddings for videos and/or texts.

The serving-side entry: encode a directory (or list file) of videos
and/or a text file of captions with a trained dual encoder, writing
.npz archives — the building block for retrieval serving, nearest-
neighbor search, and the EgoNLQ feature stage.

Usage::

    python -m avion_tpu.tools.embed_videos \
        --ckpt runs/pretrain/ckpt --model CLIP_VITB16 \
        --videos /data/clips --out embeds.npz \
        --texts captions.txt --clip-length 4
"""

from __future__ import annotations

import argparse
import glob
import os.path as osp
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--model", default="CLIP_VITB16")
    p.add_argument("--videos", default="")
    p.add_argument("--texts", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--clip-length", type=int, default=4)
    p.add_argument("--crop-size", type=int, default=224)
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from avion_tpu.data.sampling import get_frame_ids
    from avion_tpu.data.transforms import center_crop_spec
    from avion_tpu.data.video_reader import DecodeError, VideoReader
    from avion_tpu.eval.runners import CLIPEncoders
    from avion_tpu.models import create_model
    from avion_tpu.train.common import load_pretrained_params

    model = create_model(args.model, num_frames=args.clip_length)
    video = jnp.zeros((1, args.clip_length, model.image_size,
                       model.image_size, 3), jnp.bfloat16)
    text = jnp.zeros((1, model.context_length), jnp.int32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), video, text)["params"]
    params = load_pretrained_params(args.ckpt, template,
                                    num_frames=args.clip_length)
    enc = CLIPEncoders(model, params, batch=args.batch)

    out = {}
    if args.videos:
        paths = (sorted(glob.glob(osp.join(args.videos, "*.mp4")))
                 if osp.isdir(args.videos)
                 else [l.strip() for l in open(args.videos) if l.strip()])
        clips, names = [], []
        for path in paths:
            try:
                vr = VideoReader(path)
                ids = get_frame_ids(0, len(vr), args.clip_length, jitter=False)
                crop = center_crop_spec(vr.width, vr.height)
                clips.append(vr.get_batch(ids, crop,
                                          (args.crop_size, args.crop_size)))
                names.append(osp.basename(path))
            except DecodeError as e:
                print(f"skip {path}: {e}", file=sys.stderr)
        if clips:
            out["video_embeds"] = enc.encode_images(np.stack(clips))
            out["video_names"] = np.array(names)
    if args.texts:
        from avion_tpu.data.tokenizer import tokenize

        lines = [l.strip() for l in open(args.texts) if l.strip()]
        out["text_embeds"] = enc.encode_texts(tokenize(lines))
        out["texts"] = np.array(lines)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: " + ", ".join(
        f"{k}={v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    main()
