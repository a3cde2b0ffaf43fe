"""CLI: extract NLQ features with a pretrained dual encoder.

Counterpart of ``egonlq/extract_features.py`` + the extraction half of
``egonlq/main.py``.

Usage::

    python -m avion_tpu.egonlq.extract_features \
        --ckpt runs/pretrain/ckpt --model CLIP_VITB16 \
        --annotations nlq_train.json --video-root /data/ego4d_full \
        --out features/train

With ``--legacy`` the extractor is the EgoVLP FrozenInTime dual
encoder loaded from a released ``.pth`` (``egonlq/egovlp.py``;
reference extractor: ``egonlq/extract_features.py`` +
``egonlq/model/model.py:263-296``); query text is tokenized in-repo
with the RoBERTa byte-level BPE (``--tokenizer-dir``: a local
HF-format directory with vocab.json + merges.txt).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--model", default="CLIP_VITB16")
    p.add_argument("--annotations", required=True)
    p.add_argument("--video-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--clip-length", type=int, default=4)
    p.add_argument("--window-sec", type=float, default=2.0)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--legacy", action="store_true",
                   help="EgoVLP FrozenInTime extractor from a released "
                        ".pth checkpoint (--ckpt) instead of the native "
                        "CLIP tower")
    p.add_argument("--tokenizer-dir", default=None,
                   help="local HF-format RoBERTa tokenizer dir "
                        "(vocab.json + merges.txt) for --legacy text")
    args = p.parse_args(argv)
    if args.legacy and not args.tokenizer_dir:
        # fail here, not minutes later after the first video's full
        # windowed sweep when text_features first needs the tokenizer
        p.error("--legacy requires --tokenizer-dir (raw-text queries "
                "need the RoBERTa BPE)")

    from avion_tpu.egonlq.nlq_dataset import parse_nlq_annotations

    samples = parse_nlq_annotations(args.annotations)

    if args.legacy:
        from avion_tpu.data.roberta_tokenizer import load_roberta_tokenizer
        from avion_tpu.egonlq.egovlp import (
            EgoVLPFeatureExtractor,
            load_egovlp_checkpoint,
        )

        model, params = load_egovlp_checkpoint(
            args.ckpt, num_frames=args.clip_length)
        tokenizer = load_roberta_tokenizer(args.tokenizer_dir)
        fx = EgoVLPFeatureExtractor(
            model, params, tokenizer=tokenizer,
            clip_length=args.clip_length, window_sec=args.window_sec,
            crop_size=model.image_size, batch=args.batch)
    else:
        import jax
        import jax.numpy as jnp

        from avion_tpu.egonlq.features import FeatureExtractor
        from avion_tpu.models import create_model
        from avion_tpu.train.common import load_pretrained_params

        model = create_model(args.model, num_frames=args.clip_length)
        video = jnp.zeros((1, args.clip_length, model.image_size,
                           model.image_size, 3), jnp.bfloat16)
        text = jnp.zeros((1, model.context_length), jnp.int32)
        template = jax.jit(model.init)(jax.random.PRNGKey(0), video,
                                       text)["params"]
        params = load_pretrained_params(args.ckpt, template,
                                        num_frames=args.clip_length)
        fx = FeatureExtractor(model, params, clip_length=args.clip_length,
                              window_sec=args.window_sec,
                              crop_size=model.image_size, batch=args.batch)
    fx.extract_to_dir(samples, args.video_root, args.out)
    print(f"extracted features for {len(samples)} samples to {args.out}")


if __name__ == "__main__":
    main()
