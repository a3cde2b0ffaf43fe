"""Two-way checkpoint conversion: reference ``.pt`` <-> this framework.

Import (``.pt`` → flax params) is the primary direction
(``avion_tpu/models/pt_import.py``); this tool adds the reverse so
models trained here can be evaluated by the reference's torch code —
full drop-in interop both ways.

Usage::

    # torch -> orbax-loadable numpy archive
    python -m avion_tpu.tools.convert_checkpoint import \
        --src ckpt.pt --dst params.npz --model CLIP_VITB16 --frames 4

    # our params -> reference-layout .pt
    python -m avion_tpu.tools.convert_checkpoint export \
        --src runs/x/ckpt --dst avion_ckpt.pt --model CLIP_VITB16 --frames 4
"""

from __future__ import annotations

import argparse
import sys
from typing import Any, Dict

import numpy as np


def flatten_params(tree: Dict[str, Any], prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def export_clip_to_pt(params: Dict[str, Any], path: str):
    """Write a reference-layout state dict (flash-attn style names:
    Wqkv / out_proj / mlp.fc1/fc2 — the layout the reference's finetune
    scripts load, ``avion/models/utils.py``)."""
    import torch

    flat = flatten_params(params)
    sd = {}

    def t(x):  # flax kernel [in, out] -> torch weight [out, in]
        return torch.from_numpy(np.array(np.asarray(x).T))

    def raw(x):
        return torch.from_numpy(np.array(np.asarray(x)))

    for key, val in flat.items():
        parts = key.split("/")
        if parts[0] == "visual":
            base = "visual"
            rest = parts[1:]
        elif parts[0] == "textual":
            base = "textual"
            rest = parts[1:]
        else:
            if key == "logit_scale":
                sd["logit_scale"] = raw(val)
            continue
        if rest[0] == "conv1":
            width = val.shape[1]
            p = int(round((val.shape[0] // 3) ** 0.5))
            w = np.asarray(val).T.reshape(width, p, p, 3).transpose(0, 3, 1, 2)
            sd["visual.conv1.weight"] = raw(w)
        elif rest[0] in ("class_embedding", "positional_embedding",
                         "temporal_embedding"):
            sd[f"{base}.{rest[0]}"] = raw(val)
        elif rest[0] == "proj":
            sd["image_projection"] = raw(val)
        elif rest[0] == "text_projection":
            sd["text_projection"] = raw(val)
        elif rest[0] == "token_embedding":
            sd["textual.token_embedding.weight"] = raw(val)
        elif rest[0] in ("ln_pre", "ln_post", "ln_final"):
            which = "weight" if rest[-1] == "scale" else "bias"
            sd[f"{base}.{rest[0]}.{which}"] = raw(val)
        elif rest[0] == "transformer":
            blk = rest[1].replace("resblocks_", "resblocks.")
            tail = rest[2:]
            pre = f"{base}.transformer.{blk}"
            if tail[0] in ("ln_1", "ln_2"):
                which = "weight" if tail[-1] == "scale" else "bias"
                sd[f"{pre}.{tail[0]}.{which}"] = raw(val)
            elif tail[0] == "attn" and tail[1] == "qkv":
                name = "weight" if tail[2] == "kernel" else "bias"
                sd[f"{pre}.attn.Wqkv.{name}"] = (
                    t(val) if name == "weight" else raw(val))
            elif tail[0] == "attn" and tail[1] == "out_proj":
                name = "weight" if tail[2] == "kernel" else "bias"
                sd[f"{pre}.attn.out_proj.{name}"] = (
                    t(val) if name == "weight" else raw(val))
            elif tail[0] == "mlp":
                name = "weight" if tail[2] == "kernel" else "bias"
                sd[f"{pre}.mlp.{tail[1]}.{name}"] = (
                    t(val) if name == "weight" else raw(val))
    torch.save({"state_dict": sd}, path)
    return len(sd)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    p = argparse.ArgumentParser()
    p.add_argument("direction", choices=["import", "export"])
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--model", default="CLIP_VITB16")
    p.add_argument("--frames", type=int, default=4)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from avion_tpu.models import create_model

    model = create_model(args.model, num_frames=args.frames,
                         use_flash_attn=False)
    video = jnp.zeros((1, args.frames, model.image_size, model.image_size, 3))
    text = jnp.zeros((1, model.context_length), jnp.int32)
    template = model.init(jax.random.PRNGKey(0), video, text)["params"]

    if args.direction == "import":
        from avion_tpu.models.pt_import import import_clip_pt, merge_into_params

        imported = import_clip_pt(args.src, num_frames=args.frames,
                                  context_length=model.context_length,
                                  vocab_size=model.vocab_size)
        params = merge_into_params(template, imported, strict=False)
        flat = flatten_params(params)
        np.savez(args.dst, **flat)
        print(f"wrote {len(flat)} arrays to {args.dst}")
    else:
        from avion_tpu.train.common import load_pretrained_params

        params = load_pretrained_params(args.src, template,
                                        num_frames=args.frames)
        n = export_clip_to_pt(params, args.dst)
        print(f"wrote {n} tensors to {args.dst}")


if __name__ == "__main__":
    main()
