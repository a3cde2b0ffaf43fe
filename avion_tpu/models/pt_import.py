"""Import PyTorch ``.pt`` checkpoints (reference / OpenAI CLIP / open_clip)
into the flax parameter tree.

Read-side drop-in compatibility with the reference checkpoint layouts
(``avion/models/utils.py:15-98``, ``avion/utils/distributed.py:59-73``):

- AVION checkpoints: ``{epoch, state_dict ('module.'-prefixed), ...}``
  with flash-attn fused ``attn.Wqkv`` or unfused ``attn.in_proj_*`` keys.
- OpenAI CLIP: ``visual.*`` + top-level text tower (``transformer.*``,
  ``token_embedding``, ``ln_final``, ``positional_embedding``,
  ``text_projection``).
- VideoMAE checkpoints (``model`` or ``module`` key, q/v-split biases).

Conventions handled:
- torch Linear ``weight`` is [out, in] → flax ``kernel`` [in, out];
- conv1 [width, C, p, p] → channel-last patchify kernel
  [(p p C), width] (our patch vector is (sh, sw, c); the reference's
  fast path is (c, sh, sw) — ``transformer.py:319`` — so axes are
  permuted, not just flattened);
- context-length / vocab padding (``models/utils.py:75-95``);
- temporal positional-embedding inflation for clip-length changes
  (``inflate_positional_embeds``, ``models/utils.py:101-147``);
- q/v-split bias → fused qkv bias with zero k (softmax-invariant).

Uses torch (CPU) only on the host for unpickling.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def load_pt_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("state_dict", "model", "module"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    state = {}
    for k, v in obj.items():
        k = k[len("module."):] if k.startswith("module.") else k
        state[k] = v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
    return state


def _t(w):  # torch linear weight -> flax kernel
    return np.ascontiguousarray(w.T)


def _set(tree, path, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value, np.float32)


def _conv1_to_kernel(w: np.ndarray) -> np.ndarray:
    """[width, C, p, p] or [width, C*p*p] (c,p,p order) -> [(p p C), width]."""
    if w.ndim == 2:
        width, cpp = w.shape
        c = 3
        p = int(round((cpp // c) ** 0.5))
        w = w.reshape(width, c, p, p)
    w = w.transpose(0, 2, 3, 1)  # width, p, p, C
    return _t(w.reshape(w.shape[0], -1))


def _tube_embed_to_kernel(w: np.ndarray) -> np.ndarray:
    """VideoMAE patch embed [width, C, ts, p, p] or flattened (c,ts,p,p
    order) -> [(ts p p C), width] matching tube_patchify ordering."""
    if w.ndim == 2:
        width, flat = w.shape
        c, ts = 3, 2
        p = int(round((flat // (c * ts)) ** 0.5))
        w = w.reshape(width, c, ts, p, p)
    w = w.transpose(0, 2, 3, 4, 1)  # width, ts, p, p, C
    return _t(w.reshape(w.shape[0], -1))


def _import_block(state, prefix: str, out, out_prefix: str):
    """One transformer block: ln_1/ln_2, fused-or-split qkv, out_proj, mlp."""
    def has(k):
        return f"{prefix}.{k}" in state

    def get(k):
        return state[f"{prefix}.{k}"]

    _set(out, f"{out_prefix}/ln_1/norm/scale", get("ln_1.weight"))
    _set(out, f"{out_prefix}/ln_1/norm/bias", get("ln_1.bias"))
    _set(out, f"{out_prefix}/ln_2/norm/scale", get("ln_2.weight"))
    _set(out, f"{out_prefix}/ln_2/norm/bias", get("ln_2.bias"))

    if has("attn.Wqkv.weight"):
        wqkv, bqkv = get("attn.Wqkv.weight"), get("attn.Wqkv.bias")
    elif has("attn.in_proj_weight"):
        wqkv, bqkv = get("attn.in_proj_weight"), get("attn.in_proj_bias")
    elif has("attn.qkv.weight"):
        wqkv = get("attn.qkv.weight")
        if has("attn.qkv.bias"):
            bqkv = get("attn.qkv.bias")
        else:  # VideoMAE split q/v bias, no k bias (softmax-invariant)
            dim = wqkv.shape[0] // 3
            q_b = get("attn.q_bias") if has("attn.q_bias") else np.zeros(dim)
            v_b = get("attn.v_bias") if has("attn.v_bias") else np.zeros(dim)
            bqkv = np.concatenate([q_b, np.zeros(dim, np.float32), v_b])
    else:
        raise KeyError(f"no qkv weights under {prefix}")
    _set(out, f"{out_prefix}/attn/qkv/kernel", _t(wqkv))
    _set(out, f"{out_prefix}/attn/qkv/bias", bqkv)
    proj_key = "attn.out_proj" if has("attn.out_proj.weight") else "attn.proj"
    _set(out, f"{out_prefix}/attn/out_proj/kernel", _t(get(f"{proj_key}.weight")))
    _set(out, f"{out_prefix}/attn/out_proj/bias", get(f"{proj_key}.bias"))

    fc1 = "mlp.fc1" if has("mlp.fc1.weight") else "mlp.c_fc"
    fc2 = "mlp.fc2" if has("mlp.fc2.weight") else "mlp.c_proj"
    _set(out, f"{out_prefix}/mlp/fc1/kernel", _t(get(f"{fc1}.weight")))
    _set(out, f"{out_prefix}/mlp/fc1/bias", get(f"{fc1}.bias"))
    _set(out, f"{out_prefix}/mlp/fc2/kernel", _t(get(f"{fc2}.weight")))
    _set(out, f"{out_prefix}/mlp/fc2/bias", get(f"{fc2}.bias"))


def _n_blocks(state, pattern: str) -> int:
    ids = {
        int(m.group(1))
        for k in state
        for m in [re.match(pattern, k)]
        if m
    }
    return max(ids) + 1 if ids else 0


def _inflate_temporal(emb: np.ndarray, num_frames: int) -> np.ndarray:
    """Linear-interp temporal pos embed across clip-length changes
    (``models/utils.py:101-147``, ``main_lavila_pretrain.py:348-364``)."""
    t_old = emb.shape[0]
    if t_old == num_frames:
        return emb
    xs = np.linspace(0, t_old - 1, num_frames)
    lo = np.floor(xs).astype(int)
    hi = np.minimum(lo + 1, t_old - 1)
    frac = (xs - lo)[:, None]
    return emb[lo] * (1 - frac) + emb[hi] * frac


def import_clip_pt(
    path_or_state,
    num_frames: int = 16,
    context_length: int = 77,
    vocab_size: int = 49408,
) -> Dict[str, Any]:
    """Build the flax CLIP params dict from a .pt checkpoint."""
    state = (
        load_pt_state_dict(path_or_state)
        if isinstance(path_or_state, str)
        else dict(path_or_state)
    )
    out: Dict[str, Any] = {}

    openai_text = "transformer.resblocks.0.ln_1.weight" in state
    tp = "" if openai_text else "textual."

    # --- visual tower ---
    _set(out, "visual/class_embedding", state["visual.class_embedding"])
    _set(out, "visual/positional_embedding", state["visual.positional_embedding"])
    if "visual.temporal_embedding" in state:
        _set(out, "visual/temporal_embedding",
             _inflate_temporal(state["visual.temporal_embedding"], num_frames))
    _set(out, "visual/conv1/kernel", _conv1_to_kernel(state["visual.conv1.weight"]))
    _set(out, "visual/ln_pre/norm/scale", state["visual.ln_pre.weight"])
    _set(out, "visual/ln_pre/norm/bias", state["visual.ln_pre.bias"])
    n_v = _n_blocks(state, r"visual\.transformer\.resblocks\.(\d+)\.")
    for i in range(n_v):
        _import_block(state, f"visual.transformer.resblocks.{i}", out,
                      f"visual/transformer/resblocks_{i}")
    _set(out, "visual/ln_post/norm/scale", state["visual.ln_post.weight"])
    _set(out, "visual/ln_post/norm/bias", state["visual.ln_post.bias"])
    for k in ("visual.proj", "visual.image_projection", "image_projection"):
        if k in state:
            _set(out, "visual/proj", state[k])
            break

    # --- text tower ---
    _set(out, "textual/token_embedding/embedding",
         _pad_rows(state[f"{tp}token_embedding.weight"], vocab_size))
    _set(out, "textual/positional_embedding",
         _pad_rows(state[f"{tp}positional_embedding"
                         if not openai_text else "positional_embedding"],
                   context_length))
    n_t = _n_blocks(
        state,
        (r"transformer\.resblocks\.(\d+)\." if openai_text
         else r"textual\.transformer\.resblocks\.(\d+)\."),
    )
    for i in range(n_t):
        src = (f"transformer.resblocks.{i}" if openai_text
               else f"textual.transformer.resblocks.{i}")
        _import_block(state, src, out, f"textual/transformer/resblocks_{i}")
    _set(out, "textual/ln_final/norm/scale", state[f"{tp}ln_final.weight"])
    _set(out, "textual/ln_final/norm/bias", state[f"{tp}ln_final.bias"])
    for k in ("text_projection", "textual.text_projection"):
        if k in state:
            _set(out, "textual/text_projection", state[k])
            break
    _set(out, "logit_scale", state["logit_scale"].reshape(()))
    return out


def _pad_rows(x: np.ndarray, n: int) -> np.ndarray:
    if x.shape[0] == n:
        return x
    if x.shape[0] > n:
        return x[:n]
    return np.concatenate(
        [x, np.zeros((n - x.shape[0], x.shape[1]), x.dtype)], axis=0
    )


def import_videomae_pt(path_or_state) -> Dict[str, Any]:
    """VideoMAE finetune-format checkpoint → FinetuneVideoMAE params."""
    state = (
        load_pt_state_dict(path_or_state)
        if isinstance(path_or_state, str)
        else dict(path_or_state)
    )
    out: Dict[str, Any] = {}
    pe = "patch_embed.proj.weight"
    if pe in state:
        _set(out, "patch_embed/kernel", _tube_embed_to_kernel(state[pe]))
        _set(out, "patch_embed/bias", state["patch_embed.proj.bias"])
    n = _n_blocks(state, r"blocks\.(\d+)\.")
    for i in range(n):
        _import_block_videomae(state, f"blocks.{i}", out,
                               f"encoder/resblocks_{i}")
    for src, dst in (("fc_norm", "fc_norm/norm"), ("norm", "fc_norm/norm")):
        if f"{src}.weight" in state:
            _set(out, f"{dst}/scale", state[f"{src}.weight"])
            _set(out, f"{dst}/bias", state[f"{src}.bias"])
            break
    if "head.weight" in state:
        _set(out, "head/kernel", _t(state["head.weight"]))
        _set(out, "head/bias", state["head.bias"])
    return out


def _import_block_videomae(state, prefix, out, out_prefix):
    def has(k):
        return f"{prefix}.{k}" in state

    def get(k):
        return state[f"{prefix}.{k}"]

    _set(out, f"{out_prefix}/ln_1/norm/scale", get("norm1.weight"))
    _set(out, f"{out_prefix}/ln_1/norm/bias", get("norm1.bias"))
    _set(out, f"{out_prefix}/ln_2/norm/scale", get("norm2.weight"))
    _set(out, f"{out_prefix}/ln_2/norm/bias", get("norm2.bias"))
    if has("attn.Wqkv.weight"):
        w = get("attn.Wqkv.weight")
        b = get("attn.Wqkv.bias")
    else:
        w = get("attn.qkv.weight")
        dim = w.shape[0] // 3
        if has("attn.qkv.bias"):
            b = get("attn.qkv.bias")
        else:
            q_b = get("attn.q_bias") if has("attn.q_bias") else np.zeros(dim, np.float32)
            v_b = get("attn.v_bias") if has("attn.v_bias") else np.zeros(dim, np.float32)
            b = np.concatenate([q_b, np.zeros(dim, np.float32), v_b])
    _set(out, f"{out_prefix}/attn/qkv/kernel", _t(w))
    _set(out, f"{out_prefix}/attn/qkv/bias", b)
    _set(out, f"{out_prefix}/attn/out_proj/kernel", _t(get("attn.proj.weight")))
    _set(out, f"{out_prefix}/attn/out_proj/bias", get("attn.proj.bias"))
    _set(out, f"{out_prefix}/mlp/fc1/kernel", _t(get("mlp.fc1.weight")))
    _set(out, f"{out_prefix}/mlp/fc1/bias", get("mlp.fc1.bias"))
    _set(out, f"{out_prefix}/mlp/fc2/kernel", _t(get("mlp.fc2.weight")))
    _set(out, f"{out_prefix}/mlp/fc2/bias", get("mlp.fc2.bias"))


def merge_into_params(init_params: Dict[str, Any], imported: Dict[str, Any],
                      strict: bool = True, verbose: bool = True) -> Dict[str, Any]:
    """Overlay imported arrays onto an init param tree (shape-checked)."""
    import jax

    from avion_tpu.parallel.pipeline import adapt_stacked_layouts

    # sequential resblocks_{i} <-> stacked pipeline layout conversion
    # (loading a sequentially-trained ckpt into a pipelined model etc.)
    imported = adapt_stacked_layouts(imported, init_params)

    stats = {"loaded": 0, "skipped": []}

    def walk(dst, src, path=""):
        for k, v in src.items():
            if k not in dst:
                if strict:
                    raise KeyError(f"imported key {path}/{k} not in model")
                stats["skipped"].append(f"{path}/{k}")
                continue
            if isinstance(v, dict):
                walk(dst[k], v, f"{path}/{k}")
            else:
                have = np.shape(dst[k])
                want = np.shape(v)
                if have != want:
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: model {have} vs ckpt {want}"
                    )
                dst[k] = np.asarray(v, np.float32)
                stats["loaded"] += 1

    out = jax.tree_util.tree_map(np.asarray, init_params)
    walk(out, imported)
    if stats["loaded"] == 0 and imported:
        # nothing matched: with strict=False every key was skipped and
        # the caller would silently train from the fresh-init template
        # believing it loaded pretrained weights
        raise ValueError(
            f"checkpoint overlay matched 0 tensors "
            f"(skipped e.g. {stats['skipped'][:5]})")
    if verbose:
        msg = f"[pt_import] loaded {stats['loaded']} tensors"
        if stats["skipped"]:
            msg += (f"; skipped {len(stats['skipped'])} unknown keys "
                    f"(e.g. {stats['skipped'][:3]})")
        print(msg)
    return out
