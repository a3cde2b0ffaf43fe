"""LaViLa narrator checkpoint importer: released VCLM .pt (TimeSformer
+ gated GPT-2 XL, ``second_party/lavilla_narrator``) -> flax params for
``models/lavila.LavilaNarrator``.

Layout facts the mapping relies on:
- torch ``nn.Linear`` stores weight [out, in] -> transpose to the flax
  kernel;  HF GPT-2 ``Conv1D`` stores [in, out] -> copy as-is.
- TimeSformer ``patch_embed.proj`` is a Conv2d [D, C, p, p]; flattening
  to [(C p p), D] matches our channel-first Dense patchify.
- coca-style pool LayerNorms are gamma-only (beta is a zero buffer).
- the decoder's ``lm_head.weight`` is tied to ``wte`` (skipped).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from avion_tpu.models.pt_import import load_pt_state_dict


def _t(w):
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def _f(w):
    return np.asarray(w, np.float32)


def _set(tree: Dict, path: str, value):
    parts = path.split("/")
    for p in parts[:-1]:
        tree = tree.setdefault(p, {})
    tree[parts[-1]] = value


def _linear(state, src, out, dst, transpose=True):
    w = state[f"{src}.weight"]
    _set(out, f"{dst}/kernel", _t(w) if transpose else _f(w))
    if f"{src}.bias" in state:
        _set(out, f"{dst}/bias", _f(state[f"{src}.bias"]))


def _ln(state, src, out, dst, gamma_only=False):
    _set(out, f"{dst}/scale", _f(state[f"{src}.weight" if not gamma_only
                                       else f"{src}.gamma"]))
    if not gamma_only:
        _set(out, f"{dst}/bias", _f(state[f"{src}.bias"]))
    else:
        _set(out, f"{dst}/bias",
             np.zeros_like(_f(state[f"{src}.gamma"])))


def import_lavila_narrator_pt(path_or_state: Any) -> Dict[str, Any]:
    """Returns a flax param subtree matching ``LavilaNarrator``."""
    if isinstance(path_or_state, dict):
        state = {k: np.asarray(v) for k, v in path_or_state.items()}
    else:
        state = load_pt_state_dict(path_or_state)
    state = {k[len("module."):] if k.startswith("module.") else k: v
             for k, v in state.items()}
    out: Dict[str, Any] = {}

    # ---- vision tower (SpaceTimeTransformer) -----------------------------
    pw = state["visual.patch_embed.proj.weight"]  # [D, C, p, p]
    d_out = pw.shape[0]
    _set(out, "visual/patch_embed/kernel",
         _f(pw).reshape(d_out, -1).T.copy())
    if "visual.patch_embed.proj.bias" in state:
        _set(out, "visual/patch_embed/bias",
             _f(state["visual.patch_embed.proj.bias"]))
    _set(out, "visual/cls_token",
         _f(state["visual.cls_token"]).reshape(-1))
    _set(out, "visual/pos_embed",
         _f(state["visual.pos_embed"]).reshape(-1, d_out))
    _set(out, "visual/temporal_embed",
         _f(state["visual.temporal_embed"]).reshape(-1, d_out))
    if "visual.ln_pre.weight" in state:
        _ln(state, "visual.ln_pre", out, "visual/ln_pre")
    _ln(state, "visual.norm", out, "visual/norm")
    n_blocks = 1 + max(int(k.split(".")[2]) for k in state
                       if k.startswith("visual.blocks."))
    for i in range(n_blocks):
        src = f"visual.blocks.{i}"
        dst = f"visual/blocks_{i}"
        for ln_name in ("norm1", "norm2", "norm3"):
            _ln(state, f"{src}.{ln_name}", out, f"{dst}/{ln_name}")
        for attn in ("attn", "timeattn"):
            _linear(state, f"{src}.{attn}.qkv", out, f"{dst}/{attn}/qkv")
            _linear(state, f"{src}.{attn}.proj", out, f"{dst}/{attn}/proj")
        _linear(state, f"{src}.mlp.fc1", out, f"{dst}/mlp_fc1")
        _linear(state, f"{src}.mlp.fc2", out, f"{dst}/mlp_fc2")
        if f"{src}.alpha_timeattn" in state:
            _set(out, f"{dst}/alpha_timeattn",
                 _f(state[f"{src}.alpha_timeattn"]).reshape(()))

    # ---- query pool -------------------------------------------------------
    _set(out, "img_queries", _f(state["img_queries"]))
    _ln(state, "img_attn_pool.norm", out, "img_attn_pool/norm",
        gamma_only=True)
    _ln(state, "img_attn_pool.context_norm", out,
        "img_attn_pool/context_norm", gamma_only=True)
    for lin in ("to_q", "to_kv", "to_out"):
        _linear(state, f"img_attn_pool.{lin}", out, f"img_attn_pool/{lin}")
    _ln(state, "img_attn_pool_norm", out, "img_attn_pool_norm",
        gamma_only=True)

    # ---- text decoder (gated GPT-2) ----------------------------------------
    td = "text_decoder.transformer"
    _set(out, "text_decoder/wte", _f(state[f"{td}.wte.weight"]))
    _set(out, "text_decoder/wpe", _f(state[f"{td}.wpe.weight"]))
    _ln(state, f"{td}.ln_f", out, "text_decoder/ln_f")
    n_layers = 1 + max(int(k.split(".")[3]) for k in state
                       if k.startswith(f"{td}.h."))
    for i in range(n_layers):
        src = f"{td}.h.{i}"
        dst = f"text_decoder/h_{i}"
        _ln(state, f"{src}.ln_1", out, f"{dst}/ln_1")
        _ln(state, f"{src}.ln_2", out, f"{dst}/ln_2")
        # HF Conv1D: [in, out] — no transpose
        _linear(state, f"{src}.attn.c_attn", out, f"{dst}/attn/c_attn",
                transpose=False)
        _linear(state, f"{src}.attn.c_proj", out, f"{dst}/attn/c_proj",
                transpose=False)
        _linear(state, f"{src}.mlp.c_fc", out, f"{dst}/mlp/c_fc",
                transpose=False)
        _linear(state, f"{src}.mlp.c_proj", out, f"{dst}/mlp/c_proj",
                transpose=False)
        if f"{src}.crossattention.q_attn.weight" in state:
            for lin in ("q_attn", "c_attn", "c_proj"):
                _linear(state, f"{src}.crossattention.{lin}", out,
                        f"{dst}/crossattention/{lin}", transpose=False)
            _ln(state, f"{src}.ln_cross_attn", out, f"{dst}/ln_cross_attn")
            _ln(state, f"{src}.ln_2_crossattention", out,
                f"{dst}/ln_2_crossattention")
            _linear(state, f"{src}.mlp_crossattention.c_fc", out,
                    f"{dst}/mlp_crossattention/c_fc", transpose=False)
            _linear(state, f"{src}.mlp_crossattention.c_proj", out,
                    f"{dst}/mlp_crossattention/c_proj", transpose=False)
            for a in ("alpha_cattn", "alpha_dense"):
                if f"{src}.{a}" in state:
                    _set(out, f"{dst}/{a}",
                         _f(state[f"{src}.{a}"]).reshape(()))
    print(f"[lavila_import] mapped {len(state)} tensors "
          f"({n_blocks} vision blocks, {n_layers} decoder layers)")
    return out
