"""EgoVLP(v2) legacy feature extractor — FrozenInTime in flax.

Re-implementation of the reference's legacy NLQ feature path kept for
compatibility with released EgoVLP checkpoints:

- ``egonlq/model/model.py:46-339`` ``FrozenInTime`` — SpaceTimeTransformer
  video tower + RoBERTa-base text tower + 4096-dim "minimal" projection
  MLPs.  Only the feature surface is reproduced (``compute_video`` /
  ``compute_text``, ``model.py:263-296``); the ITM/MLM FIBER fusion
  heads are EgoVLP *training* machinery and play no part in feature
  extraction, so their checkpoint entries are skipped on import.
- ``egonlq/model/video_transformer.py:231-404`` ``SpaceTimeTransformer``
  — the frozen-in-time divided space-time ViT, shared with the LaViLa
  narrator tower and reused here from ``models/timesformer.py`` (same
  block semantics; EgoVLP differs only in no ln_pre, exact-erf GELU,
  and torch-default LayerNorm eps 1e-5).
- ``egonlq/model/roberta.py`` RoBERTa-base — implemented as a compact
  post-LN encoder (the fusion-block extensions of the vendored copy
  are, again, training-time only).

Checkpoint import (``import_egovlp_state``) consumes the torch
``state_dict`` layout of released EgoVLP checkpoints (after the
reference's ``state_dict_data_parallel_fix``), including the
zeros-fill temporal-embedding inflation of ``model.py:297-339``.

Text tokenization runs in-repo: ``data/roberta_tokenizer.py`` loads a
local HF-format directory (vocab.json + merges.txt — no hub access)
and plugs into ``tokenizer=`` here; any HF ``AutoTokenizer`` or
pre-tokenized int array works too (``text_features_from_ids``).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from avion_tpu.egonlq.features import FeatureExtractor
from avion_tpu.models.timesformer import SpaceTimeTransformer

_exact_gelu = functools.partial(nn.gelu, approximate=False)


class RobertaLayer(nn.Module):
    """One post-LN RoBERTa encoder block (self-attn + FFN)."""

    width: int
    heads: int
    mlp_dim: int
    ln_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias):
        b, s, w = x.shape
        h = self.heads
        d = w // h
        dense = functools.partial(nn.Dense, dtype=self.dtype,
                                  param_dtype=jnp.float32)
        ln = functools.partial(nn.LayerNorm, epsilon=self.ln_eps,
                               dtype=jnp.float32, param_dtype=jnp.float32)
        q = dense(w, name="query")(x).reshape(b, s, h, d)
        k = dense(w, name="key")(x).reshape(b, s, h, d)
        v = dense(w, name="value")(x).reshape(b, s, h, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) / np.sqrt(d)
        p = jax.nn.softmax(logits + bias, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
        ctx = ctx.reshape(b, s, w).astype(self.dtype)
        x = ln(name="attn_ln")(x + dense(w, name="attn_out")(ctx))
        x = x.astype(self.dtype)
        y = _exact_gelu(dense(self.mlp_dim, name="intermediate")(x))
        x = ln(name="out_ln")(x + dense(w, name="output")(y))
        return x.astype(self.dtype)


class RobertaModel(nn.Module):
    """RoBERTa-base encoder: embeddings + 12 post-LN layers.

    Returns the last hidden state [B, S, W] (``compute_text`` pools
    token 0, ``egonlq/model/model.py:271-274``)."""

    vocab_size: int = 50265
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    max_positions: int = 514
    pad_token_id: int = 1
    ln_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        if attention_mask is None:
            attention_mask = (input_ids != self.pad_token_id).astype(
                jnp.int32)
        # roberta position ids: cumulative count of non-pad tokens,
        # offset past the pad id (create_position_ids_from_input_ids)
        nonpad = (input_ids != self.pad_token_id).astype(jnp.int32)
        pos_ids = jnp.cumsum(nonpad, axis=1) * nonpad + self.pad_token_id
        emb = functools.partial(nn.Embed, features=self.width,
                                dtype=self.dtype, param_dtype=jnp.float32)
        x = emb(self.vocab_size, name="word_embeddings")(input_ids)
        x = x + emb(self.max_positions, name="position_embeddings")(pos_ids)
        x = x + emb(1, name="token_type_embeddings")(
            jnp.zeros_like(input_ids))
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="emb_ln")(x)
        x = x.astype(self.dtype)
        bias = ((1 - attention_mask) * -1e9).astype(jnp.float32)
        bias = bias[:, None, None, :]  # [B, 1, 1, S] additive mask
        for i in range(self.layers):
            x = RobertaLayer(self.width, self.heads, self.mlp_dim,
                             self.ln_eps, self.dtype,
                             name=f"layer_{i}")(x, bias)
        return x


class ProjectionMLP(nn.Module):
    """The 'minimal' projection (``model.py:106-119``):
    Linear(no bias) -> ReLU -> Linear -> ReLU -> Linear."""

    dim: int = 4096
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dense = functools.partial(nn.Dense, dtype=self.dtype,
                                  param_dtype=jnp.float32)
        x = nn.relu(dense(self.dim, use_bias=False, name="fc0")(x))
        x = nn.relu(dense(self.dim, name="fc1")(x))
        return dense(self.dim, name="fc2")(x)


class FrozenInTime(nn.Module):
    """EgoVLP dual encoder (feature surface).

    ``compute_video``: [B, T, H, W, C] float video (ImageNet-normalized,
    like the reference's extractor input) -> [B, projection_dim].
    ``compute_text``: RoBERTa ids (+ mask) -> [B, projection_dim].
    """

    num_frames: int = 4
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    projection_dim: int = 4096
    text_layers: int = 12
    vocab_size: int = 50265
    max_positions: int = 514
    dtype: Any = jnp.float32

    def setup(self):
        self.video_model = SpaceTimeTransformer(
            image_size=self.image_size, patch_size=self.patch_size,
            num_frames=self.num_frames, width=self.width,
            layers=self.layers, heads=self.heads,
            act=_exact_gelu, ln_pre=False, gated_timeattn=False,
            ln_eps=1e-5, dtype=self.dtype)
        self.text_model = RobertaModel(
            vocab_size=self.vocab_size, width=self.width,
            layers=self.text_layers, heads=self.heads,
            mlp_dim=4 * self.width, max_positions=self.max_positions,
            dtype=self.dtype)
        self.vid_proj = ProjectionMLP(self.projection_dim, self.dtype)
        self.txt_proj = ProjectionMLP(self.projection_dim, self.dtype)

    def compute_video(self, video):
        feats = self.video_model(video, cls_at_last=True)
        return self.vid_proj(feats)

    def compute_text(self, input_ids, attention_mask=None):
        h = self.text_model(input_ids, attention_mask)
        return self.txt_proj(h[:, 0])

    def __call__(self, video, input_ids, attention_mask=None):
        return {"video_embed": self.compute_video(video),
                "text_embed": self.compute_text(input_ids, attention_mask)}


def _t(x):
    return np.ascontiguousarray(np.asarray(x, np.float32).T)


def _a(x):
    return np.asarray(x, np.float32)


def import_egovlp_state(sd: dict, *, num_frames: int = 4,
                        layers: int = 12, text_layers: int = 12) -> dict:
    """Torch ``state_dict`` (EgoVLP layout) -> FrozenInTime param tree.

    Accepts tensors or numpy arrays.  Fusion/ITM/MLM entries
    (``qkv_text_i2t``, ``cross_modal_*``, ``mlm_score``, ``itm_score``,
    text pooler) are ignored; the temporal embedding is zeros-inflated
    or truncated when frame counts differ (``model.py:297-339``)."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}

    vm = {}
    vm["cls_token"] = _a(sd["video_model.cls_token"]).reshape(-1)
    vm["pos_embed"] = _a(sd["video_model.pos_embed"])[0]
    width = vm["pos_embed"].shape[-1]
    tload = _a(sd["video_model.temporal_embed"])[0]  # [T_load, W]
    if tload.shape[0] >= num_frames:
        temporal = tload[:num_frames]
    else:  # zeros fill, load_temporal_fix='zeros'
        temporal = np.zeros((num_frames, width), np.float32)
        temporal[: tload.shape[0]] = tload
    vm["temporal_embed"] = temporal
    pw = _a(sd["video_model.patch_embed.proj.weight"])  # [D, C, p, p]
    vm["patch_embed"] = {
        "kernel": np.ascontiguousarray(pw.reshape(pw.shape[0], -1).T),
        "bias": _a(sd["video_model.patch_embed.proj.bias"]),
    }
    for i in range(layers):
        p = f"video_model.blocks.{i}."
        blk = {}
        for ln in ("norm1", "norm2", "norm3"):
            blk[ln] = {"scale": _a(sd[p + ln + ".weight"]),
                       "bias": _a(sd[p + ln + ".bias"])}
        for attn in ("attn", "timeattn"):
            blk[attn] = {
                "qkv": {"kernel": _t(sd[p + attn + ".qkv.weight"]),
                        "bias": _a(sd[p + attn + ".qkv.bias"])},
                "proj": {"kernel": _t(sd[p + attn + ".proj.weight"]),
                         "bias": _a(sd[p + attn + ".proj.bias"])},
            }
        blk["mlp_fc1"] = {"kernel": _t(sd[p + "mlp.fc1.weight"]),
                          "bias": _a(sd[p + "mlp.fc1.bias"])}
        blk["mlp_fc2"] = {"kernel": _t(sd[p + "mlp.fc2.weight"]),
                          "bias": _a(sd[p + "mlp.fc2.bias"])}
        vm[f"blocks_{i}"] = blk
    vm["norm"] = {"scale": _a(sd["video_model.norm.weight"]),
                  "bias": _a(sd["video_model.norm.bias"])}

    te = "text_model.embeddings."
    tm = {
        "word_embeddings": {
            "embedding": _a(sd[te + "word_embeddings.weight"])},
        "position_embeddings": {
            "embedding": _a(sd[te + "position_embeddings.weight"])},
        "token_type_embeddings": {
            "embedding": _a(sd[te + "token_type_embeddings.weight"])},
        "emb_ln": {"scale": _a(sd[te + "LayerNorm.weight"]),
                   "bias": _a(sd[te + "LayerNorm.bias"])},
    }
    for i in range(text_layers):
        p = f"text_model.encoder.layer.{i}."
        tm[f"layer_{i}"] = {
            "query": {"kernel": _t(sd[p + "attention.self.query.weight"]),
                      "bias": _a(sd[p + "attention.self.query.bias"])},
            "key": {"kernel": _t(sd[p + "attention.self.key.weight"]),
                    "bias": _a(sd[p + "attention.self.key.bias"])},
            "value": {"kernel": _t(sd[p + "attention.self.value.weight"]),
                      "bias": _a(sd[p + "attention.self.value.bias"])},
            "attn_out": {
                "kernel": _t(sd[p + "attention.output.dense.weight"]),
                "bias": _a(sd[p + "attention.output.dense.bias"])},
            "attn_ln": {
                "scale": _a(sd[p + "attention.output.LayerNorm.weight"]),
                "bias": _a(sd[p + "attention.output.LayerNorm.bias"])},
            "intermediate": {
                "kernel": _t(sd[p + "intermediate.dense.weight"]),
                "bias": _a(sd[p + "intermediate.dense.bias"])},
            "output": {"kernel": _t(sd[p + "output.dense.weight"]),
                       "bias": _a(sd[p + "output.dense.bias"])},
            "out_ln": {"scale": _a(sd[p + "output.LayerNorm.weight"]),
                       "bias": _a(sd[p + "output.LayerNorm.bias"])},
        }

    def proj(name):
        return {
            "fc0": {"kernel": _t(sd[name + ".0.weight"])},
            "fc1": {"kernel": _t(sd[name + ".2.weight"]),
                    "bias": _a(sd[name + ".2.bias"])},
            "fc2": {"kernel": _t(sd[name + ".4.weight"]),
                    "bias": _a(sd[name + ".4.bias"])},
        }

    return {"video_model": vm, "text_model": tm,
            "vid_proj": proj("vid_proj"), "txt_proj": proj("txt_proj")}


def load_egovlp_checkpoint(path: str, *, num_frames: int = 4,
                           heads: int | None = None):
    """Load a released EgoVLP ``.pth``/``.pt`` checkpoint and return
    ``(model, params)`` (``models/pt_import.load_pt_state_dict`` handles
    the 'state_dict'/'module.' wrapping).  Depth, width, projection
    dim, vocab and position-table sizes are inferred from the state
    dict, so resized checkpoints load too; ``heads`` falls back to the
    ViT convention width/64 (12 for the released roberta-base-width
    models)."""
    from avion_tpu.models.pt_import import load_pt_state_dict

    sd = load_pt_state_dict(path)
    layers = 1 + max(int(k.split(".")[2]) for k in sd
                     if k.startswith("video_model.blocks."))
    text_layers = 1 + max(int(k.split(".")[3]) for k in sd
                          if k.startswith("text_model.encoder.layer."))
    params = import_egovlp_state(sd, num_frames=num_frames,
                                 layers=layers, text_layers=text_layers)
    n_spatial = params["video_model"]["pos_embed"].shape[0] - 1
    patch = 16
    image_size = int(np.sqrt(n_spatial)) * patch
    width = params["video_model"]["pos_embed"].shape[-1]
    vocab, _ = params["text_model"]["word_embeddings"]["embedding"].shape
    max_positions = (
        params["text_model"]["position_embeddings"]["embedding"].shape[0])
    projection_dim = params["vid_proj"]["fc2"]["kernel"].shape[-1]
    model = FrozenInTime(
        num_frames=num_frames, image_size=image_size, width=width,
        heads=heads or max(1, width // 64), layers=layers,
        text_layers=text_layers, projection_dim=projection_dim,
        vocab_size=vocab, max_positions=max_positions)
    return model, params


ROBERTA_PAD_ID = 1

# ImageNet normalization (the EgoVLP extractor transform, vs CLIP's
# OPENAI mean/std used by the native path)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class EgoVLPFeatureExtractor(FeatureExtractor):
    """NLQ feature extraction over the legacy EgoVLP dual encoder —
    drop-in sibling of ``features.FeatureExtractor`` (the windowed
    ``video_features`` sweep, ``extract_to_dir`` and its .npz cache
    layout are inherited), for released EgoVLP checkpoints.

    ``tokenizer``: anything with ``__call__(list[str]) ->
    {"input_ids", "attention_mask"}`` (e.g. a local-path HF
    ``AutoTokenizer``); or pass pre-tokenized ids to
    ``text_features_from_ids``."""

    def __init__(self, model: FrozenInTime, params, *, tokenizer=None,
                 clip_length: int = 4, window_sec: float = 2.0,
                 fps: float = 30.0, crop_size: int = 224,
                 batch: int = 32):
        # no super().__init__: the base initializer builds CLIP-tower
        # closures (OPENAI normalize, encode_text) and bf16-casts params;
        # EgoVLP keeps checkpoint dtypes and swaps in its own closures
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.clip_length = clip_length
        self.window_sec = window_sec
        self.fps = fps
        self.crop_size = crop_size
        self.batch = batch

        mean = jnp.asarray(IMAGENET_MEAN) * 255.0
        std = jnp.asarray(IMAGENET_STD) * 255.0

        @jax.jit
        def _vis(params, video):
            v = (video.astype(jnp.float32) - mean) / std
            return model.apply({"params": params}, v,
                               method=model.compute_video)

        @jax.jit
        def _txt(params, ids, mask):
            return model.apply({"params": params}, ids, mask,
                               method=model.compute_text)

        self._vis, self._txt = _vis, _txt

    def text_features(self, queries) -> np.ndarray:
        if self.tokenizer is None:
            raise ValueError(
                "no tokenizer configured: pass tokenizer= (a local-path "
                "HF AutoTokenizer) or use text_features_from_ids")
        enc = self.tokenizer(list(queries), padding=True,
                             return_tensors="np")
        return self.text_features_from_ids(
            np.asarray(enc["input_ids"], np.int32),
            np.asarray(enc["attention_mask"], np.int32))

    def text_features_from_ids(self, input_ids: np.ndarray,
                               attention_mask: Optional[np.ndarray] = None
                               ) -> np.ndarray:
        if attention_mask is None:
            attention_mask = (input_ids != ROBERTA_PAD_ID).astype(np.int32)
        return np.asarray(
            self._txt(self.params, jnp.asarray(input_ids, jnp.int32),
                      jnp.asarray(attention_mask, jnp.int32)), np.float32)
