"""Evaluation runners: embedding sweeps + the five zero-shot suites.

Single-controller replacements for the reference's per-rank eval loops
with all_gather + interleave reassembly (``evaluation_ek100mir.py:
249-294``): under pjit the embedding sweep is already global, so
results come back in dataset order — no reorg, just unpadding.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from avion_tpu.data.tokenizer import tokenize
from avion_tpu.data.transforms import normalize_video
from avion_tpu.eval.classification_metrics import (
    ZERO_SHOT_TEMPLATES,
    charades_map,
    confusion_matrix,
    egomcq_accuracy,
    get_marginal_indexes,
    marginalize,
    mean_class_accuracy,
    topk_accuracy,
)
from avion_tpu.eval.retrieval_metrics import get_map, get_ndcg


_ENCODER_CACHE: dict = {}


# params whose leaves are consumed at f32 BEFORE the compute-dtype
# cast — pre-rounding them would change outputs: positional/temporal
# embeddings (vit.py cls_tok = (cls + pos[0]).astype), GPT-2 wte/wpe
# (embeds add in f32; wte doubles as the tied LM head), the VCLM
# token_embedding (f32 LM-head matmul), and the MoE router (dtype=f32
# Dense in ops/moe.py — rounding would flip discrete top-k routing)
_CAST_EXCLUDE = ("positional", "temporal", "wte", "wpe",
                 "token_embedding", "pos_embed", "router")


def cast_inference_params(params, model):
    """Pre-cast matrix params (kernels, embedding tables; ndim >= 2) to
    the model's bf16 compute dtype for inference.

    Numerically identical to leaving them f32: flax's ``promote_dtype``
    casts weights to the compute dtype at every use anyway, so the
    f32->bf16 rounding happens either way — pre-casting just moves it
    out of the graph, HALVING weight HBM traffic per encode call (the
    dominant cost at small serving batches).  Vectors/scalars (biases,
    LayerNorm, gates, logit_scale) stay f32: tiny, and fp32-LN reads
    them at f32.  No-op for f32-compute models (CPU tests)."""
    import jax.numpy as jnp

    if getattr(model, "dtype", None) != jnp.bfloat16:
        return params

    def cast(path, x):
        name = "/".join(str(getattr(k, "key", k)) for k in path).lower()
        if any(k in name for k in _CAST_EXCLUDE):
            return x
        if hasattr(x, "ndim") and x.ndim >= 2 and x.dtype == jnp.float32:
            return x.astype(jnp.bfloat16)
        return x

    return jax.tree_util.tree_map_with_path(cast, params)


def quantize_inference_params(params, model):
    """Weight-only int8 quantization of matrix params for serving.

    Per-output-channel symmetric scales (last axis); the same leaves
    :func:`cast_inference_params` would keep f32 stay untouched.
    Returns ``(leaves, scales, treedef)``: ``leaves[i]`` is the int8
    tensor (or the original array where not quantized) and
    ``scales[i]`` its f32 per-channel scale (or None).  Dequantize
    inside the jitted encode with :func:`dequantize_params` — XLA then
    reads ~1 byte/weight from HBM and reconstructs bf16 weights in
    VMEM, halving weight traffic again over bf16 storage.

    Unlike the bf16 cast this is LOSSY (~0.4% per-weight relative
    error): opt-in for serving (``--weights int8``), never used for
    training or metric-reporting eval."""
    import jax.numpy as jnp

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves, scales = [], []
    for path, x in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path).lower()
        skip = (any(k in name for k in _CAST_EXCLUDE)
                or not hasattr(x, "ndim") or x.ndim < 2
                or x.dtype not in (jnp.float32, jnp.bfloat16))
        if skip:
            leaves.append(x)
            scales.append(None)
            continue
        w = np.asarray(x, np.float32)
        axes = tuple(range(w.ndim - 1))
        s = np.abs(w).max(axis=axes, keepdims=True) / 127.0
        s = np.maximum(s, 1e-12)
        q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        leaves.append(jnp.asarray(q))
        scales.append(jnp.asarray(s, jnp.float32))
    return leaves, scales, treedef


def dequantize_params(leaves, scales, treedef, dtype=None):
    """Rebuild the bf16 param tree from quantized leaves (in-graph)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16
    out = [l if s is None
           else (l.astype(jnp.float32) * s).astype(dtype)
           for l, s in zip(leaves, scales)]
    return jax.tree_util.tree_unflatten(treedef, out)


class CLIPEncoders:
    """Jitted, batch-padded encode functions over a CLIP model.

    With a ``mesh``, eval batches are sharded over the data axes so the
    sweep uses every chip (replacing the reference's per-rank eval +
    all_gather, ``evaluation_ek100mir.py:249-294``)."""

    def __init__(self, model, params, mean=None, std=None, batch: int = 64,
                 mesh=None, weight_dtype: str = "bf16"):
        from avion_tpu.data.transforms import OPENAI_MEAN, OPENAI_STD

        self.model = model
        self.weight_dtype = weight_dtype
        if weight_dtype == "int8":
            leaves, scales, treedef = quantize_inference_params(params,
                                                                model)
            # params handle stays the single call argument: a 2-tuple
            # pytree of (leaves, scales); the jitted fns dequantize
            # in-graph so HBM holds ~1 byte/weight
            self.params = (tuple(leaves), tuple(scales))
            self._treedef = treedef
        elif weight_dtype in ("bf16", "f32"):
            self.params = (params if weight_dtype == "f32"
                           else cast_inference_params(params, model))
            self._treedef = None
        else:
            raise ValueError(f"weight_dtype must be bf16|int8|f32, "
                             f"got {weight_dtype!r}")
        self.batch = batch
        self.mesh = mesh
        if mesh is not None:
            from avion_tpu.parallel.mesh import n_batch_shards

            shards = n_batch_shards(mesh)
            self.batch = -(-batch // shards) * shards  # round up
        mean = mean if mean is not None else OPENAI_MEAN
        std = std if std is not None else OPENAI_STD

        treedef = self._treedef

        def _resolve(params):
            if treedef is None:
                return params
            leaves, scales = params
            return dequantize_params(list(leaves), list(scales), treedef,
                                     dtype=model.dtype)

        def _img(params, video):
            v = normalize_video(video, mean, std, dtype=model.dtype)
            return model.apply({"params": _resolve(params)}, v,
                               method=model.encode_image)

        def _txt(params, text):
            return model.apply({"params": _resolve(params)}, text,
                               method=model.encode_text)

        # multi-host: replicate embeddings so every process can pull the
        # full result to host (shards on other hosts are unaddressable;
        # replaces the reference's eval all_gather,
        # evaluation_ek100mir.py:255-256)
        kw = {}
        if mesh is not None and jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            kw["out_shardings"] = NamedSharding(mesh, PartitionSpec())
        self._img = jax.jit(_img, **kw)
        self._txt = jax.jit(_txt, **kw)

    @classmethod
    def cached(cls, model, params, batch: int = 64, mesh=None):
        """Reuse jitted encoders across calls (fresh instances would
        recompile both towers every validation epoch).  The cached
        encoder holds strong refs to model/mesh; identity is re-checked
        so an id-recycled key can never return encoders for a different
        model."""
        key = (id(model), batch, id(mesh))
        enc = _ENCODER_CACHE.get(key)
        if enc is not None and (enc.model is not model or enc.mesh is not mesh):
            enc = None
        if enc is None:
            enc = cls(model, params, batch=batch, mesh=mesh)
            _ENCODER_CACHE[key] = enc
        else:
            if enc.weight_dtype == "int8":
                leaves, scales, _ = quantize_inference_params(params, model)
                enc.params = (tuple(leaves), tuple(scales))
            else:
                enc.params = (params if enc.weight_dtype == "f32"
                              else cast_inference_params(params, model))
        return enc

    def _put(self, chunk):
        if self.mesh is None:
            return chunk
        from avion_tpu.parallel.sharding import batch_sharding

        sh = batch_sharding(self.mesh, chunk.ndim)
        if jax.process_count() == 1:
            return jax.device_put(chunk, sh)
        # every host iterates the full eval set; feed only this
        # process's rows of the padded chunk
        world, pidx = jax.process_count(), jax.process_index()
        local = chunk.shape[0] // world
        return jax.make_array_from_process_local_data(
            sh, chunk[pidx * local : (pidx + 1) * local])

    def _sweep(self, fn, arr: np.ndarray) -> np.ndarray:
        n = arr.shape[0]
        out = []
        for i in range(0, n, self.batch):
            chunk = arr[i : i + self.batch]
            pad = self.batch - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)], axis=0
                )
            emb = np.asarray(fn(self.params, self._put(chunk)), np.float32)
            out.append(emb[: self.batch - pad])
        return np.concatenate(out, axis=0)

    def encode_images(self, videos: np.ndarray) -> np.ndarray:
        return self._sweep(self._img, videos)

    def encode_texts(self, texts: np.ndarray) -> np.ndarray:
        return self._sweep(self._txt, texts)

    def sweep_loader(self, loader, keys=("video", "text")) -> Dict[str, np.ndarray]:
        """Iterate a loader, encoding each modality; returns stacked
        embeddings plus any passthrough scalar fields."""
        img, txt, extras = [], [], {}
        for batch in loader:
            if "video" in keys and "video" in batch:
                img.append(self.encode_images(batch["video"]))
            if "text" in keys and "text" in batch:
                txt.append(self.encode_texts(batch["text"]))
            for k, v in batch.items():
                if k in ("video", "text"):
                    continue
                extras.setdefault(k, []).append(np.asarray(v))
        out = {}
        if img:
            out["image_embed"] = np.concatenate(img)
        if txt:
            out["text_embed"] = np.concatenate(txt)
        for k, v in extras.items():
            out[k] = np.concatenate(v)
        return out


def validate_mir(
    encoders: CLIPEncoders,
    loader,
    relevancy_matrix: np.ndarray,
    video_id_order: Optional[Sequence] = None,
    text_id_order: Optional[Sequence] = None,
) -> Dict[str, float]:
    """EK100-MIR retrieval eval (``validate_mir``,
    ``evaluation_ek100mir.py:214-332``): similarity (x+1)/2, columns
    remapped from clip order to sentence order, then mAP/nDCG."""
    res = encoders.sweep_loader(loader)
    img, txt = res["image_embed"], res["text_embed"]
    n = relevancy_matrix.shape[0]
    img, txt = img[:n], txt[:n]
    sim = (img @ txt.T + 1) / 2
    if video_id_order is not None and text_id_order is not None:
        vid_list = list(video_id_order)
        indexes = [vid_list.index(t) for t in text_id_order]
        sim = sim[:, indexes]
    vmap, tmap, amap = get_map(sim, relevancy_matrix)
    vndcg, tndcg, andcg = get_ndcg(sim, relevancy_matrix)
    return {
        "vis_map": vmap, "txt_map": tmap, "avg_map": amap,
        "vis_ndcg": vndcg, "txt_ndcg": tndcg, "avg_ndcg": andcg,
    }


def build_text_classifier(
    encoders: CLIPEncoders,
    labels: Sequence[str],
    templates: Sequence[str] = tuple(ZERO_SHOT_TEMPLATES),
    context_length: int = 77,
) -> np.ndarray:
    """Prompt-ensemble classifier weights [n_classes, D]
    (``evaluation_common.py:58-82``): encode each template-filled label,
    mean over templates, renormalize."""
    weights = []
    for label in labels:
        toks = tokenize([t.format(label) for t in templates], context_length)
        emb = encoders.encode_texts(toks)
        mean = emb.mean(axis=0)
        weights.append(mean / max(np.linalg.norm(mean), 1e-8))
    return np.stack(weights)


def validate_zeroshot_cls(
    encoders: CLIPEncoders,
    loader,
    classifier: np.ndarray,
    *,
    n_classes: Optional[int] = None,
    multilabel: bool = False,
    marginal_actions=None,
) -> Dict[str, float]:
    """Zero-shot classification over a video loader.  Batches may carry
    multiple clips/crops per sample ([B, V, T, H, W, C]); logits are
    max-pooled over views (``evaluation_common.py:107-123``)."""
    all_logits, all_labels = [], []
    for batch in loader:
        video = batch["video"]
        if video.ndim == 6:  # views
            b, v = video.shape[:2]
            emb = encoders.encode_images(video.reshape((b * v,) + video.shape[2:]))
            logits = emb @ classifier.T
            logits = logits.reshape(b, v, -1).max(axis=1)
        else:
            emb = encoders.encode_images(video)
            logits = emb @ classifier.T
        all_logits.append(logits)
        all_labels.append(np.asarray(batch["label"]))
    logits = np.concatenate(all_logits)
    labels = np.concatenate(all_labels)

    out: Dict[str, float] = {}
    if multilabel:
        m_ap, _, _ = charades_map(logits, labels)
        out["mAP"] = 100.0 * m_ap
        return out
    acc1, acc5 = topk_accuracy(logits, labels, (1, 5))
    out["acc1"], out["acc5"] = acc1, acc5
    if n_classes:
        cm = confusion_matrix(np.argmax(logits, 1), labels, n_classes)
        mean_acc, overall = mean_class_accuracy(cm)
        out["mean_class_acc"] = mean_acc
    if marginal_actions is not None:
        # verb/noun marginalization (evaluation_ek100cls.py:12-34)
        probs = _softmax(logits)
        for mode in ("verb", "noun"):
            idx = get_marginal_indexes(marginal_actions, mode)
            mp = marginalize(probs, idx)
            col = 0 if mode == "verb" else 1
            part_labels = np.asarray([marginal_actions[a][col] for a in labels])
            out[f"{mode}_acc1"] = topk_accuracy(mp, part_labels, (1,))[0]
    return out


def validate_egomcq(encoders: CLIPEncoders, loader) -> Dict[str, float]:
    """EgoMCQ: query text vs 5 candidate videos
    (``evaluation_egomcq.py:30-89``)."""
    preds, answers, types = [], [], []
    for batch in loader:
        q = encoders.encode_texts(batch["query"])           # [B, D]
        vids = batch["videos"]                              # [B, 5, T, H, W, C]
        b, k = vids.shape[:2]
        v = encoders.encode_images(vids.reshape((b * k,) + vids.shape[2:]))
        v = v.reshape(b, k, -1)
        preds.append(np.einsum("bd,bkd->bk", q, v))
        answers.append(np.asarray(batch["answer"]))
        types.append(np.asarray(batch["type"]))
    return egomcq_accuracy(
        np.concatenate(preds), np.concatenate(answers), np.concatenate(types)
    )


def _softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def validate_all(encoders: CLIPEncoders, suites: Dict[str, Callable],
                 strict: bool = False) -> Dict[str, float]:
    """Fan out over configured suites (``avion/utils/validate.py:8-72``);
    each suite is a zero-arg callable returning a metric dict; results
    are flattened to ``test_<suite>_<metric>``.

    With ``strict`` (standalone eval) a failing suite raises; inside a
    training run failures are survivable but loud — full traceback plus
    a ``test_<suite>_error`` sentinel so a misconfigured suite never
    masquerades as "suite not configured"."""
    import traceback

    out = {}
    for name, fn in suites.items():
        try:
            metrics = fn()
        except Exception:
            if strict:
                raise
            print(f"[validate_all] suite {name} FAILED:\n"
                  f"{traceback.format_exc()}")
            out[f"test_{name}_error"] = 1.0
            continue
        for k, v in metrics.items():
            out[f"test_{name}_{k}"] = float(v)
    return out
