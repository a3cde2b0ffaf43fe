"""VSLNet span-localization head for Ego4D NLQ (flax.linen).

Re-design of the reference's VSLNet (``egonlq/model/VSLNet.py``,
``egonlq/model/layers.py``), the grounding head trained on frozen
dual-encoder video features:

- VisualProjection: dropout + linear to model dim (``layers.py:189-207``)
- FeatureEncoder: learned positional embedding + 4x depthwise-separable
  conv(k=7) + a post-norm multi-head attention block
  (``layers.py:174-347``)
- CQAttention: trilinear context-query attention (``layers.py:349-401``)
- CQConcatenate: weighted-pooled query broadcast (``layers.py:403-440``)
- HighLightLayer: sigmoid saliency + weighted BCE (``layers.py:442-466``)
- ConditionedPredictor (EgoVLP variant): shared encoder + start/end
  conv blocks, masked logits (``layers.py:489-570``)
- top-5 span extraction from the upper-triangular joint start/end
  probability (``layers.py:555-570``)
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

MASK_VALUE = -1e30


def mask_logits(x, mask):
    return x + (1.0 - mask) * MASK_VALUE


class ConvBlock(nn.Module):
    """4x [LN -> depthwise conv(k) -> pointwise conv -> ReLU -> +res]."""

    dim: int
    kernel_size: int = 7
    num_layers: int = 4
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        for i in range(self.num_layers):
            res = x
            h = nn.LayerNorm(epsilon=1e-6, name=f"ln_{i}")(x)
            h = nn.Conv(self.dim, (self.kernel_size,),
                        feature_group_count=self.dim, use_bias=False,
                        padding="SAME", name=f"dw_{i}")(h)
            h = nn.Conv(self.dim, (1,), use_bias=True, name=f"pw_{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(self.drop_rate)(h, deterministic=deterministic)
            x = h + res
        return x


class AttentionBlock(nn.Module):
    """Post-residual MHA block (``layers.py:252-323`` layout)."""

    dim: int
    num_heads: int
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        d = self.dim // self.num_heads
        h = nn.LayerNorm(epsilon=1e-6, name="ln_1")(x)
        h = nn.Dropout(self.drop_rate)(h, deterministic=deterministic)
        q = nn.Dense(self.dim, name="query")(h)
        k = nn.Dense(self.dim, name="key")(h)
        v = nn.Dense(self.dim, name="value")(h)
        b, s, _ = x.shape
        q = q.reshape(b, s, self.num_heads, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, self.num_heads, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, self.num_heads, d).transpose(0, 2, 1, 3)
        scores = (q @ k.transpose(0, 1, 3, 2)) / jnp.sqrt(d)
        if mask is not None:
            scores = mask_logits(scores, mask[:, None, None, :])
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.drop_rate)(probs, deterministic=deterministic)
        out = (probs @ v).transpose(0, 2, 1, 3).reshape(b, s, self.dim)
        out = nn.Dropout(self.drop_rate)(out, deterministic=deterministic)
        residual = out + x
        h = nn.LayerNorm(epsilon=1e-6, name="ln_2")(residual)
        h = nn.Dropout(self.drop_rate)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, name="out_layer")(h)
        h = nn.Dropout(self.drop_rate)(h, deterministic=deterministic)
        return h + residual


class FeatureEncoder(nn.Module):
    dim: int
    num_heads: int
    max_pos_len: int
    kernel_size: int = 7
    num_layers: int = 4
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        pos = nn.Embed(self.max_pos_len, self.dim, name="pos_embedding")
        ids = jnp.arange(x.shape[1])
        x = x + pos(ids)[None]
        x = ConvBlock(self.dim, self.kernel_size, self.num_layers,
                      self.drop_rate, name="conv_block")(x, deterministic)
        x = AttentionBlock(self.dim, self.num_heads, self.drop_rate,
                           name="attention_block")(x, mask, deterministic)
        return x


class CQAttention(nn.Module):
    dim: int
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, context, query, c_mask, q_mask, deterministic=True):
        w4c = self.param("w4C", nn.initializers.xavier_uniform(), (self.dim, 1))
        w4q = self.param("w4Q", nn.initializers.xavier_uniform(), (self.dim, 1))
        w4m = self.param("w4mlu", nn.initializers.xavier_uniform(),
                         (1, 1, self.dim))
        c = nn.Dropout(self.drop_rate)(context, deterministic=deterministic)
        q = nn.Dropout(self.drop_rate)(query, deterministic=deterministic)
        s0 = c @ w4c                                  # [B, Lc, 1]
        s1 = (q @ w4q).transpose(0, 2, 1)             # [B, 1, Lq]
        s2 = (c * w4m) @ q.transpose(0, 2, 1)         # [B, Lc, Lq]
        score = s0 + s1 + s2
        score_q = jax.nn.softmax(mask_logits(score, q_mask[:, None, :]), axis=2)
        score_c = jax.nn.softmax(mask_logits(score, c_mask[:, :, None]), axis=1)
        c2q = score_q @ query
        q2c = (score_q @ score_c.transpose(0, 2, 1)) @ context
        out = jnp.concatenate([context, c2q, context * c2q, context * q2c],
                              axis=2)
        return nn.Dense(self.dim, name="cqa_linear")(out)


class CQConcatenate(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, context, query, q_mask):
        w = self.param("pool_weight", nn.initializers.xavier_uniform(),
                       (self.dim, 1))
        alpha = jax.nn.softmax(
            mask_logits(query @ w, q_mask[:, :, None]), axis=1
        )
        pooled = (query.transpose(0, 2, 1) @ alpha)[:, :, 0]  # [B, dim]
        pooled = jnp.broadcast_to(pooled[:, None], context.shape)
        out = jnp.concatenate([context, pooled], axis=2)
        return nn.Dense(self.dim, name="concat_linear")(out)


class VSLNet(nn.Module):
    """video features [B, Lv, Dv] + query features [B, Lq, Dq] ->
    (highlight scores, start logits, end logits).

    ``use_cq_attention=False`` selects the reference's "small" variant
    (``egonlq/model/VSLNet_small.py:59-135``): no context-query
    attention — the encoded video features go straight into
    CQConcatenate.  (The reference small variant also carries a
    leftover duplicate ``self.predictor(video_features)`` call that
    overwrites the highlight-weighted prediction; that is a dead-code
    quirk, not a design, and is not replicated.)
    """

    dim: int = 128
    num_heads: int = 8
    max_pos_len: int = 128
    video_feature_dim: int = 768
    query_feature_dim: int = 768
    drop_rate: float = 0.2
    use_cq_attention: bool = True

    @nn.compact
    def __call__(self, video, v_mask, query, q_mask, deterministic=True):
        v = nn.Dropout(self.drop_rate)(video, deterministic=deterministic)
        v = nn.Dense(self.dim, name="video_affine")(v)
        q = nn.Dense(self.dim, name="query_affine")(query)

        encoder = FeatureEncoder(self.dim, self.num_heads, self.max_pos_len,
                                 drop_rate=self.drop_rate,
                                 name="feature_encoder")
        q = encoder(q, q_mask, deterministic)
        v = encoder(v, v_mask, deterministic)

        if self.use_cq_attention:
            feats = CQAttention(self.dim, self.drop_rate,
                                name="cq_attention")(
                v, q, v_mask, q_mask, deterministic)
        else:
            feats = v
        feats = CQConcatenate(self.dim, name="cq_concat")(feats, q, q_mask)

        h_logits = nn.Dense(1, name="highlight")(feats)[:, :, 0]
        h_score = jax.nn.sigmoid(mask_logits(h_logits, v_mask))
        feats = feats * h_score[:, :, None]

        pred_encoder = FeatureEncoder(self.dim, self.num_heads,
                                      self.max_pos_len,
                                      drop_rate=self.drop_rate,
                                      name="predictor_encoder")
        start_f = pred_encoder(feats, v_mask, deterministic)
        end_f = pred_encoder(start_f, v_mask, deterministic)
        start_f = nn.LayerNorm(epsilon=1e-6, name="start_ln")(start_f)
        end_f = nn.LayerNorm(epsilon=1e-6, name="end_ln")(end_f)

        def block(name, f):
            h = nn.Dense(self.dim, name=f"{name}_fc1")(
                jnp.concatenate([f, feats], axis=2))
            h = nn.relu(h)
            return nn.Dense(1, name=f"{name}_fc2")(h)[:, :, 0]

        start_logits = mask_logits(block("start", start_f), v_mask)
        end_logits = mask_logits(block("end", end_f), v_mask)
        return h_score, start_logits, end_logits


def highlight_loss(scores, labels, mask, eps=1e-12):
    """Weighted BCE on saliency (``layers.py:458-466``): positive
    locations weighted 2x."""
    labels = labels.astype(jnp.float32)
    weights = jnp.where(labels == 0.0, 1.0, 2.0 * labels)
    # select-then-log: sigmoid saturates to exact 0/1 in f32, and a
    # `labels*log(p) + (1-labels)*log(1-p)` form lets XLA produce
    # 0 * -inf = NaN after reassociation; the where picks one finite log
    log_p = jnp.log(jnp.maximum(scores, eps))
    log_1mp = jnp.log(jnp.maximum(1.0 - scores, eps))
    bce = -jnp.where(labels > 0.5, labels * log_p, log_1mp)
    mask = mask.astype(jnp.float32)
    return (bce * weights * mask).sum() / (mask.sum() + eps)


def span_loss(start_logits, end_logits, start_labels, end_labels):
    from avion_tpu.losses.losses import softmax_cross_entropy

    return (softmax_cross_entropy(start_logits, start_labels)
            + softmax_cross_entropy(end_logits, end_labels))


def vslnet_loss(h_score, start_logits, end_logits, batch,
                highlight_weight: float = 5.0):
    """Total loss (``egonlq/main.py:335-341``): span CE + lambda *
    highlight BCE."""
    hl = highlight_loss(h_score, batch["h_labels"], batch["v_mask"])
    sl = span_loss(start_logits, end_logits, batch["start_label"],
                   batch["end_label"])
    return sl + highlight_weight * hl, {"span_loss": sl, "highlight_loss": hl}


def extract_top_spans(start_logits, end_logits, k: int = 5):
    """Top-k (start, end) spans from the upper-triangular joint
    distribution (``layers.py:555-570``)."""
    sp = jax.nn.softmax(start_logits, axis=-1)
    ep = jax.nn.softmax(end_logits, axis=-1)
    outer = sp[:, :, None] * ep[:, None, :]
    outer = jnp.triu(outer)
    b, h, w = outer.shape
    flat = outer.reshape(b, -1)
    _, idx = jax.lax.top_k(flat, k)
    return idx // w, idx % w
