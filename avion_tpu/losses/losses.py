"""Training losses (pure jnp; partition-friendly).

TPU-native re-design of ``avion/losses/losses.py``.  The reference
manually all-gathers per-rank embeddings (``gather_features``,
``losses.py:19-77``) to build the global similarity matrix.  Under pjit
there is nothing to gather *by hand*: the loss is written against the
global batch, and XLA partitions the [B, B] logit matrix over the
batch-sharded mesh axes, inserting exactly the ICI all-gather the
reference does manually.  Row-sharding of the logit matrix reproduces
the ``--local-loss`` memory shape (each device holds B_local x B_global
rows); gradients flow through the gather by construction (the
``torch.distributed.nn.all_gather`` path, ``losses.py:52-60``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def softmax_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Mean CE over integer labels; logits [N, C] in f32."""
    logits = logits.astype(jnp.float32)
    n_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        smooth = -logp.mean(axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return nll.mean()


def soft_target_cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """CE against a full target distribution (mixup/cutmix)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return (-targets * logp).sum(axis=-1).mean()


def clip_loss(
    image_embed: jax.Array,
    text_embed: jax.Array,
    logit_scale: jax.Array,
    label_smoothing: float = 0.0,
) -> dict:
    """Symmetric InfoNCE over the global batch (``ClipLoss``,
    ``losses.py:80-149``).  Embeddings must be L2-normalized.  Returns
    {"loss", "clip_acc"} like the reference criterion."""
    b = image_embed.shape[0]
    logits_per_image = (
        logit_scale * image_embed.astype(jnp.float32)
        @ text_embed.astype(jnp.float32).T
    )
    labels = jnp.arange(b)
    loss_i = softmax_cross_entropy(logits_per_image, labels, label_smoothing)
    loss_t = softmax_cross_entropy(logits_per_image.T, labels, label_smoothing)
    loss = (loss_i + loss_t) / 2
    pred = jnp.argmax(jax.lax.stop_gradient(logits_per_image), axis=-1)
    acc = 100.0 * jnp.mean((pred == labels).astype(jnp.float32))
    return {"loss": loss, "clip_acc": acc}


def max_margin_ranking_loss(
    image_embed: jax.Array,
    text_embed: jax.Array,
    margin: float = 0.2,
    fix_norm: bool = True,
    eps: float = 1e-8,
) -> dict:
    """Bidirectional max-margin ranking loss for EK100-MIR finetune
    (``MaxMarginRankingLoss``, ``losses.py:163-227``): hinge on
    margin - (sim(i,i) - sim(i,j)) over both row and column negatives;
    with ``fix_norm`` diagonal terms are excluded from the mean."""
    a = text_embed.astype(jnp.float32)
    bm = image_embed.astype(jnp.float32)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    bm = bm / jnp.maximum(jnp.linalg.norm(bm, axis=-1, keepdims=True), eps)
    x = a @ bm.T  # [n, n] — sim(text, image)
    n = x.shape[0]
    diag = jnp.diagonal(x)[:, None]
    row_terms = jax.nn.relu(margin - diag + x)
    col_terms = jax.nn.relu(margin - diag + x.T)
    if fix_norm:
        off = 1.0 - jnp.eye(n)
        total = (row_terms * off).sum() + (col_terms * off).sum()
        loss = total / (2.0 * n * (n - 1))
    else:
        loss = (row_terms.sum() + col_terms.sum()) / (2.0 * n * n)
    return {"loss": loss, "max_margin_loss": loss}


def videomae_loss(
    pred: jax.Array,
    video: jax.Array,
    masked_idx: jax.Array,
    patch_size: int,
    tubelet_size: int,
    normalize_target: bool = True,
) -> dict:
    """MSE on per-tube-normalized masked pixels
    (``scripts/main_videomae_pretrain.py:322-339``)."""
    from avion_tpu.models.videomae import tube_patchify

    tubes = tube_patchify(video.astype(jnp.float32), patch_size, tubelet_size)
    if normalize_target:
        # per-CHANNEL stats over the tube's spatial elements, unbiased
        # variance, std + eps in the denominator — exactly the reference
        # target (main_videomae_pretrain.py:322-328)
        b, n, d = tubes.shape
        spatial = tubelet_size * patch_size * patch_size
        ch = tubes.reshape(b, n, spatial, d // spatial)
        mean = ch.mean(axis=-2, keepdims=True)
        var = ch.var(axis=-2, keepdims=True, ddof=1)
        ch = (ch - mean) / (jnp.sqrt(var) + 1e-6)
        tubes = ch.reshape(b, n, d)
    target = jnp.take_along_axis(
        tubes, masked_idx[..., None], axis=1
    )
    loss = jnp.mean((pred.astype(jnp.float32) - target) ** 2)
    return {"loss": loss}
