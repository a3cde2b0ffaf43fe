"""On-device batch augmentation: mixup / cutmix.

The reference applies timm's Mixup on GPU tensors per batch
(``main_lavila_finetune_cls.py:320-339``, ``main_videomae_finetune.py:
236-249``).  Here it runs inside the jitted train step on TPU: one
Beta draw per batch, partner = batch reversed (timm's default pairing
is a flip too), optional cutmix box, soft targets with label smoothing.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _beta(key, alpha: float):
    a = jax.random.gamma(key, alpha)
    b = jax.random.gamma(jax.random.fold_in(key, 1), alpha)
    return a / (a + b)


def smooth_one_hot(labels, num_classes: int, smoothing: float = 0.0):
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def mixup_cutmix(
    key,
    video: jax.Array,          # [B, T, H, W, C] float
    labels: jax.Array,         # [B] int
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    switch_prob: float = 0.5,
    prob: float = 1.0,
    smoothing: float = 0.1,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (mixed video, soft targets [B, num_classes])."""
    k_apply, k_switch, k_lam, k_box = jax.random.split(key, 4)
    targets = smooth_one_hot(labels, num_classes, smoothing)
    flipped_t = targets[::-1]
    flipped_v = video[::-1]

    use_cutmix = jnp.logical_and(
        cutmix_alpha > 0,
        jax.random.uniform(k_switch) < switch_prob,
    )
    lam_mix = _beta(k_lam, mixup_alpha) if mixup_alpha > 0 else jnp.float32(1.0)
    lam_cut = _beta(jax.random.fold_in(k_lam, 2), cutmix_alpha) if cutmix_alpha > 0 else jnp.float32(1.0)

    h, w = video.shape[-3], video.shape[-2]

    def do_cutmix(_):
        lam = lam_cut
        cut_ratio = jnp.sqrt(1.0 - lam)
        cut_h = (h * cut_ratio).astype(jnp.int32)
        cut_w = (w * cut_ratio).astype(jnp.int32)
        cy = jax.random.randint(k_box, (), 0, h)
        cx = jax.random.randint(jax.random.fold_in(k_box, 1), (), 0, w)
        y0 = jnp.clip(cy - cut_h // 2, 0, h)
        y1 = jnp.clip(cy + cut_h // 2, 0, h)
        x0 = jnp.clip(cx - cut_w // 2, 0, w)
        x1 = jnp.clip(cx + cut_w // 2, 0, w)
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(w)[None, :]
        box = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1))
        mixed = jnp.where(box[None, None, :, :, None], flipped_v, video)
        lam_adj = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)
        return mixed, lam_adj.astype(jnp.float32)

    def do_mixup(_):
        lam = lam_mix
        mixed = lam * video + (1.0 - lam) * flipped_v
        return mixed.astype(video.dtype), lam.astype(jnp.float32)

    mixed, lam = jax.lax.cond(use_cutmix, do_cutmix, do_mixup, None)
    apply = jax.random.uniform(k_apply) < prob
    mixed = jnp.where(apply, mixed, video)
    lam = jnp.where(apply, lam, 1.0)
    soft = lam * targets + (1.0 - lam) * flipped_t
    return mixed, soft
