"""On-device batch augmentation: mixup / cutmix.

The reference applies timm's Mixup on GPU tensors per batch
(``main_lavila_finetune_cls.py:320-339``, ``main_videomae_finetune.py:
236-249``).  Here it runs inside the jitted train step on TPU, with
timm's knob surface (``--mixup-mode batch|pair|elem``,
``--cutmix-minmax``): Beta (or minmax-uniform) mixing coefficients at
batch / pair / per-element granularity, partner = batch reversed
(timm's default pairing is a flip too), optional cutmix box, soft
targets with label smoothing.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _beta(key, alpha: float, shape=()):
    a = jax.random.gamma(key, alpha, shape)
    b = jax.random.gamma(jax.random.fold_in(key, 1), alpha, shape)
    return a / (a + b)


def smooth_one_hot(labels, num_classes: int, smoothing: float = 0.0):
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _pair_mirror(v: jax.Array) -> jax.Array:
    """Share each element's draw with its flip partner: out[i] ==
    out[B-1-i] (timm ``mode='pair'`` — one coefficient per mixed pair)."""
    return jnp.where(jnp.arange(v.shape[0]) < v.shape[0] // 2, v, v[::-1])


def _cut_boxes(key, lam, cutmix_minmax, h: int, w: int):
    """Per-sample cutmix boxes.  Returns (mask [B,H,W], lam_adj [B]).

    Default: square box with area ratio (1-lam) centered anywhere
    (timm ``rand_bbox``, clipped at the borders).  With
    ``cutmix_minmax=(lo, hi)``: cut height/width sampled uniformly in
    [lo*H, hi*H] x [lo*W, hi*W] (timm ``rand_bbox_minmax``), lam then
    DERIVED from the realized box area (timm forces correct_lam here).
    """
    b = lam.shape[0]
    k_y, k_x, k_h, k_w = (jax.random.fold_in(key, i) for i in range(4))
    if cutmix_minmax is not None:
        lo, hi = float(cutmix_minmax[0]), float(cutmix_minmax[1])
        cut_h = jax.random.randint(k_h, (b,), int(h * lo), int(h * hi) + 1)
        cut_w = jax.random.randint(k_w, (b,), int(w * lo), int(w * hi) + 1)
        # box fully inside the frame (timm margin=0 semantics)
        cy = (jax.random.uniform(k_y, (b,))
              * jnp.maximum(h - cut_h, 1)).astype(jnp.int32)
        cx = (jax.random.uniform(k_x, (b,))
              * jnp.maximum(w - cut_w, 1)).astype(jnp.int32)
        y0, y1 = cy, cy + cut_h
        x0, x1 = cx, cx + cut_w
    else:
        cut_ratio = jnp.sqrt(1.0 - lam)
        cut_h = (h * cut_ratio).astype(jnp.int32)
        cut_w = (w * cut_ratio).astype(jnp.int32)
        cy = jax.random.randint(k_y, (b,), 0, h)
        cx = jax.random.randint(k_x, (b,), 0, w)
        y0 = jnp.clip(cy - cut_h // 2, 0, h)
        y1 = jnp.clip(cy + cut_h // 2, 0, h)
        x0 = jnp.clip(cx - cut_w // 2, 0, w)
        x1 = jnp.clip(cx + cut_w // 2, 0, w)
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    box = ((yy >= y0[:, None, None]) & (yy < y1[:, None, None])
           & (xx >= x0[:, None, None]) & (xx < x1[:, None, None]))
    area = (y1 - y0) * (x1 - x0)
    lam_adj = (1.0 - area / (h * w)).astype(jnp.float32)
    return box, lam_adj


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
    mode: str = "batch",
    cutmix_minmax: Optional[Sequence[float]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (mixed video, soft targets [B, num_classes]).

    ``mode``: ``batch`` (one coefficient/box per batch), ``elem``
    (independent per element), ``pair`` (shared between each element
    and its flip partner) — timm Mixup semantics.  ``cutmix_minmax``
    set enables cutmix with uniformly-sampled box fractions (and, per
    timm, implies valid cutmix regardless of ``cutmix_alpha``).
    """
    if mode not in ("batch", "pair", "elem"):
        raise ValueError(f"mixup mode must be batch|pair|elem, got {mode!r}")
    k_apply, k_switch, k_lam, k_box = jax.random.split(key, 4)
    b = video.shape[0]
    targets = smooth_one_hot(labels, num_classes, smoothing)
    flipped_t = targets[::-1]
    flipped_v = video[::-1]
    n = b if mode in ("pair", "elem") else 1

    have_cutmix = cutmix_alpha > 0 or cutmix_minmax is not None
    use_cutmix = jnp.logical_and(
        have_cutmix, jax.random.uniform(k_switch, (n,)) < switch_prob)
    if mixup_alpha > 0:
        lam_mix = _beta(k_lam, mixup_alpha, (n,))
    else:
        lam_mix = jnp.ones((n,), jnp.float32)
        # cutmix-only configuration: always cutmix when applied
        use_cutmix = jnp.broadcast_to(jnp.asarray(have_cutmix), (n,))
    if cutmix_minmax is not None:
        lam_cut = jnp.ones((n,), jnp.float32)  # derived from the box below
    elif cutmix_alpha > 0:
        lam_cut = _beta(jax.random.fold_in(k_lam, 2), cutmix_alpha, (n,))
    else:
        lam_cut = jnp.ones((n,), jnp.float32)
    apply = jax.random.uniform(k_apply, (n,)) < prob
    if mode == "pair":
        lam_mix, lam_cut = _pair_mirror(lam_mix), _pair_mirror(lam_cut)
        use_cutmix, apply = _pair_mirror(use_cutmix), _pair_mirror(apply)

    h, w = video.shape[-3], video.shape[-2]
    lam_cut_b = jnp.broadcast_to(lam_cut, (b,))
    if mode == "pair":
        # one box per pair: mirrored fold keys would differ; draw for
        # the first half and mirror the realized boxes via the mask
        box, lam_adj = _cut_boxes(k_box, lam_cut_b, cutmix_minmax, h, w)
        box = _pair_mirror(box)
        lam_adj = _pair_mirror(lam_adj)
    else:
        box, lam_adj = _cut_boxes(k_box, lam_cut_b, cutmix_minmax, h, w)
        if mode == "batch":
            box = jnp.broadcast_to(box[:1], box.shape)
            lam_adj = jnp.broadcast_to(lam_adj[:1], lam_adj.shape)

    use_cutmix_b = jnp.broadcast_to(use_cutmix, (b,))
    apply_b = jnp.broadcast_to(apply, (b,))
    lam_mix_b = jnp.broadcast_to(lam_mix, (b,)).astype(jnp.float32)

    cut_mixed = jnp.where(box[:, None, :, :, None], flipped_v, video)
    lam_v = lam_mix_b[:, None, None, None, None]
    mix_mixed = (lam_v * video + (1.0 - lam_v) * flipped_v).astype(video.dtype)
    mixed = jnp.where(use_cutmix_b[:, None, None, None, None],
                      cut_mixed, mix_mixed)
    lam = jnp.where(use_cutmix_b, lam_adj, lam_mix_b)

    mixed = jnp.where(apply_b[:, None, None, None, None], mixed, video)
    lam = jnp.where(apply_b, lam, 1.0)
    soft = lam[:, None] * targets + (1.0 - lam)[:, None] * flipped_t
    return mixed, soft
