"""Device-side fused input processing: crop + resize + flip + normalize.

The BASELINE north-star's "Pallas-fused resize/crop/flip/normalize"
stage, formulated the MXU-native way: bilinear resampling is a linear
map, so per-clip crop+resize is two batched matmuls with interpolation
matrices,

    out[b] = R[b] @ img[b] @ C[b]^T

where R [out_h, H] and C [out_w, W] carry the bilinear weights for
clip b's crop window (hflip = column-reversed C).  XLA lowers the
einsums straight onto the MXU and fuses the uint8→bf16 normalize into
the producer — no hand-written kernel needed, and unlike a gather-based
resize this formulation needs no dynamic indexing.

Use case: the host decoder returns full (or short-side-capped) frames
and the TPU does per-clip augmentation — the alternative split to the
host-side fused decode (``avion_tpu/data/video_reader.py``), useful
when host cores are the bottleneck (TPU-VM hosts are much weaker than
the reference's 96-thread Xeons).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from avion_tpu.data.transforms import OPENAI_MEAN, OPENAI_STD


def _interp_matrix(starts, sizes, src_len: int, out_len: int):
    """Batched bilinear interpolation matrices [B, out_len, src_len]
    resampling ``out_len`` points from each [start, start+size) window
    (align_corners=False convention, matching cv2.INTER_LINEAR)."""
    scale = sizes / out_len                                   # [B]
    pos = (jnp.arange(out_len)[None, :] + 0.5) * scale[:, None] \
        + starts[:, None] - 0.5                               # [B, out]
    pos = jnp.clip(pos, 0.0, src_len - 1.0)
    lo = jnp.floor(pos)
    frac = pos - lo
    lo = lo.astype(jnp.int32)
    hi = jnp.minimum(lo + 1, src_len - 1)
    src = jnp.arange(src_len)[None, None, :]                  # [1, 1, S]
    w_lo = (src == lo[:, :, None]) * (1.0 - frac[:, :, None])
    w_hi = (src == hi[:, :, None]) * frac[:, :, None]
    return (w_lo + w_hi).astype(jnp.float32)                  # [B, out, S]


def crop_resize_flip_normalize(
    video: jax.Array,          # [B, T, H, W, C] uint8
    crops: jax.Array,          # [B, 4] normalized (x, y, w, h)
    hflip: Optional[jax.Array] = None,   # [B] bool
    *,
    out_size: Tuple[int, int] = (224, 224),
    mean=OPENAI_MEAN,
    std=OPENAI_STD,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Returns [B, T, out_h, out_w, C] normalized ``dtype`` frames."""
    b, t, h, w, c = video.shape
    out_w, out_h = out_size
    x, y, cw, ch = crops[:, 0], crops[:, 1], crops[:, 2], crops[:, 3]
    rows = _interp_matrix(y * h, ch * h, h, out_h)            # [B, oh, H]
    cols = _interp_matrix(x * w, cw * w, w, out_w)            # [B, ow, W]
    if hflip is not None:
        cols = jnp.where(hflip[:, None, None], cols[:, ::-1, :], cols)

    xf = video.astype(jnp.float32)
    # rows: contract H; cols: contract W — two batched MXU matmuls
    tmp = jnp.einsum("bih,bthwc->btiwc", rows, xf)
    out = jnp.einsum("bjw,btiwc->btijc", cols, tmp)
    mean = jnp.asarray(mean, jnp.float32) * 255.0
    std = jnp.asarray(std, jnp.float32) * 255.0
    return ((out - mean) / std).astype(dtype)


def batch_crop_array(crop_specs) -> jax.Array:
    """Stack CropSpec host objects into the [B, 4] device array."""
    import numpy as np

    arr = np.array([[c.x, c.y, c.w, c.h] for c in crop_specs], np.float32)
    flips = np.array([c.hflip for c in crop_specs], bool)
    return jnp.asarray(arr), jnp.asarray(flips)
