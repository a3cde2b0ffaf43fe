"""Attention dispatch: Pallas flash kernel on TPU, XLA math elsewhere.

The XLA path is also the numerics reference for kernel tests.
Layout everywhere is BSHD: [batch, seq, heads, head_dim].
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from avion_tpu.ops.flash_attention import (flash_attention,
                                            flash_attention_fused_qkv,
                                            flash_attention_packed)


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    b, s, h, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * sm_scale
    if causal:
        mask = jnp.tril(jnp.ones((s, s), jnp.bool_))
        logits = jnp.where(mask[None, None], logits, -1e30)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    use_flash: bool = True,
) -> jax.Array:
    """Multi-head attention over BSHD tensors."""
    if use_flash and _on_tpu():
        return flash_attention(q, k, v, causal=causal, sm_scale=sm_scale)
    return xla_attention(q, k, v, causal=causal, sm_scale=sm_scale)


def attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    use_flash: bool = True,
) -> jax.Array:
    """Multi-head attention over packed [B, S, H*D] tensors (contiguous
    lane slices of a fused qkv projection — zero reshape/transpose on
    the flash path)."""
    if use_flash and _on_tpu():
        return flash_attention_packed(q, k, v, heads, causal=causal,
                                      sm_scale=sm_scale)
    b, s, w = q.shape
    d = w // heads
    unpack = lambda x: x.reshape(b, s, heads, d)
    out = xla_attention(unpack(q), unpack(k), unpack(v), causal=causal,
                        sm_scale=sm_scale)
    return out.reshape(b, s, w)


def cached_decode_attention(qkv, pos, k_cache, v_cache, heads):
    """KV-cached single-token causal attention shared by all
    autoregressive decoders (``layers.SelfAttention`` and the LaViLa
    ``gpt2_gated.GPT2SelfAttention``).

    ``qkv``: [B, 1, 3W] fused projection of the current token;
    caches: [B, L, W].  Returns (o [B, 1, W] f32, k_cache', v_cache').
    Single-token attention is bandwidth-bound, so plain f32 einsum math
    is the right tool (no kernel)."""
    w3 = qkv.shape[-1]
    w = w3 // 3
    d = w // heads
    b = qkv.shape[0]
    q = qkv[..., :w].astype(jnp.float32).reshape(b, heads, d)
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, qkv[..., w : 2 * w].astype(k_cache.dtype), (0, pos, 0))
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, qkv[..., 2 * w :].astype(v_cache.dtype), (0, pos, 0))
    length = k_cache.shape[1]
    k = k_cache.astype(jnp.float32).reshape(b, length, heads, d)
    v = v_cache.astype(jnp.float32).reshape(b, length, heads, d)
    s = jnp.einsum("bhd,blhd->bhl", q, k) / math.sqrt(d)
    s = jnp.where(jnp.arange(length)[None, None] <= pos, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhl,blhd->bhd", p, v).reshape(b, 1, w)
    return o, k_cache, v_cache


def attention_fused_qkv(
    qkv: jax.Array,
    heads: int,
    s: int,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    use_flash: bool = True,
    save_residuals: bool = True,
) -> jax.Array:
    """Attention straight off a fused qkv projection [B, S_pad, 3*H*D]
    whose rows beyond ``s`` are padding (finite values).  On TPU the
    flash kernels read the q/k/v lane sections as views — no slice/pad
    ops ever materialize.  Returns [B, s, H*D]."""
    if use_flash and _on_tpu():
        return flash_attention_fused_qkv(qkv, heads, s, causal=causal,
                                         sm_scale=sm_scale,
                                         save_residuals=save_residuals)
    w = qkv.shape[-1] // 3
    q = qkv[:, :s, :w]
    k = qkv[:, :s, w : 2 * w]
    v = qkv[:, :s, 2 * w :]
    return attention_packed(q, k, v, heads, causal=causal,
                            sm_scale=sm_scale, use_flash=False)
