"""GPT-2 with gated cross-attention in flax — the LaViLa narrator's
text decoder.

Re-implementation of the narrator's decoder semantics
(``second_party/lavilla_narrator/lavila/models/gpt2_gated.py``): a
standard GPT-2 LM whose every ``cross_freq``-th block gains a gated
cross-attention sub-block that runs BEFORE the self-attention::

    r = x; x = ln_cross_attn(x)
    x = r + tanh(alpha_cattn) * crossattn(x, visual_tokens)
    r = x; x = ln_2_crossattention(x)
    x = r + tanh(alpha_dense) * mlp_sqrelu(x)
    # then the ordinary GPT-2 block:
    x = x + attn(ln_1(x));  x = x + mlp(ln_2(x))

Weight layout notes for checkpoint interop: HF GPT-2 stores its linear
layers as Conv1D with weight [in, out] — exactly flax's Dense kernel
layout, so the importer copies them without transposition.  The LM head
is tied to the token embedding.

Decoding: beside the teacher-forced ``__call__``, the model exposes a
KV-cached single-token path (``precompute_cross`` + ``decode_one`` +
``make_decode_cache``) — the reference's HF ``generate`` re-runs the
full prefix every step (no cache use in ``lavilla_narrator/main.py``),
which at GPT-2-XL scale costs ~``max_len``x the decoder FLOPs of cached
decode.  The cache is threaded EXPLICITLY through the scan carry
(functional style — no mutable flax collections), which keeps the
decode loop a single fused XLA while-program.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from avion_tpu.ops.attention import attention_packed


def gelu_new(x):
    # HF "gelu_new": tanh approximation (GPT-2's activation)
    return jax.nn.gelu(x, approximate=True)


def squared_relu(x):
    r = jax.nn.relu(x)
    return r * r


def _ln(name):
    return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


class GPT2SelfAttention(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    def setup(self):
        self.c_attn = nn.Dense(3 * self.width, dtype=self.dtype,
                               param_dtype=jnp.float32, name="c_attn")
        self.c_proj = nn.Dense(self.width, dtype=self.dtype,
                               param_dtype=jnp.float32, name="c_proj")

    def __call__(self, x):
        w = self.width
        qkv = self.c_attn(x)
        o = attention_packed(qkv[..., :w], qkv[..., w : 2 * w],
                             qkv[..., 2 * w :], self.heads, causal=True,
                             use_flash=False)
        return self.c_proj(o)

    def decode_step(self, x1, pos, k_cache, v_cache):
        """Single-token cached attention.  ``x1``: [B, 1, W]; ``pos``:
        scalar int32 position; caches: [B, L, W].  Returns
        (out [B, 1, W], k_cache', v_cache')."""
        from avion_tpu.ops.attention import cached_decode_attention

        o, k_cache, v_cache = cached_decode_attention(
            self.c_attn(x1), pos, k_cache, v_cache, self.heads)
        return self.c_proj(o.astype(self.dtype)), k_cache, v_cache


class GPT2CrossAttention(nn.Module):
    """q from text, k/v from the visual tokens (HF cross Conv1D layout:
    q_attn [W, W] + c_attn [W_enc, 2W])."""

    width: int
    heads: int
    dtype: Any = jnp.float32

    def setup(self):
        self.q_attn = nn.Dense(self.width, dtype=self.dtype,
                               param_dtype=jnp.float32, name="q_attn")
        self.c_attn = nn.Dense(2 * self.width, dtype=self.dtype,
                               param_dtype=jnp.float32, name="c_attn")
        self.c_proj = nn.Dense(self.width, dtype=self.dtype,
                               param_dtype=jnp.float32, name="c_proj")

    def kv(self, enc):
        """Precompute k/v heads from the visual tokens — constant per
        clip, so cached generation computes them exactly once."""
        w, h = self.width, self.heads
        d = w // h
        b, m, _ = enc.shape
        kv = self.c_attn(enc)
        k = kv[..., :w].reshape(b, m, h, d).transpose(0, 2, 1, 3)
        v = kv[..., w:].reshape(b, m, h, d).transpose(0, 2, 1, 3)
        return k.astype(jnp.float32), v.astype(jnp.float32)

    def attend(self, x, k, v):
        w, h = self.width, self.heads
        d = w // h
        b, s, _ = x.shape
        q = self.q_attn(x).reshape(b, s, h, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                            k) / math.sqrt(d)
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, w).astype(self.dtype)
        return self.c_proj(o)

    def __call__(self, x, enc):
        k, v = self.kv(enc)
        return self.attend(x, k, v)


class GPT2MLP(nn.Module):
    width: int
    inner: int
    act: Any = gelu_new
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.inner, dtype=self.dtype, param_dtype=jnp.float32,
                     name="c_fc")(x)
        x = self.act(x)
        return nn.Dense(self.width, dtype=self.dtype,
                        param_dtype=jnp.float32, name="c_proj")(x)


class GatedGPT2Block(nn.Module):
    width: int
    heads: int
    has_cross: bool = False
    gated: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        inner = 4 * self.width
        if self.has_cross:
            self.ln_cross_attn = _ln("ln_cross_attn")
            self.crossattention = GPT2CrossAttention(
                self.width, self.heads, self.dtype, name="crossattention")
            self.ln_2_crossattention = _ln("ln_2_crossattention")
            self.mlp_crossattention = GPT2MLP(
                self.width, inner, squared_relu, self.dtype,
                name="mlp_crossattention")
            if self.gated:
                self.alpha_cattn = self.param(
                    "alpha_cattn", nn.initializers.zeros, ())
                self.alpha_dense = self.param(
                    "alpha_dense", nn.initializers.zeros, ())
        self.ln_1 = _ln("ln_1")
        self.attn = GPT2SelfAttention(self.width, self.heads, self.dtype,
                                      name="attn")
        self.ln_2 = _ln("ln_2")
        self.mlp = GPT2MLP(self.width, inner, gelu_new, self.dtype,
                           name="mlp")

    def _cross(self, x, attend):
        r = x
        y = attend(self.ln_cross_attn(x).astype(self.dtype))
        if self.gated:
            y = jnp.tanh(self.alpha_cattn) * y
        x = r + y
        r = x
        y = self.mlp_crossattention(
            self.ln_2_crossattention(x).astype(self.dtype))
        if self.gated:
            y = jnp.tanh(self.alpha_dense) * y
        return r + y

    def __call__(self, x, enc: Optional[jax.Array] = None):
        if self.has_cross and enc is not None:
            x = self._cross(x, lambda y: self.crossattention(y, enc))
        x = x + self.attn(self.ln_1(x).astype(self.dtype))
        x = x + self.mlp(self.ln_2(x).astype(self.dtype))
        return x

    def cross_kv(self, enc):
        return self.crossattention.kv(enc) if self.has_cross else None

    def decode_step(self, x1, pos, kv_self, ckv):
        """Cached single-token block step.  ``kv_self``: (k, v) caches
        [B, L, W]; ``ckv``: precomputed cross (k, v) or None."""
        if self.has_cross and ckv is not None:
            x1 = self._cross(
                x1, lambda y: self.crossattention.attend(y, *ckv))
        o, kc, vc = self.attn.decode_step(
            self.ln_1(x1).astype(self.dtype), pos, *kv_self)
        x1 = x1 + o
        x1 = x1 + self.mlp(self.ln_2(x1).astype(self.dtype))
        return x1, (kc, vc)


def make_decode_cache(layers: int, batch: int, max_len: int, width: int,
                      dtype=jnp.float32):
    """Zeroed per-layer (k, v) caches for ``decode_one``."""
    z = lambda: jnp.zeros((batch, max_len, width), dtype)
    return tuple((z(), z()) for _ in range(layers))


class GatedGPT2LMHead(nn.Module):
    """GPT-2 LM with cross-attention every ``cross_freq`` layers
    (layer_idx % cross_freq == 0).  GPT2-XL narrator config: width 1600,
    48 layers, 25 heads, cross_freq 3."""

    vocab_size: int = 50257
    max_positions: int = 1024
    width: int = 1600
    layers: int = 48
    heads: int = 25
    cross_freq: int = 3
    gated: bool = True
    dtype: Any = jnp.float32
    # GPipe the 48-block stack over mesh.pp — at GPT-2-XL scale (1.5B
    # params) the decoder + optimizer state exceed one chip's HBM, the
    # case pipeline parallelism exists for.  Teacher-forced training
    # path; cached decode needs the sequential layout.
    pipeline: bool = False
    pipeline_microbatches: int = 8
    # checkpoint each pipeline group (backward recomputes its blocks)
    pipeline_remat: bool = False

    def setup(self):
        self.wte = self.param("wte", nn.initializers.normal(0.02),
                              (self.vocab_size, self.width), jnp.float32)
        self.wpe = self.param("wpe", nn.initializers.normal(0.01),
                              (self.max_positions, self.width), jnp.float32)
        if self.pipeline:
            from avion_tpu.parallel.pipeline_gated import (
                PipelinedGatedDecoder)

            if not self.gated:
                raise NotImplementedError(
                    "pipelined GPT-2 supports the gated-xattn variant")
            self.h = PipelinedGatedDecoder(
                width=self.width, layers=self.layers, heads=self.heads,
                cross_every=self.cross_freq, cross_position="pre",
                act=gelu_new, cross_act=squared_relu, dtype=self.dtype,
                use_flash=False,
                num_microbatches=self.pipeline_microbatches,
                remat=self.pipeline_remat, name="blocks")
        else:
            self.h = [
                GatedGPT2Block(
                    self.width, self.heads,
                    has_cross=(i % self.cross_freq == 0), gated=self.gated,
                    dtype=self.dtype, name=f"h_{i}",
                )
                for i in range(self.layers)
            ]
        self.ln_f = _ln("ln_f")

    def __call__(self, tokens, enc: Optional[jax.Array] = None):
        """tokens: [B, S] int32; enc: [B, M, width] visual tokens.
        Returns logits [B, S, vocab]."""
        s = tokens.shape[1]
        # jnp.take works when params arrive as host numpy (post-import)
        # and tokens are traced
        wte = jnp.asarray(self.wte)
        x = (jnp.take(wte, tokens, axis=0)
             + jnp.asarray(self.wpe)[:s][None]).astype(self.dtype)
        if self.pipeline:
            if enc is None:
                raise ValueError("pipelined GPT-2 requires visual tokens")
            x = self.h(x, enc)
        else:
            for blk in self.h:
                x = blk(x, enc)
        x = self.ln_f(x)
        return x @ wte.T.astype(x.dtype)  # tied LM head

    def precompute_cross(self, enc):
        """Per-block cross-attention (k, v) from the visual tokens
        (None entries for blocks without cross-attention)."""
        if self.pipeline:
            raise RuntimeError(
                "KV-cached decoding needs the sequential block layout; "
                "convert with pipeline_gated.unstack_gated_params and "
                "load into pipeline=False")
        return tuple(blk.cross_kv(enc) for blk in self.h)

    def decode_one(self, tok, pos, kv, cross):
        """One cached decode step.  ``tok``: [B, 1] int32 token at
        position ``pos``; ``kv``: per-layer (k, v) caches (from
        ``make_decode_cache``); ``cross``: ``precompute_cross`` output.
        Returns (next-token logits [B, vocab], kv')."""
        wte = jnp.asarray(self.wte)
        pe = jax.lax.dynamic_slice(jnp.asarray(self.wpe), (pos, 0),
                                   (1, self.width))
        x = (jnp.take(wte, tok, axis=0) + pe[None]).astype(self.dtype)
        new_kv = []
        for blk, kvi, ci in zip(self.h, kv, cross):
            x, kvi = blk.decode_step(x, pos, kvi, ci)
            new_kv.append(kvi)
        x = self.ln_f(x)
        return (x[:, 0] @ wte.T.astype(x.dtype)), tuple(new_kv)
