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
"""

from __future__ import annotations

import math
from typing import Any, Optional

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


class GPT2SelfAttention(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.width
        qkv = nn.Dense(3 * w, dtype=self.dtype, param_dtype=jnp.float32,
                       name="c_attn")(x)
        o = attention_packed(qkv[..., :w], qkv[..., w : 2 * w],
                             qkv[..., 2 * w :], self.heads, causal=True,
                             use_flash=False)
        return nn.Dense(w, dtype=self.dtype, param_dtype=jnp.float32,
                        name="c_proj")(o)


class GPT2CrossAttention(nn.Module):
    """q from text, k/v from the visual tokens (HF cross Conv1D layout:
    q_attn [W, W] + c_attn [W_enc, 2W])."""

    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, enc):
        w, h = self.width, self.heads
        d = w // h
        b, s, _ = x.shape
        m = enc.shape[1]
        q = nn.Dense(w, dtype=self.dtype, param_dtype=jnp.float32,
                     name="q_attn")(x)
        kv = nn.Dense(2 * w, dtype=self.dtype, param_dtype=jnp.float32,
                      name="c_attn")(enc)
        k, v = kv[..., :w], kv[..., w:]
        q = q.reshape(b, s, h, d).transpose(0, 2, 1, 3).astype(jnp.float32)
        k = k.reshape(b, m, h, d).transpose(0, 2, 1, 3).astype(jnp.float32)
        v = v.reshape(b, m, h, d).transpose(0, 2, 1, 3).astype(jnp.float32)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d)
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, w).astype(self.dtype)
        return nn.Dense(w, dtype=self.dtype, param_dtype=jnp.float32,
                        name="c_proj")(o)


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

    @nn.compact
    def __call__(self, x, enc: Optional[jax.Array] = None):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       param_dtype=jnp.float32, name=name)
        inner = 4 * self.width
        if self.has_cross and enc is not None:
            r = x
            y = GPT2CrossAttention(self.width, self.heads, self.dtype,
                                   name="crossattention")(
                ln("ln_cross_attn")(x).astype(self.dtype), enc)
            if self.gated:
                a = self.param("alpha_cattn", nn.initializers.zeros, ())
                y = jnp.tanh(a) * y
            x = r + y
            r = x
            y = GPT2MLP(self.width, inner, squared_relu, self.dtype,
                        name="mlp_crossattention")(
                ln("ln_2_crossattention")(x).astype(self.dtype))
            if self.gated:
                a = self.param("alpha_dense", nn.initializers.zeros, ())
                y = jnp.tanh(a) * y
            x = r + y
        x = x + GPT2SelfAttention(self.width, self.heads, self.dtype,
                                  name="attn")(
            ln("ln_1")(x).astype(self.dtype))
        x = x + GPT2MLP(self.width, inner, gelu_new, self.dtype,
                        name="mlp")(ln("ln_2")(x).astype(self.dtype))
        return x


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

    @nn.compact
    def __call__(self, tokens, enc: Optional[jax.Array] = None):
        """tokens: [B, S] int32; enc: [B, M, width] visual tokens.
        Returns logits [B, S, vocab]."""
        wte = self.param("wte", nn.initializers.normal(0.02),
                         (self.vocab_size, self.width), jnp.float32)
        wpe = self.param("wpe", nn.initializers.normal(0.01),
                         (self.max_positions, self.width), jnp.float32)
        s = tokens.shape[1]
        # jnp.take works when params arrive as host numpy (post-import)
        # and tokens are traced
        x = (jnp.take(jnp.asarray(wte), tokens, axis=0)
             + jnp.asarray(wpe)[:s][None]).astype(self.dtype)
        for i in range(self.layers):
            x = GatedGPT2Block(
                self.width, self.heads,
                has_cross=(i % self.cross_freq == 0), gated=self.gated,
                dtype=self.dtype, name=f"h_{i}",
            )(x, enc)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="ln_f")(x)
        return x @ jnp.asarray(wte).T.astype(x.dtype)  # tied LM head
