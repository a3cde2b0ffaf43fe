"""LaViLa narrator (VCLM_HF) in flax: TimeSformer video tokens pooled
into 256 learned queries that a gated GPT-2 decoder cross-attends.

Re-implementation of ``second_party/lavilla_narrator/lavila/models/
narrator.py`` (VCLM_HF) — the dataset factory that generates pseudo-
narrations for Ego4D clips.  With the released checkpoint imported
(``models/lavila_import.py``), ``generate`` produces narrations for a
clip batch; ``tools/narrator.py`` provides the windowing/dedup
pipeline around it.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from avion_tpu.models.gpt2_gated import GatedGPT2LMHead
from avion_tpu.models.timesformer import SpaceTimeTransformer


class AttentionPool(nn.Module):
    """CoCa-style query pooling (``coca.py:CrossAttention``): learned
    queries attend over the visual tokens; k/v are single-head
    (multi-query attention), q has ``heads`` heads of ``dim_head``."""

    dim: int          # query/text width
    context_dim: int  # visual width
    heads: int = 8
    dim_head: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, context):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       param_dtype=jnp.float32, name=name)
        q_in = ln("norm")(queries).astype(self.dtype)
        ctx = ln("context_norm")(context).astype(self.dtype)
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_q")(q_in)
        kv = nn.Dense(2 * self.dim_head, use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="to_kv")(ctx)
        k, v = kv[..., : self.dim_head], kv[..., self.dim_head :]
        b, n, _ = q.shape
        q = q.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        q = q.astype(jnp.float32) / math.sqrt(self.dim_head)
        sim = jnp.einsum("bhid,bjd->bhij", q, k.astype(jnp.float32))
        p = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjd->bhid", p, v.astype(jnp.float32))
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32,
                        name="to_out")(out.astype(self.dtype))


class LavilaNarrator(nn.Module):
    """VCLM_HF: SpaceTimeTransformer + query pool + gated GPT-2."""

    # vision (TimeSformer-L @ 336px defaults)
    image_size: int = 336
    patch_size: int = 14
    num_frames: int = 4
    vision_width: int = 1024
    vision_layers: int = 24
    vision_heads: int = 16
    # text decoder (GPT2-XL defaults)
    vocab_size: int = 50257
    max_positions: int = 1024
    text_width: int = 1600
    text_layers: int = 48
    text_heads: int = 25
    cross_freq: int = 3
    gated_xattn: bool = True
    # pool
    num_img_queries: int = 256
    pool_heads: int = 8
    pool_dim_head: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        self.visual = SpaceTimeTransformer(
            image_size=self.image_size, patch_size=self.patch_size,
            num_frames=self.num_frames, width=self.vision_width,
            layers=self.vision_layers, heads=self.vision_heads,
            dtype=self.dtype, name="visual")
        self.text_decoder = GatedGPT2LMHead(
            vocab_size=self.vocab_size, max_positions=self.max_positions,
            width=self.text_width,
            layers=self.text_layers, heads=self.text_heads,
            cross_freq=self.cross_freq, gated=self.gated_xattn,
            dtype=self.dtype, name="text_decoder")
        self.img_queries = self.param(
            "img_queries", nn.initializers.normal(self.text_width ** -0.5),
            (self.num_img_queries, self.text_width), jnp.float32)
        self.img_attn_pool = AttentionPool(
            self.text_width, self.vision_width, self.pool_heads,
            self.pool_dim_head, self.dtype, name="img_attn_pool")
        self.img_attn_pool_norm = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
            name="img_attn_pool_norm")

    def encode_image(self, video):
        """video: [B, T, H, W, C] normalized -> [B, num_queries, text_w]."""
        tokens = self.visual(video, cls_at_last=False)  # [B, 1+fn, Wv]
        b = tokens.shape[0]
        q = jnp.broadcast_to(self.img_queries.astype(self.dtype)[None],
                             (b,) + self.img_queries.shape)
        pooled = self.img_attn_pool(q, tokens)
        return self.img_attn_pool_norm(pooled).astype(self.dtype)

    def __call__(self, video, text):
        """Teacher-forced logits: text [B, S] -> logits over text[:, :-1]
        predicting text[:, 1:] (``VCLM_HF.forward``)."""
        img = self.encode_image(video)
        logits = self.text_decoder(text[:, :-1], img)
        return {"logits": logits, "labels": text[:, 1:]}

    def _sample(self, logit, rng, temperature, top_p):
        """Greedy (rng None) or nucleus sample from [B, V] logits."""
        logit = logit / max(temperature, 1e-6)
        if rng is None:
            return jnp.argmax(logit, axis=-1).astype(jnp.int32), rng
        new_rng, sub = jax.random.split(rng)
        sorted_logits = jnp.sort(logit, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum((cum < top_p).astype(jnp.int32), axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None],
                                     axis=-1)
        filtered = jnp.where(logit < cutoff, -1e30, logit)
        return jax.random.categorical(sub, filtered).astype(jnp.int32), \
            new_rng

    def generate(self, video, prompt, *, max_len: int = 77,
                 temperature: float = 0.7, top_p: float = 0.95,
                 rng: Optional[jax.Array] = None, use_cache: bool = True):
        """Nucleus sampling continuation of ``prompt`` [B, S0] given the
        clip.  Greedy when rng is None.  Returns [B, max_len] ids.

        ``use_cache=True`` (default) runs KV-cached single-token decode
        — ~``max_len``x fewer decoder FLOPs than the reference's
        full-prefix re-decode at GPT-2-XL scale; greedy output is
        identical to the uncached path (sampled draws differ only in
        RNG stream alignment)."""
        img = self.encode_image(video)
        b, s0 = prompt.shape
        tokens = jnp.zeros((b, max_len), jnp.int32)
        tokens = tokens.at[:, :s0].set(prompt)

        if use_cache:
            from avion_tpu.models.gpt2_gated import make_decode_cache

            cross = self.text_decoder.precompute_cross(img)
            kv = make_decode_cache(self.text_decoder.layers, b, max_len,
                                   self.text_width, self.dtype)

            def step(carry, i):
                tokens, rng, kv = carry
                # feed the token at i-1 (prompt prefill for i < s0,
                # generated otherwise); logits predict position i
                tok = jax.lax.dynamic_slice(tokens, (0, i - 1), (b, 1))
                logit, kv = self.text_decoder.decode_one(tok, i - 1, kv,
                                                         cross)
                nxt, new_rng = self._sample(logit, rng, temperature, top_p)
                write = i >= s0
                tokens = jnp.where(write, tokens.at[:, i].set(nxt), tokens)
                return (tokens, new_rng, kv), None

            (tokens, _, _), _ = jax.lax.scan(
                step, (tokens, rng, kv), jnp.arange(1, max_len))
            return tokens

        def step(carry, i):
            tokens, rng = carry
            logits = self.text_decoder(tokens, img)  # [B, max_len, V]
            idx = jnp.clip(i - 1, 0, max_len - 1)
            nxt, new_rng = self._sample(logits[:, idx], rng, temperature,
                                        top_p)
            write = (i >= s0) & (i < max_len)
            tokens = jnp.where(
                write,
                tokens.at[:, jnp.clip(i, 0, max_len - 1)].set(nxt),
                tokens)
            return (tokens, new_rng), None

        (tokens, _), _ = jax.lax.scan(
            step, (tokens, rng), jnp.arange(s0, max_len))
        return tokens
