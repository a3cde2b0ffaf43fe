"""VCLM narrator: visual-conditioned causal language model (flax).

TPU-native counterpart of the reference's vendored LaViLa narrator
(``second_party/lavilla_narrator/lavila/models/gpt2_gated.py`` +
``narrator.py``): a GPT-2-style causal decoder whose blocks carry
tanh-gated cross-attention over visual tokens (the Flamingo/LaViLa
construction — gates initialized at zero so the pretrained LM is
unperturbed at start), fed by a video ViT running in token mode.
Generates pseudo-narrations for unlabeled clips via nucleus sampling.

Differences by design (not a port): the visual tower is this repo's
``VisionTransformer`` (fast patchify + flash attention) rather than
TimeSformer; generation is a jit-compiled ``lax.scan`` over a static
max length with per-step top-p filtering — no Python-loop decoding —
and runs KV-cached single-token decode by default (same construction
as the LaViLa GPT-2 path, ``gpt2_gated.py``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from avion_tpu.models.layers import LayerNorm, Mlp, SelfAttention
from avion_tpu.models.vit import VisionTransformer


class CrossAttention(nn.Module):
    """Decoder-to-visual cross attention (one query stream over a fixed
    set of visual tokens)."""

    width: int
    heads: int
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.q = nn.Dense(self.width, dtype=self.dtype,
                          param_dtype=jnp.float32, name="q")
        self.kv_proj = nn.Dense(2 * self.width, dtype=self.dtype,
                                param_dtype=jnp.float32, name="kv")
        self.out_proj = nn.Dense(self.width, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="out_proj")

    def kv(self, visual):
        """Visual-token k/v — constant per clip; cached generation
        computes them exactly once."""
        b, sv, _ = visual.shape
        d = self.width // self.heads
        kv = self.kv_proj(visual)
        k, v = jnp.split(kv, 2, axis=-1)
        return (k.reshape(b, sv, self.heads, d),
                v.reshape(b, sv, self.heads, d))

    def attend(self, x, k, v):
        b, s, _ = x.shape
        d = self.width // self.heads
        q = self.q(x).reshape(b, s, self.heads, d)
        from avion_tpu.ops.attention import xla_attention

        o = xla_attention(q, k, v)  # visual set is short; XLA is optimal
        o = o.reshape(b, s, self.width)
        return self.out_proj(o)

    def __call__(self, x, visual):
        k, v = self.kv(visual)
        return self.attend(x, k, v)


class GatedDecoderBlock(nn.Module):
    """Causal self-attn + tanh-gated cross-attn + MLP
    (``gpt2_gated.py`` gating semantics: gates start at 0)."""

    width: int
    heads: int
    dtype: Any = jnp.bfloat16
    use_flash: bool = True
    cross_attend: bool = True

    def setup(self):
        self.ln_1 = LayerNorm(dtype=self.dtype, name="ln_1")
        self.attn = SelfAttention(self.width, self.heads, self.dtype,
                                  self.use_flash, causal=True, name="attn")
        if self.cross_attend:
            self.attn_gate = self.param("attn_gate", nn.initializers.zeros,
                                        (), jnp.float32)
            self.ln_x = LayerNorm(dtype=self.dtype, name="ln_x")
            self.xattn = CrossAttention(self.width, self.heads, self.dtype,
                                        name="xattn")
            self.mlp_gate = self.param("mlp_gate", nn.initializers.zeros,
                                       (), jnp.float32)
            self.ln_xm = LayerNorm(dtype=self.dtype, name="ln_xm")
            self.xmlp = Mlp(self.width, 4.0, nn.gelu, self.dtype,
                            name="xmlp")
        self.ln_2 = LayerNorm(dtype=self.dtype, name="ln_2")
        self.mlp = Mlp(self.width, 4.0, nn.gelu, self.dtype, name="mlp")

    def _cross(self, x, attend):
        y = self.ln_x(x)
        y = attend(y)
        x = x + jnp.tanh(self.attn_gate).astype(x.dtype) * y
        y = self.ln_xm(x)
        y = self.xmlp(y)
        return x + jnp.tanh(self.mlp_gate).astype(x.dtype) * y

    def __call__(self, x, visual):
        y = self.ln_1(x)
        y = self.attn(y)
        x = x + y
        if self.cross_attend:
            x = self._cross(x, lambda y: self.xattn(y, visual))
        y = self.ln_2(x)
        y = self.mlp(y)
        return x + y

    def cross_kv(self, visual):
        return self.xattn.kv(visual) if self.cross_attend else None

    def decode_step(self, x1, pos, kv_self, ckv):
        o, kc, vc = self.attn.decode_step(self.ln_1(x1), pos, *kv_self)
        x1 = x1 + o
        if self.cross_attend and ckv is not None:
            x1 = self._cross(x1, lambda y: self.xattn.attend(y, *ckv))
        x1 = x1 + self.mlp(self.ln_2(x1))
        return x1, (kc, vc)


class VCLM(nn.Module):
    """Video-conditioned LM.  ``__call__(video, tokens)`` returns next-
    token logits [B, S, vocab]; ``encode_video`` exposes the visual
    tokens for cached generation."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    cross_every: int = 2  # gated cross-attn on every Nth block
    # visual tower
    image_size: int = 224
    patch_size: int = 16
    num_frames: int = 4
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    use_flash: bool = True
    dtype: Any = jnp.bfloat16
    # GPipe the decoder stack over mesh.pp (parallel/pipeline_gated.py):
    # group-stacked params, cross-attention group boundaries as stage
    # splits.  Training-path feature; cached generation needs the
    # sequential layout (convert with unstack_gated_params).
    pipeline: bool = False
    pipeline_microbatches: int = 8
    # checkpoint each pipeline group (backward recomputes its blocks)
    pipeline_remat: bool = False

    def setup(self):
        self.visual = VisionTransformer(
            image_size=self.image_size, patch_size=self.patch_size,
            num_frames=self.num_frames, width=self.vision_width,
            layers=self.vision_layers, heads=self.vision_heads,
            output_dim=None, pooling="none", dtype=self.dtype,
            use_flash=self.use_flash,
        )
        self.visual_proj = nn.Dense(self.width, dtype=self.dtype,
                                    param_dtype=jnp.float32)
        self.token_embedding = nn.Embed(self.vocab_size, self.width,
                                        param_dtype=jnp.float32)
        self.positional_embedding = self.param(
            "pos_embed", nn.initializers.normal(0.01),
            (self.context_length, self.width), jnp.float32)
        if self.pipeline:
            from avion_tpu.parallel.pipeline_gated import (
                PipelinedGatedDecoder)

            self.blocks = PipelinedGatedDecoder(
                width=self.width, layers=self.layers, heads=self.heads,
                cross_every=self.cross_every, cross_position="mid",
                dtype=self.dtype, use_flash=self.use_flash,
                num_microbatches=self.pipeline_microbatches,
                remat=self.pipeline_remat, name="blocks")
        else:
            self.blocks = [
                GatedDecoderBlock(
                    self.width, self.heads, self.dtype, self.use_flash,
                    cross_attend=(i % self.cross_every == 0),
                    name=f"block_{i}",
                )
                for i in range(self.layers)
            ]
        self.ln_f = LayerNorm(dtype=self.dtype)

    def encode_video(self, video):
        tokens = self.visual(video)            # [B, S_v, vision_width]
        return self.visual_proj(tokens)        # [B, S_v, width]

    def decode(self, tokens, visual):
        x = self.token_embedding(tokens).astype(self.dtype)
        x = x + self.positional_embedding[: x.shape[1]].astype(self.dtype)[None]
        if self.pipeline:
            x = self.blocks(x, visual)
        else:
            for blk in self.blocks:
                x = blk(x, visual)
        x = self.ln_f(x)
        # weight-tied output head
        logits = x.astype(jnp.float32) @ self.token_embedding.embedding.T
        return logits

    def __call__(self, video, tokens):
        return self.decode(tokens, self.encode_video(video))

    # -- KV-cached decoding ---------------------------------------------

    def precompute_cross(self, visual):
        """Per-block cross-attention (k, v) (None for non-cross blocks)."""
        if self.pipeline:
            raise RuntimeError(
                "KV-cached decoding needs the sequential block layout; "
                "convert the checkpoint with pipeline_gated."
                "unstack_gated_params and load into pipeline=False")
        return tuple(blk.cross_kv(visual) for blk in self.blocks)

    def decode_one(self, tok, pos, kv, cross):
        """One cached decode step: ``tok`` [B, 1] at position ``pos``;
        ``kv`` per-layer (k, v) caches; ``cross`` from
        ``precompute_cross``.  Returns (logits [B, vocab], kv')."""
        x = self.token_embedding(tok).astype(self.dtype)
        pe = jax.lax.dynamic_slice(self.positional_embedding, (pos, 0),
                                   (1, self.width))
        x = x + pe[None].astype(self.dtype)
        new_kv = []
        for blk, kvi, ci in zip(self.blocks, kv, cross):
            x, kvi = blk.decode_step(x, pos, kvi, ci)
            new_kv.append(kvi)
        x = self.ln_f(x)
        logits = x[:, 0].astype(jnp.float32) @ self.token_embedding.embedding.T
        return logits, tuple(new_kv)


def caption_loss(logits, tokens, pad_id: int = 0):
    """Shifted next-token CE ignoring padding (narrator training)."""
    from avion_tpu.losses.losses import softmax_cross_entropy

    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    targets = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != pad_id).astype(jnp.float32)
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def nucleus_sample_step(key, logits, top_p: float = 0.95,
                        temperature: float = 0.7):
    """Top-p filtered categorical sample from [B, vocab] logits."""
    logits = logits / jnp.maximum(temperature, 1e-6)
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # smallest set with cumulative prob >= top_p; cutoff logit per row
    idx = jnp.argmax(cum >= top_p, axis=-1)
    cutoff = jnp.take_along_axis(sorted_logits, idx[:, None], axis=-1)
    filtered = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, filtered, axis=-1)


def make_generator(model: VCLM, *, max_len: int = 30, top_p: float = 0.95,
                   temperature: float = 0.7, sot: int = 49406,
                   eot: int = 49407, use_cache: bool = True):
    """Returns a jittable ``generate(params, video, key) -> tokens
    [B, max_len]`` running a lax.scan over decode steps.  With
    ``use_cache`` (default) each step is a KV-cached single-token
    decode; ``use_cache=False`` keeps the full-prefix re-decode
    (same sampled outputs — the RNG stream is step-aligned)."""

    def generate(params, video, key):
        b = video.shape[0]
        visual = model.apply({"params": params}, video,
                             method=model.encode_video)
        tokens = jnp.full((b, max_len), 0, jnp.int32).at[:, 0].set(sot)

        if use_cache:
            from avion_tpu.models.gpt2_gated import make_decode_cache

            cross = model.apply({"params": params}, visual,
                                method=model.precompute_cross)
            kv = make_decode_cache(model.layers, b, max_len, model.width,
                                   model.dtype)

            def step(carry, i):
                tokens, key, done, kv = carry
                tok = jax.lax.dynamic_slice(tokens, (0, i - 1), (b, 1))
                step_logits, kv = model.apply(
                    {"params": params}, tok, i - 1, kv, cross,
                    method=model.decode_one)
                key, sub = jax.random.split(key)
                nxt = nucleus_sample_step(sub, step_logits, top_p,
                                          temperature)
                nxt = jnp.where(done, 0, nxt)
                tokens = tokens.at[:, i].set(nxt)
                done = jnp.logical_or(done, nxt == eot)
                return (tokens, key, done, kv), None

            (tokens, _, _, _), _ = jax.lax.scan(
                step, (tokens, key, jnp.zeros((b,), bool), kv),
                jnp.arange(1, max_len))
            return tokens

        def step(carry, i):
            tokens, key, done = carry
            logits = model.apply({"params": params}, tokens, visual,
                                 method=model.decode)
            key, sub = jax.random.split(key)
            # gather the logits at position i-1 (last real token)
            step_logits = jax.vmap(lambda l, j: l[j])(logits,
                jnp.full((b,), 0) + i - 1)
            nxt = nucleus_sample_step(sub, step_logits, top_p, temperature)
            nxt = jnp.where(done, 0, nxt)
            tokens = tokens.at[:, i].set(nxt)
            done = jnp.logical_or(done, nxt == eot)
            return (tokens, key, done), None

        (tokens, _, _), _ = jax.lax.scan(
            step, (tokens, key, jnp.zeros((b,), bool)),
            jnp.arange(1, max_len))
        return tokens

    return generate
