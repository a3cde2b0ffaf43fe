"""TimeSformer (SpaceTimeTransformer) in flax — the LaViLa narrator's
vision tower.

Re-implementation of the divided space-time attention ViT the narrator
checkpoints use (``second_party/lavilla_narrator/lavila/models/
timesformer.py``, "frozen-in-time" attention style), TPU-first:
patchify is a Dense over channel-first patch vectors (one MXU matmul,
importing the Conv2d kernel flattened), the divided attentions are
batched reshapes + one einsum each, no per-frame python loops.

Block semantics (``SpaceTimeBlock.forward``):

    t = timeattn(norm3(x));  t = tanh(alpha_timeattn) * t   [if gated]
    time_residual = x + t
    s = attn(norm1(time_residual))
    space_residual = x + s          # residual from X, frozen-in-time
    x = space_residual + mlp(norm2(space_residual))

Both divided attentions keep the CLS token global: the CLS query
attends over every token; patch queries attend within their frame
(space) or across frames at their grid position (time), each group
augmented with the CLS key/value.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from avion_tpu.models.layers import quick_gelu


def _attend(q, k, v):
    """Plain softmax attention over [..., S, D] with f32 accumulation."""
    d = q.shape[-1]
    logits = jnp.einsum("...qd,...kd->...qk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / math.sqrt(d)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", p, v.astype(jnp.float32))


class DividedAttention(nn.Module):
    """One VarAttention: CLS-global + grouped patch attention."""

    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mode: str, f: int, n: int):
        # x: [B, 1 + f*n, W]
        b, s, w = x.shape
        h = self.heads
        d = w // h
        qkv = nn.Dense(3 * w, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(x)
        qkv = qkv.reshape(b, s, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, S, H, D]

        # heads to the front: [B, H, S, D]
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        cls_q, q_ = q[:, :, :1], q[:, :, 1:]
        cls_k, k_ = k[:, :, :1], k[:, :, 1:]
        cls_v, v_ = v[:, :, :1], v[:, :, 1:]

        # CLS attends over everything
        cls_out = _attend(cls_q, k, v)  # [B, H, 1, D]

        # group the patch tokens: tokens are laid out frame-major
        # [f, n];  space groups = per-frame [.., f, n, D], time groups =
        # per-grid-position [.., n, f, D]
        def group(t):
            t = t.reshape(b, h, f, n, d)
            return t if mode == "space" else t.transpose(0, 1, 3, 2, 4)

        qg, kg, vg = group(q_), group(k_), group(v_)
        g = qg.shape[2]  # number of groups (f for space, n for time)
        # CLS key/value joins every group
        clsk = jnp.broadcast_to(cls_k[:, :, None], (b, h, g, 1, d))
        clsv = jnp.broadcast_to(cls_v[:, :, None], (b, h, g, 1, d))
        kg = jnp.concatenate([clsk, kg], axis=3)
        vg = jnp.concatenate([clsv, vg], axis=3)
        out = _attend(qg, kg, vg)  # [B, H, g, len, D]
        if mode == "time":
            out = out.transpose(0, 1, 3, 2, 4)  # back to [.., f, n, D]
        out = out.reshape(b, h, f * n, d)
        out = jnp.concatenate([cls_out, out], axis=2)  # [B, H, S, D]
        out = out.transpose(0, 2, 1, 3).reshape(b, s, w).astype(self.dtype)
        return nn.Dense(w, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class SpaceTimeBlock(nn.Module):
    width: int
    heads: int
    mlp_ratio: float = 4.0
    act: Callable = nn.gelu
    dtype: Any = jnp.float32
    gated_timeattn: bool = False
    ln_eps: float = 1e-6  # EgoVLP checkpoints use torch-default 1e-5

    @nn.compact
    def __call__(self, x, f: int, n: int):
        ln = lambda name: nn.LayerNorm(epsilon=self.ln_eps,
                                       dtype=jnp.float32,
                                       param_dtype=jnp.float32, name=name)
        t = DividedAttention(self.width, self.heads, self.dtype,
                             name="timeattn")(ln("norm3")(x), "time", f, n)
        if self.gated_timeattn:
            alpha = self.param("alpha_timeattn", nn.initializers.zeros, ())
            t = jnp.tanh(alpha) * t
        time_residual = x + t
        s = DividedAttention(self.width, self.heads, self.dtype,
                             name="attn")(ln("norm1")(time_residual),
                                          "space", f, n)
        space_residual = x + s  # frozen-in-time: residual from x
        y = ln("norm2")(space_residual)
        hidden = int(self.width * self.mlp_ratio)
        y = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc1")(y)
        y = self.act(y)
        y = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc2")(y)
        return space_residual + y


class SpaceTimeTransformer(nn.Module):
    """LaViLa/Frozen-in-time video ViT (CLIP-initialized ln_pre flavor).

    Returns all tokens [B, 1+f*n, W] when ``cls_at_last=False`` (the
    narrator path) or the CLS feature [B, W] otherwise."""

    image_size: int = 224
    patch_size: int = 16
    num_frames: int = 4
    width: int = 1024
    layers: int = 24
    heads: int = 16
    mlp_ratio: float = 4.0
    act: Callable = quick_gelu
    ln_pre: bool = True  # CLIP-style
    gated_timeattn: bool = False
    ln_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cls_at_last: bool = False):
        """x: [B, T, H, W, C] float (normalized)."""
        b, t, hh, ww, c = x.shape
        p = self.patch_size
        gh, gw = hh // p, ww // p
        n = gh * gw
        x = x.astype(self.dtype)
        # patchify as Dense over CHANNEL-FIRST patch vectors (the Conv2d
        # kernel [D, C, p, p] flattens straight into this layout)
        x = x.reshape(b, t, gh, p, gw, p, c)
        x = x.transpose(0, 1, 2, 4, 6, 3, 5)  # B,T,gh,gw,C,p,p
        x = x.reshape(b, t * n, c * p * p)
        x = nn.Dense(self.width, use_bias=not self.ln_pre, dtype=self.dtype,
                     param_dtype=jnp.float32, name="patch_embed")(x)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (self.width,), jnp.float32)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (n + 1, self.width), jnp.float32)
        tpos = self.param("temporal_embed", nn.initializers.zeros,
                          (self.num_frames, self.width), jnp.float32)
        x = x.reshape(b, t, n, self.width)
        x = x + pos[1:].astype(self.dtype)[None, None]
        x = x + tpos[:t].astype(self.dtype)[None, :, None]
        x = x.reshape(b, t * n, self.width)
        cls_tok = (cls + pos[0]).astype(self.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_tok, (b, 1, self.width)), x], axis=1)
        if self.ln_pre:
            x = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                             param_dtype=jnp.float32,
                             name="ln_pre")(x).astype(self.dtype)
        for i in range(self.layers):
            x = SpaceTimeBlock(self.width, self.heads, self.mlp_ratio,
                               self.act, self.dtype, self.gated_timeattn,
                               self.ln_eps, name=f"blocks_{i}")(x, t, n)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="norm")(x)
        if cls_at_last:
            return x[:, 0].astype(self.dtype)
        return x.astype(self.dtype)
