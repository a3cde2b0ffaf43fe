"""Shared transformer building blocks (flax.linen).

Re-designed from the reference's open_clip-derived blocks
(``avion/models/transformer.py``): fused QKV projection (the layout the
flash kernel wants — mirroring flash-attn's Wqkv fusion that the
reference's checkpoint remap performs at ``avion/models/utils.py:15-98``),
f32 LayerNorm under bf16 compute (``transformer.py:26-41``), LayerScale
(``transformer.py:44-51``), PatchDropout (``transformer.py:54-91``),
DropPath, and per-block gradient rematerialization
(``transformer.py:187-188`` → ``jax.checkpoint``).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.ad_checkpoint
import jax.numpy as jnp

from avion_tpu.ops.attention import attention_packed


def quick_gelu(x):
    # OpenAI CLIP's activation; the reference defines it but never wires
    # it in (SURVEY quirk). We honor use_quick_gelu explicitly.
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNorm(nn.Module):
    """LayerNorm with f32 reductions regardless of input dtype."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
            name="norm",
        )(x.astype(jnp.float32))
        return y.astype(self.dtype)


class LayerScale(nn.Module):
    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (x.shape[-1],),
            jnp.float32,
        )
        return x * gamma.astype(x.dtype)


class DropPath(nn.Module):
    """Stochastic depth (per-sample residual drop)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def patch_dropout(x, rng, prob: float, keep_cls: bool = True):
    """Randomly keep a fraction of tokens (reference ``PatchDropout``,
    ``transformer.py:54-91``).  Keeps a fixed count (static shape) so the
    result stays jit-friendly; token choice varies per batch element."""
    if prob == 0.0:
        return x
    b, s, _ = x.shape
    start = 1 if keep_cls else 0
    n_keep = max(1, int((s - start) * (1.0 - prob)))
    noise = jax.random.uniform(rng, (b, s - start))
    idx = jnp.argsort(noise, axis=-1)[:, :n_keep]  # random subset, unordered
    tokens = jnp.take_along_axis(x[:, start:], idx[..., None], axis=1)
    if keep_cls:
        tokens = jnp.concatenate([x[:, :1], tokens], axis=1)
    return tokens


class Mlp(nn.Module):
    width: int
    hidden_mult: float = 4.0
    act: Callable = nn.gelu
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hidden = int(self.width * self.hidden_mult)
        x = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(x)
        return x


class SelfAttention(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.bfloat16
    use_flash: bool = True
    causal: bool = False
    sequence_parallel: bool = False  # ring attention over the sp axis
    # False: name the flash residuals outside the save_attn policy so
    # this layer's backward re-runs the forward kernel instead of
    # holding out+lse in HBM (remat_policy save_attn_kN)
    save_attn_residuals: bool = True

    def setup(self):
        self.qkv = nn.Dense(3 * self.width, dtype=self.dtype,
                            param_dtype=jnp.float32, name="qkv")
        self.out_proj = nn.Dense(self.width, dtype=self.dtype,
                                 param_dtype=jnp.float32, name="out_proj")

    def __call__(self, x):
        from avion_tpu.ops.attention import _on_tpu

        if self.use_flash and not self.sequence_parallel and _on_tpu():
            return self._call_flash_fused(x)
        w = self.width
        qkv = self.qkv(x)
        if self.sequence_parallel:
            # ring attention: tokens sharded over the "sp" mesh axis,
            # K/V blocks rotate on ICI (beyond-parity long-clip path).
            # On TPU each shard runs the Pallas flash kernel (impl auto)
            from avion_tpu.ops.ring_attention import (
                sequence_parallel_attention)

            b, s, _ = x.shape
            d = w // self.heads
            unpack = lambda t: t.reshape(b, s, self.heads, d)
            o = sequence_parallel_attention(
                unpack(qkv[..., :w]), unpack(qkv[..., w : 2 * w]),
                unpack(qkv[..., 2 * w :]), causal=self.causal,
                impl=None if self.use_flash else "xla")
            o = o.reshape(b, s, w)
            o = jax.ad_checkpoint.checkpoint_name(o, "attn_out")
            return self.out_proj(o)
        # the fused projection's output lanes are [q_all | k_all | v_all]
        # (same layout the 5D reshape would give) — contiguous lane
        # slices, zero transposes on the way into the packed flash kernel
        o = attention_packed(
            qkv[..., :w], qkv[..., w : 2 * w], qkv[..., 2 * w :],
            self.heads, causal=self.causal, use_flash=self.use_flash)
        o = jax.ad_checkpoint.checkpoint_name(o, "attn_out")
        return self.out_proj(o)

    def _call_flash_fused(self, x):
        """TPU fast path: zero-pad the token dim ONCE before the qkv
        projection, then hand the kernels three views of its output —
        removes the per-call q/k/v lane-slice + re-pad data movement
        (~10 ms/layer at ViT-B b224, measured via profiler trace).
        Pad rows of the projection are bias values (finite), which the
        kernels' score bias masks; grad pad rows meet the zero-padded
        input rows in the dense VJP, so nothing leaks."""
        from avion_tpu.ops.attention import attention_fused_qkv

        s = x.shape[1]
        s_pad = (s + 127) // 128 * 128
        if s_pad != s:
            x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
        qkv = self.qkv(x)
        o = attention_fused_qkv(qkv, self.heads, s, causal=self.causal,
                                save_residuals=self.save_attn_residuals)
        # named for selective remat: policy "save_attn" keeps the
        # attention output (the flash kernel additionally names its own
        # out/lse residuals inside its fwd rule, so the rematerialized
        # backward never re-runs the forward kernel)
        o = jax.ad_checkpoint.checkpoint_name(
            o, "attn_out" if self.save_attn_residuals else "attn_out_r")
        return self.out_proj(o)

    def decode_step(self, x1, pos, k_cache, v_cache):
        """KV-cached single-token causal attention for autoregressive
        decoding.  ``x1``: [B, 1, W]; caches [B, L, W]."""
        from avion_tpu.ops.attention import cached_decode_attention

        o, k_cache, v_cache = cached_decode_attention(
            self.qkv(x1), pos, k_cache, v_cache, self.heads)
        return self.out_proj(o.astype(self.dtype)), k_cache, v_cache


class Block(nn.Module):
    """Pre-LN residual attention block (``transformer.py:94-150``).

    ``moe_experts > 0`` swaps the dense MLP for an expert-parallel
    MoE MLP (``ops/moe.py``) — beyond-parity capability."""

    width: int
    heads: int
    mlp_ratio: float = 4.0
    act: Callable = nn.gelu
    dtype: Any = jnp.bfloat16
    use_flash: bool = True
    causal: bool = False
    ls_init_value: Optional[float] = None
    drop_path: float = 0.0
    sequence_parallel: bool = False
    moe_experts: int = 0
    save_attn_residuals: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = LayerNorm(dtype=self.dtype, name="ln_1")(x)
        y = SelfAttention(self.width, self.heads, self.dtype,
                          self.use_flash, self.causal,
                          self.sequence_parallel,
                          self.save_attn_residuals, name="attn")(y)
        if self.ls_init_value is not None:
            y = LayerScale(self.ls_init_value, name="ls_1")(y)
        y = DropPath(self.drop_path, name="dp_1")(y, deterministic)
        x = x + y
        y = LayerNorm(dtype=self.dtype, name="ln_2")(x)
        if self.moe_experts > 0:
            from avion_tpu.ops.moe import MoEMlp

            y = MoEMlp(self.width, experts=self.moe_experts,
                       hidden_mult=self.mlp_ratio, act=self.act,
                       dtype=self.dtype, name="moe_mlp")(y)
        else:
            y = Mlp(self.width, self.mlp_ratio, self.act, self.dtype,
                    name="mlp")(y)
        if self.ls_init_value is not None:
            y = LayerScale(self.ls_init_value, name="ls_2")(y)
        y = DropPath(self.drop_path, name="dp_2")(y, deterministic)
        return x + y


class Transformer(nn.Module):
    """Stack of Blocks with optional per-block remat
    (reference grad checkpointing, ``transformer.py:153-191``)."""

    width: int
    layers: int
    heads: int
    mlp_ratio: float = 4.0
    act: Callable = nn.gelu
    dtype: Any = jnp.bfloat16
    use_flash: bool = True
    causal: bool = False
    ls_init_value: Optional[float] = None
    drop_path_rate: float = 0.0
    remat: bool = False
    remat_policy: str = "save_attn"  # full | save_attn
    sequence_parallel: bool = False
    moe_experts: int = 0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        block_cls = Block
        save_k = self.layers  # layers whose attn residuals are saved
        if self.remat:
            m = re.fullmatch(r"save_attn(?:_k(\d+))?", self.remat_policy)
            if m:
                # save_attn_kN: keep out+lse for the first N layers only
                # — each unsaved layer re-runs its forward attention
                # kernel in the backward but frees ~26 MB/clip of HBM
                # (the batch-256 tuning knob; N defaults to all layers)
                if m.group(1) is not None:
                    save_k = int(m.group(1))
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "attn_lse")
            elif self.remat_policy == "full":
                policy = None  # recompute everything in backward
            else:
                raise ValueError(
                    f"unknown remat_policy {self.remat_policy!r} "
                    f"(expected 'save_attn', 'save_attn_kN' or 'full')")
            block_cls = nn.remat(Block, static_argnums=(2,), policy=policy)
        for i in range(self.layers):
            dp = self.drop_path_rate * i / max(1, self.layers - 1)
            blk = block_cls(
                self.width, self.heads, self.mlp_ratio, self.act, self.dtype,
                self.use_flash, self.causal, self.ls_init_value, dp,
                self.sequence_parallel, self.moe_experts, i < save_k,
                name=f"resblocks_{i}",
            )
            x = blk(x, deterministic) if not self.remat else blk(x, deterministic)
        return x
