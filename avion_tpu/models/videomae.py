"""VideoMAE (flax.linen): masked-autoencoder pretraining + finetune ViT.

Re-design of ``avion/models/model_videomae.py``, TPU-first:

- Tubelet patchify is channel-last rearrange + Dense (the reference's
  "channel-last Linear" fast path, ``model_videomae.py:139-172``) — one
  MXU matmul, no Conv3d.
- The encoder sees only visible tokens (``model_videomae.py:376-393``,
  ``x[~mask]``): with a fixed mask ratio the visible count is static, so
  the gather is a static-shape ``take_along_axis`` over indices computed
  from the mask — fully jit-compatible, no boolean indexing.
- Fixed sincos positional table (``model_videomae.py:177-187``).
- The decoder receives visible tokens + learned mask token, each with
  its positional embedding, and predicts pixels for the masked tubes
  only (``model_videomae.py:400-465``).
- The reference's split q/v bias (no k bias, ``model_videomae.py:57-101``)
  is loaded as a fused qkv bias with zero k-bias: a key bias shifts all
  logits of a query equally, so it is softmax-invariant and dropping it
  is mathematically identical.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from avion_tpu.models.layers import LayerNorm, Transformer


def sincos_pos_embed(n_pos: int, dim: int) -> np.ndarray:
    """Fixed sinusoid table (``model_videomae.py:177-187``)."""
    pos = np.arange(n_pos)[:, None]
    i = np.arange(dim)[None, :]
    angle = pos / np.power(10000, 2 * (i // 2) / dim)
    table = np.zeros((n_pos, dim), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


def split_mask_indices(mask: jax.Array, n_visible: int):
    """mask: [B, N] bool (True = masked). Returns (visible_idx [B, n_vis],
    masked_idx [B, N - n_vis]) preserving original token order (stable
    sort), matching the reference's ``x[~mask]`` semantics."""
    order = jnp.argsort(mask.astype(jnp.int32), axis=-1, stable=True)
    return order[:, :n_visible], order[:, n_visible:]


def _gather_tokens(x, idx):
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def tube_patchify(video, patch_size: int, tubelet_size: int):
    """[B,T,H,W,C] -> [B, N, tubelet*p*p*C] tube tokens (channel-last)."""
    b, t, h, w, c = video.shape
    p, ts = patch_size, tubelet_size
    gh, gw = h // p, w // p
    x = video.reshape(b, t // ts, ts, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # B,T',gh,gw,ts,p,p,C
    return x.reshape(b, (t // ts) * gh * gw, ts * p * p * c)


class PretrainVideoMAE(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    num_frames: int = 16
    tubelet_size: int = 2
    encoder_width: int = 768
    encoder_layers: int = 12
    encoder_heads: int = 12
    decoder_width: int = 384
    decoder_layers: int = 4
    decoder_heads: int = 6
    mask_ratio: float = 0.9
    use_flash: bool = True
    remat: bool = False
    remat_policy: str = "save_attn"
    drop_path_rate: float = 0.0
    dtype: Any = jnp.bfloat16

    @property
    def num_patches(self) -> int:
        g = self.image_size // self.patch_size
        return (self.num_frames // self.tubelet_size) * g * g

    @property
    def n_visible(self) -> int:
        # matches TubeMaskingGenerator: masked count = int(n_per_frame *
        # ratio) * frames; visible is the complement (transforms.py:255-276)
        g = self.image_size // self.patch_size
        per_frame = g * g
        n_frames = self.num_frames // self.tubelet_size
        n_masked = int(per_frame * self.mask_ratio) * n_frames
        return self.num_patches - n_masked

    @property
    def patch_dim(self) -> int:
        return self.tubelet_size * self.patch_size * self.patch_size * 3

    @nn.compact
    def __call__(self, video, mask, deterministic: bool = True):
        """video: [B,T,H,W,C] normalized; mask: [B, N] bool, True = masked,
        with a fixed per-sample masked count (tube masking guarantees it).
        Returns (pred [B, n_masked, patch_dim], masked_idx [B, n_masked])."""
        visible_idx, masked_idx = split_mask_indices(mask, self.n_visible)

        # gather visible pixel-tokens BEFORE the embed matmul: at 90%
        # masking this makes patch_embed 10x cheaper than embed-then-
        # gather (the fused "masked patchify" the BASELINE asks for —
        # expressed as gather + Dense, which XLA fuses)
        tokens = tube_patchify(video, self.patch_size, self.tubelet_size)
        vis_tokens = _gather_tokens(tokens.astype(self.dtype), visible_idx)
        xv = nn.Dense(self.encoder_width, dtype=self.dtype,
                      param_dtype=jnp.float32, name="patch_embed")(vis_tokens)
        pos = jnp.asarray(sincos_pos_embed(self.num_patches,
                                           self.encoder_width)
                          ).astype(self.dtype)
        pos_vis_enc = _gather_tokens(
            jnp.broadcast_to(pos[None], (xv.shape[0],) + pos.shape),
            visible_idx,
        )
        xv = xv + pos_vis_enc  # [B, n_vis, W]

        xv = Transformer(
            self.encoder_width, self.encoder_layers, self.encoder_heads, 4.0,
            nn.gelu, self.dtype, self.use_flash, False, None,
            self.drop_path_rate, self.remat, self.remat_policy,
            name="encoder",
        )(xv, deterministic)
        xv = LayerNorm(dtype=self.dtype, name="encoder_norm")(xv)
        xv = nn.Dense(self.decoder_width, use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="encoder_to_decoder")(xv)

        dpos = jnp.asarray(
            sincos_pos_embed(self.num_patches, self.decoder_width)
        ).astype(self.dtype)
        b = xv.shape[0]
        dpos_b = jnp.broadcast_to(dpos[None], (b,) + dpos.shape)
        pos_vis = _gather_tokens(dpos_b, visible_idx)
        pos_mask = _gather_tokens(dpos_b, masked_idx)
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (self.decoder_width,),
            jnp.float32,
        ).astype(self.dtype)
        n_masked = masked_idx.shape[1]
        dm = jnp.broadcast_to(
            mask_token, (b, n_masked, self.decoder_width)
        ) + pos_mask
        full = jnp.concatenate([xv + pos_vis, dm], axis=1)

        full = Transformer(
            self.decoder_width, self.decoder_layers, self.decoder_heads, 4.0,
            nn.gelu, self.dtype, self.use_flash, False, None, 0.0, self.remat,
            self.remat_policy,
            name="decoder",
        )(full, deterministic)
        full = LayerNorm(dtype=self.dtype, name="decoder_norm")(full)
        pred = nn.Dense(self.patch_dim, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="decoder_head")(
            full[:, -n_masked:]
        )
        return pred, masked_idx


class FinetuneVideoMAE(nn.Module):
    """Supervised video ViT (``model_videomae.py:190-306``): tubelet
    patchify, sincos pos embed, mean pooling + fc_norm, linear head."""

    image_size: int = 224
    patch_size: int = 16
    num_frames: int = 16
    tubelet_size: int = 2
    width: int = 768
    layers: int = 12
    heads: int = 12
    num_classes: int = 400
    use_flash: bool = True
    remat: bool = False
    remat_policy: str = "save_attn"
    drop_path_rate: float = 0.1
    fc_drop_rate: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, video, deterministic: bool = True):
        x = tube_patchify(video.astype(self.dtype), self.patch_size,
                          self.tubelet_size)
        x = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="patch_embed")(x)
        pos = jnp.asarray(sincos_pos_embed(x.shape[1], self.width))
        x = x + pos.astype(self.dtype)[None]
        x = Transformer(
            self.width, self.layers, self.heads, 4.0, nn.gelu, self.dtype,
            self.use_flash, False, None, self.drop_path_rate, self.remat,
            self.remat_policy,
            name="encoder",
        )(x, deterministic)
        x = x.mean(axis=1)
        x = LayerNorm(dtype=jnp.float32, name="fc_norm")(x)
        x = nn.Dropout(self.fc_drop_rate)(x, deterministic=deterministic)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="head")(x)
