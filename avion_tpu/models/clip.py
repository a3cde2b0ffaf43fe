"""CLIP dual encoder + classifier head (flax.linen).

Re-design of ``avion/models/model_clip.py``: the CLIP container returns
L2-normalized embeddings plus the learnable logit scale
(``model_clip.py:91-99``); ``VideoClassifier`` puts a dropout+linear
head on the visual tower (``model_clip.py:15-38``).  The logit-scale
clamp the reference applies in the trainer
(``scripts/main_lavila_pretrain.py:880``) lives in the train step here.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from avion_tpu.models.layers import quick_gelu
from avion_tpu.models.text import TextTransformer
from avion_tpu.models.vit import VisionTransformer


class CLIP(nn.Module):
    embed_dim: int = 512
    # vision
    image_size: int = 224
    patch_size: int = 16
    num_frames: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    # text
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    # knobs
    use_quick_gelu: bool = True
    use_flash: bool = True
    pooling: str = "cls"
    patch_dropout_rate: float = 0.0
    remat: bool = False
    remat_policy: str = "save_attn"
    sequence_parallel: bool = False  # ring attention in the visual tower
    moe_experts: int = 0  # V-MoE visual tower (expert-parallel MLPs)
    pipeline: bool = False  # GPipe the visual tower over mesh.pp
    pipeline_microbatches: int = 8
    input_norm: str = "none"  # uint8-in-stem normalize (see vit.py)
    freeze_temperature: bool = False
    temperature_init: float = 0.07
    # SigLIP head: learnable pairwise-logit bias (arXiv:2303.15343);
    # pair with temperature_init=0.1 (logit_scale = ln 10) and the
    # sigmoid loss (losses.siglip_loss / siglip_loss_chunked)
    use_logit_bias: bool = False
    logit_bias_init: float = -10.0
    dtype: Any = jnp.bfloat16

    def setup(self):
        act = quick_gelu if self.use_quick_gelu else nn.gelu
        self.visual = VisionTransformer(
            image_size=self.image_size, patch_size=self.patch_size,
            num_frames=self.num_frames, width=self.vision_width,
            layers=self.vision_layers, heads=self.vision_heads,
            output_dim=self.embed_dim, act=act, dtype=self.dtype,
            use_flash=self.use_flash, pooling=self.pooling,
            patch_dropout_rate=self.patch_dropout_rate, remat=self.remat,
            remat_policy=self.remat_policy,
            sequence_parallel=self.sequence_parallel,
            moe_experts=self.moe_experts,
            pipeline=self.pipeline,
            pipeline_microbatches=self.pipeline_microbatches,
            input_norm=self.input_norm,
        )
        self.textual = TextTransformer(
            context_length=self.context_length, vocab_size=self.vocab_size,
            width=self.text_width, heads=self.text_heads,
            layers=self.text_layers, output_dim=self.embed_dim, act=act,
            dtype=self.dtype, use_flash=self.use_flash, remat=self.remat,
            remat_policy=self.remat_policy,
        )
        self.logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(math.log(1.0 / self.temperature_init)),
            (), jnp.float32,
        )
        if self.use_logit_bias:
            self.logit_bias = self.param(
                "logit_bias",
                nn.initializers.constant(self.logit_bias_init),
                (), jnp.float32,
            )

    def encode_image(self, image, deterministic: bool = True):
        emb = self.visual(image, deterministic)
        return _l2norm(emb)

    def encode_text(self, text, deterministic: bool = True):
        emb = self.textual(text, deterministic)
        return _l2norm(emb)

    def __call__(self, image, text, deterministic: bool = True):
        img = self.encode_image(image, deterministic)
        txt = self.encode_text(text, deterministic)
        scale = jnp.exp(self.logit_scale)
        if self.freeze_temperature:
            # keep the (possibly checkpoint-loaded) value, just block its
            # gradient — the reference freezes the loaded parameter via
            # requires_grad_(False), it does not reset it
            scale = jax.lax.stop_gradient(scale)
        out = {"image_embed": img, "text_embed": txt, "logit_scale": scale}
        if self.use_logit_bias:
            out["logit_bias"] = self.logit_bias
        return out


def _l2norm(x, eps: float = 1e-8):
    x = x.astype(jnp.float32)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


class VideoClassifier(nn.Module):
    """Linear classification head over the visual tower
    (``model_clip.py:15-38``; visual projection dropped, width features)."""

    vision: VisionTransformer
    num_classes: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, image, deterministic: bool = True):
        feats = self.vision(image, deterministic)
        feats = nn.Dropout(self.dropout)(feats, deterministic=deterministic)
        return nn.Dense(
            self.num_classes, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=nn.initializers.truncated_normal(0.02), name="fc_cls",
        )(feats.astype(jnp.float32))
