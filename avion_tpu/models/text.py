"""CLIP text transformer (flax.linen).

Re-design of ``avion/models/transformer.py:380-478``: token embedding +
learned positional embedding, causal transformer (causality handled
inside the flash kernel instead of an additive mask tensor), final
LayerNorm, EOT-token pooling (argmax over token ids,
``transformer.py:474``), linear projection to the joint space.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from avion_tpu.models.layers import LayerNorm, Transformer


class TextTransformer(nn.Module):
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    output_dim: Optional[int] = 512
    act: Callable = nn.gelu
    dtype: Any = jnp.bfloat16
    use_flash: bool = True
    remat: bool = False
    remat_policy: str = "save_attn"

    @nn.compact
    def __call__(self, text, deterministic: bool = True):
        """text: [B, context_length] int32 token ids. Returns [B, output_dim]."""
        emb = nn.Embed(
            self.vocab_size, self.width, param_dtype=jnp.float32,
            name="token_embedding",
        )
        x = emb(text).astype(self.dtype)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width), jnp.float32,
        )
        x = x + pos[: x.shape[1]].astype(self.dtype)[None]
        x = Transformer(
            self.width, self.layers, self.heads, 4.0, self.act, self.dtype,
            self.use_flash, True, None, 0.0, self.remat, self.remat_policy,
            name="transformer",
        )(x, deterministic)
        x = LayerNorm(dtype=self.dtype, name="ln_final")(x)
        # EOT token = highest id in each sequence (CLIP BPE: EOT is max id)
        eot = jnp.argmax(text, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        if self.output_dim is not None:
            proj = self.param(
                "text_projection", nn.initializers.normal(self.width ** -0.5),
                (self.width, self.output_dim), jnp.float32,
            )
            pooled = pooled @ proj.astype(pooled.dtype)
        return pooled
