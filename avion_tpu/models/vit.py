"""Video Vision Transformer (flax.linen).

Re-design of the reference's open_clip-derived ``VisionTransformer``
(``avion/models/transformer.py:194-377``), TPU-first:

- Patchify is an einops rearrange + Dense ("fast conv1",
  ``transformer.py:310-329``) — on TPU this is the *only* sensible
  formulation: one big MXU matmul, channel-last throughout, no conv at
  all.  Input layout is THWC (what the decode pipeline produces),
  never permuted to CTHW.
- Factorized positional embeddings: spatial (per patch, shared across
  frames) + temporal (per frame, shared across patches), matching
  ``transformer.py:324-329`` so reference checkpoints load exactly.
- CLS-or-GAP pooling (``transformer.py:368-371``).
- PatchDropout (``transformer.py:54-91``) as a static-shape random
  token subset.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from avion_tpu.models.layers import (
    LayerNorm,
    Transformer,
    patch_dropout,
    quick_gelu,
)


class VisionTransformer(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    num_frames: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    output_dim: Optional[int] = 512
    act: Callable = nn.gelu
    dtype: Any = jnp.bfloat16
    use_flash: bool = True
    pooling: str = "cls"  # cls | gap | none (tokens out, for MIR features)
    patch_dropout_rate: float = 0.0
    ls_init_value: Optional[float] = None
    drop_path_rate: float = 0.0
    remat: bool = False
    remat_policy: str = "save_attn"
    # ring attention over the "sp" mesh axis (long-clip path).  Requires
    # pooling in {"gap", "none"} — the CLS token would break the even
    # token split — and no patch dropout.
    sequence_parallel: bool = False
    moe_experts: int = 0  # V-MoE: expert-parallel MLPs in every block
    # GPipe pipeline over the "pp" mesh axis: the layer stack runs as a
    # PipelinedTransformer (stacked [L, ...] params; checkpoint interop
    # via parallel/pipeline.{stack,unstack}_block_params)
    pipeline: bool = False
    pipeline_microbatches: int = 8
    # uint8 inputs normalize INSIDE the (rematerialized) stem: the only
    # video tensor held for the backward is then the uint8 batch itself
    # (4x smaller than bf16 + no separate normalized copy) — an HBM
    # lever for batch 256.  "none" keeps the external-normalize contract
    # (float inputs always pass through unchanged).
    input_norm: str = "none"  # none | openai | imagenet

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: [B, T, H, W, C] float (already normalized). Returns [B, output_dim]
        (or [B, S, width] with pooling='none')."""
        b, t, h, w, c = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        n = gh * gw
        if self.input_norm not in ("none", "openai", "imagenet"):
            # CLI-reachable (model.input_norm=...): a typo must not
            # silently train with the wrong normalization stats
            raise ValueError(f"input_norm must be none|openai|imagenet, "
                             f"got {self.input_norm!r}")
        norm_stats = None
        if self.input_norm != "none" and x.dtype == jnp.uint8:
            from avion_tpu.data.transforms import (IMAGENET_MEAN,
                                                   IMAGENET_STD, OPENAI_MEAN,
                                                   OPENAI_STD)

            norm_stats = ((OPENAI_MEAN, OPENAI_STD)
                          if self.input_norm == "openai"
                          else (IMAGENET_MEAN, IMAGENET_STD))
        else:
            x = x.astype(self.dtype)

        # fast patchify: [B,T,gh,p,gw,p,C] -> [B, T, gh*gw, p*p*C] -> Dense
        conv1 = nn.Dense(self.width, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name="conv1")
        conv1(jnp.zeros((1, p * p * c), self.dtype))  # create params

        def stem(kernel, v):
            if norm_stats is not None:
                from avion_tpu.data.transforms import normalize_video

                v = normalize_video(v, *norm_stats, dtype=self.dtype)
            v = v.reshape(b, t, gh, p, gw, p, c)
            v = v.transpose(0, 1, 2, 4, 3, 5, 6)
            v = v.reshape(b, t, n, p * p * c)
            return v @ kernel.astype(self.dtype)

        kernel = conv1.variables["params"]["kernel"]
        if self.remat:
            # don't keep the transposed [B,T,n,p*p*C] patch tensor for
            # the conv1 dW: recompute it from the (much smaller, resident
            # anyway) video in the backward — ~3.6 MB/clip of HBM
            stem = jax.checkpoint(stem)
        x = stem(kernel, x)

        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.width ** -0.5), (n + 1, self.width),
            jnp.float32,
        )
        x = x + pos[1:].astype(self.dtype)[None, None]
        if t > 1 or self.num_frames > 1:
            # zero-init like the reference (transformer.py:237): image
            # checkpoints (no temporal table) then load with exactly
            # their 2D behavior at every frame position
            tpos = self.param(
                "temporal_embedding", nn.initializers.zeros,
                (self.num_frames, self.width), jnp.float32,
            )
            x = x + tpos[:t].astype(self.dtype)[None, :, None]
        x = x.reshape(b, t * n, self.width)

        if self.sequence_parallel:
            assert self.pooling in ("gap", "none"), (
                "sequence_parallel needs gap/none pooling (no CLS token)")
            assert self.patch_dropout_rate == 0.0, (
                "sequence_parallel is incompatible with patch dropout")
        else:
            cls = self.param(
                "class_embedding", nn.initializers.normal(self.width ** -0.5),
                (self.width,), jnp.float32,
            )
            cls_tok = (cls + pos[0]).astype(self.dtype)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls_tok, (b, 1, self.width)), x], axis=1
            )

        if self.patch_dropout_rate > 0.0 and not deterministic:
            x = patch_dropout(
                x, self.make_rng("patch_dropout"), self.patch_dropout_rate
            )

        x = LayerNorm(dtype=self.dtype, name="ln_pre")(x)
        if self.pipeline:
            assert self.moe_experts == 0 and not self.sequence_parallel, (
                "pipeline excludes moe/sequence_parallel in the same tower")
            assert self.ls_init_value is None and self.drop_path_rate == 0.0
            from avion_tpu.parallel.pipeline import PipelinedTransformer

            x = PipelinedTransformer(
                width=self.width, layers=self.layers, heads=self.heads,
                mlp_ratio=self.mlp_ratio, act=self.act, dtype=self.dtype,
                use_flash=self.use_flash,
                num_microbatches=self.pipeline_microbatches,
                remat=self.remat,
                name="transformer",
            )(x, deterministic)
        else:
            x = Transformer(
                self.width, self.layers, self.heads, self.mlp_ratio,
                self.act, self.dtype, self.use_flash, False,
                self.ls_init_value, self.drop_path_rate, self.remat,
                self.remat_policy, self.sequence_parallel, self.moe_experts,
                name="transformer",
            )(x, deterministic)

        if self.pooling == "none":
            return LayerNorm(dtype=self.dtype, name="ln_post")(x)
        if self.pooling == "gap":
            pooled = x.mean(axis=1)
        else:
            pooled = x[:, 0]
        pooled = LayerNorm(dtype=self.dtype, name="ln_post")(pooled)
        if self.output_dim is not None:
            proj = self.param(
                "proj", nn.initializers.normal(self.width ** -0.5),
                (self.width, self.output_dim), jnp.float32,
            )
            pooled = pooled @ proj.astype(pooled.dtype)
        return pooled
