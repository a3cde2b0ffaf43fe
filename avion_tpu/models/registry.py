"""Model registry: name -> factory.

Replaces the reference's ``getattr(model_clip, args.model)`` lookup
(``scripts/main_lavila_pretrain.py:265``) with an explicit registry.
Factory names and hyperparameters match the reference factories
(``avion/models/model_clip.py:102-341``, ``model_videomae.py:583-604``).
"""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def list_models():
    return sorted(_REGISTRY)


def create_model(name: str, **kwargs):
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {list_models()}")
    return _REGISTRY[name](**kwargs)


def _clip_factory(
    *,
    patch_size,
    vision_width,
    vision_layers,
    vision_heads,
    image_size=224,
    text_width=512,
    text_heads=8,
    text_layers=12,
):
    def build(
        num_frames: int = 16,
        project_embed_dim: int = 512,
        use_quick_gelu: bool = True,
        use_flash_attn: bool = True,
        use_grad_checkpointing: bool = False,
        remat_policy: str = "save_attn",
        sequence_parallel: bool = False,
        moe_experts: int = 0,
        pipeline: bool = False,
        pipeline_microbatches: int = 8,
        input_norm: str = "none",
        patch_dropout: float = 0.0,
        pooling: str = "cls",
        freeze_temperature: bool = False,
        temperature_init: float = 0.07,
        use_logit_bias: bool = False,
        dtype=None,
        **_unused,
    ):
        import jax.numpy as jnp

        from avion_tpu.models.clip import CLIP

        return CLIP(
            embed_dim=project_embed_dim,
            image_size=image_size,
            patch_size=patch_size,
            num_frames=num_frames,
            vision_width=vision_width,
            vision_layers=vision_layers,
            vision_heads=vision_heads,
            text_width=text_width,
            text_heads=text_heads,
            text_layers=text_layers,
            use_quick_gelu=use_quick_gelu,
            use_flash=use_flash_attn,
            pooling=pooling,
            patch_dropout_rate=patch_dropout,
            remat=use_grad_checkpointing,
            remat_policy=remat_policy,
            sequence_parallel=sequence_parallel,
            moe_experts=moe_experts,
            pipeline=pipeline,
            pipeline_microbatches=pipeline_microbatches,
            input_norm=input_norm,
            freeze_temperature=freeze_temperature,
            temperature_init=temperature_init,
            use_logit_bias=use_logit_bias,
            dtype=dtype if dtype is not None else jnp.bfloat16,
        )

    return build


# hyperparameters per avion/models/model_clip.py:102-341
register_model("CLIP_VITB16")(
    _clip_factory(patch_size=16, vision_width=768, vision_layers=12,
                  vision_heads=12)
)
register_model("CLIP_VITB16_H128")(
    # TPU speed variant (beyond parity, for from-scratch pretraining):
    # same widths/depths/params as CLIP_VITB16 but 6 heads of dim 128
    # instead of 12 of dim 64, so every attention matmul contracts over
    # the MXU's full 128 lanes.  Parameter-shape compatible with
    # CLIP_VITB16 checkpoints (qkv/out kernels do not depend on the
    # head split) but NOT function-equivalent: 12-head pretrained
    # weights produce different attention patterns under a 6-head
    # split, so use this for new training runs, not weight import.
    # Measured: fused-qkv flash fwd+bwd 8.08 ms vs 11.53 ms at ViT-B
    # pretrain shapes (tools/bench_attention.py --heads 6, v5e).
    _clip_factory(patch_size=16, vision_width=768, vision_layers=12,
                  vision_heads=6)
)
register_model("CLIP_VITL14")(
    _clip_factory(patch_size=14, vision_width=1024, vision_layers=24,
                  vision_heads=16, text_width=768, text_heads=12,
                  text_layers=12)
)
register_model("CLIP_VITL14_H128")(
    # TPU speed geometry for ViT-L (see CLIP_VITB16_H128): 8 heads of
    # dim 128 instead of 16 of 64.  Attention fwd+bwd at ViT-L pretrain
    # shapes (S=1025, W=1024): 13.75 -> 9.00 ms (bench_attention, v5e).
    _clip_factory(patch_size=14, vision_width=1024, vision_layers=24,
                  vision_heads=8, text_width=768, text_heads=12,
                  text_layers=12)
)
register_model("CLIP_VITL14_336PX")(
    _clip_factory(patch_size=14, vision_width=1024, vision_layers=24,
                  vision_heads=16, image_size=336, text_width=768,
                  text_heads=12, text_layers=12)
)


@register_model("VCLM_VITB16")
def _vclm_vitb16(
    num_frames: int = 4,
    use_flash_attn: bool = True,
    cross_every: int = 2,
    dtype=None,
    pipeline: bool = False,
    pipeline_microbatches: int = 8,
    pipeline_remat: bool = False,
    vision_heads: int = 12,
    heads: int = 8,
    **_unused,
):
    """Narrator VCLM: ViT-B/16 video tokens + gated-cross-attn causal
    decoder (the reference's LaViLa narrator role,
    ``second_party/lavilla_narrator``).  ``vision_heads``/``heads``
    expose the H128 geometry (6/4) for from-scratch narrator training;
    see CLIP_VITB16_H128."""
    import jax.numpy as jnp

    from avion_tpu.models.narrator import VCLM

    return VCLM(
        vocab_size=49408, context_length=77, width=512, layers=12,
        heads=heads,
        cross_every=cross_every, image_size=224, patch_size=16,
        num_frames=num_frames, vision_width=768, vision_layers=12,
        vision_heads=vision_heads, use_flash=use_flash_attn,
        dtype=dtype if dtype is not None else jnp.bfloat16,
        pipeline=pipeline, pipeline_microbatches=pipeline_microbatches,
        pipeline_remat=pipeline_remat,
    )


@register_model("CLIP_TINY")
def _clip_tiny(
    num_frames: int = 2,
    project_embed_dim: int = 32,
    use_flash_attn: bool = False,
    use_grad_checkpointing: bool = False,
    remat_policy: str = "save_attn",
    use_quick_gelu: bool = True,
    moe_experts: int = 0,
    pipeline: bool = False,
    pipeline_microbatches: int = 2,
    input_norm: str = "none",
    use_logit_bias: bool = False,
    temperature_init: float = 0.07,
    dtype=None,
    **_unused,
):
    """Miniature CLIP for smoke tests / CI (not in the reference)."""
    import jax.numpy as jnp

    from avion_tpu.models.clip import CLIP

    return CLIP(
        embed_dim=project_embed_dim, image_size=32, patch_size=16,
        num_frames=num_frames, vision_width=64, vision_layers=2,
        vision_heads=2, context_length=77, vocab_size=49408, text_width=32,
        text_heads=2, text_layers=2, use_quick_gelu=use_quick_gelu,
        use_flash=use_flash_attn, remat=use_grad_checkpointing,
        remat_policy=remat_policy, moe_experts=moe_experts,
        pipeline=pipeline, pipeline_microbatches=pipeline_microbatches,
        input_norm=input_norm,
        use_logit_bias=use_logit_bias, temperature_init=temperature_init,
        dtype=dtype if dtype is not None else jnp.float32,
    )


@register_model("VIDEOMAE_TINY")
def _videomae_tiny(num_frames: int = 4, use_flash_attn: bool = False,
                   mask_ratio: float = 0.5, dtype=None, **_unused):
    """Miniature VideoMAE for smoke tests / CI (not in the reference)."""
    import jax.numpy as jnp

    from avion_tpu.models.videomae import PretrainVideoMAE

    return PretrainVideoMAE(
        image_size=32, patch_size=16, num_frames=num_frames, tubelet_size=2,
        encoder_width=48, encoder_layers=1, encoder_heads=2,
        decoder_width=32, decoder_layers=1, decoder_heads=2,
        mask_ratio=mask_ratio, use_flash=use_flash_attn,
        dtype=dtype if dtype is not None else jnp.float32,
    )


@register_model("VIDEOMAE_TINY_FT")
def _videomae_tiny_ft(num_frames: int = 4, num_classes: int = 10,
                      use_flash_attn: bool = False, dtype=None, **_unused):
    import jax.numpy as jnp

    from avion_tpu.models.videomae import FinetuneVideoMAE

    return FinetuneVideoMAE(
        image_size=32, patch_size=16, num_frames=num_frames, tubelet_size=2,
        width=48, layers=1, heads=2, num_classes=num_classes,
        use_flash=use_flash_attn,
        dtype=dtype if dtype is not None else jnp.float32,
    )


@register_model("VIDEOMAE_VITB16")
def _videomae_vitb16(
    num_frames: int = 16,
    use_flash_attn: bool = True,
    use_grad_checkpointing: bool = False,
    remat_policy: str = "save_attn",
    decoder_depth: int = 4,
    drop_path_rate: float = 0.0,
    mask_ratio: float = 0.9,
    dtype=None,
    **_unused,
):
    import jax.numpy as jnp

    from avion_tpu.models.videomae import PretrainVideoMAE

    return PretrainVideoMAE(
        image_size=224, patch_size=16, num_frames=num_frames,
        encoder_width=768, encoder_layers=12, encoder_heads=12,
        decoder_width=384, decoder_layers=decoder_depth, decoder_heads=6,
        tubelet_size=2, mask_ratio=mask_ratio, use_flash=use_flash_attn,
        remat=use_grad_checkpointing, remat_policy=remat_policy,
        drop_path_rate=drop_path_rate,
        dtype=dtype if dtype is not None else jnp.bfloat16,
    )


@register_model("VIDEOMAE_VITB16_H128")
def _videomae_vitb16_h128(
    num_frames: int = 16,
    use_flash_attn: bool = True,
    use_grad_checkpointing: bool = False,
    remat_policy: str = "save_attn",
    decoder_depth: int = 4,
    drop_path_rate: float = 0.0,
    mask_ratio: float = 0.9,
    dtype=None,
    **_unused,
):
    """TPU speed geometry (beyond parity, from-scratch pretraining):
    VIDEOMAE_VITB16 with head_dim 128 — encoder 6x128, decoder 3x128 —
    so attention contracts over the MXU's full 128 lanes.  Same
    widths/params/FLOPs; measured fwd+bwd: decoder (S=1569, W=384)
    11.20 -> 7.60 ms, encoder (S_pad=256, W=768) 4.25 -> 3.49 ms
    (tools/bench_attention.py, v5e).  Not for importing 12-head
    reference checkpoints."""
    import jax.numpy as jnp

    from avion_tpu.models.videomae import PretrainVideoMAE

    return PretrainVideoMAE(
        image_size=224, patch_size=16, num_frames=num_frames,
        encoder_width=768, encoder_layers=12, encoder_heads=6,
        decoder_width=384, decoder_layers=decoder_depth, decoder_heads=3,
        tubelet_size=2, mask_ratio=mask_ratio, use_flash=use_flash_attn,
        remat=use_grad_checkpointing, remat_policy=remat_policy,
        drop_path_rate=drop_path_rate,
        dtype=dtype if dtype is not None else jnp.bfloat16,
    )


@register_model("VIDEOMAE_VITB16_FT")
def _videomae_vitb16_ft(
    num_frames: int = 16,
    num_classes: int = 400,
    use_flash_attn: bool = True,
    use_grad_checkpointing: bool = False,
    remat_policy: str = "save_attn",
    drop_path_rate: float = 0.1,
    fc_drop_rate: float = 0.0,
    dtype=None,
    **_unused,
):
    import jax.numpy as jnp

    from avion_tpu.models.videomae import FinetuneVideoMAE

    return FinetuneVideoMAE(
        image_size=224, patch_size=16, num_frames=num_frames,
        width=768, layers=12, heads=12, num_classes=num_classes,
        tubelet_size=2, use_flash=use_flash_attn,
        remat=use_grad_checkpointing, remat_policy=remat_policy,
        drop_path_rate=drop_path_rate,
        fc_drop_rate=fc_drop_rate,
        dtype=dtype if dtype is not None else jnp.bfloat16,
    )


@register_model("VCLM_OPENAI_TIMESFORMER_LARGE_336PX_GPT2_XL")
def _lavila_narrator_xl(num_frames: int = 4, gated_xattn: bool = True,
                        dtype=None, **_unused):
    """The released LaViLa narrator (``lavilla_narrator/main.py:57``):
    TimeSformer-L @ 336px + gated GPT-2 XL, cross-attn every 3 layers.
    Import weights with ``models/lavila_import.import_lavila_narrator_pt``."""
    import jax.numpy as jnp

    from avion_tpu.models.lavila import LavilaNarrator

    return LavilaNarrator(
        image_size=336, patch_size=14, num_frames=num_frames,
        vision_width=1024, vision_layers=24, vision_heads=16,
        vocab_size=50257, text_width=1600, text_layers=48, text_heads=25,
        cross_freq=3, gated_xattn=gated_xattn,
        dtype=dtype if dtype is not None else jnp.bfloat16,
    )


@register_model("LAVILA_NARRATOR_TINY")
def _lavila_narrator_tiny(num_frames: int = 2, gated_xattn: bool = True,
                          dtype=None, **_unused):
    """Miniature narrator for tests/CI (not in the reference)."""
    import jax.numpy as jnp

    from avion_tpu.models.lavila import LavilaNarrator

    return LavilaNarrator(
        image_size=32, patch_size=16, num_frames=num_frames,
        vision_width=48, vision_layers=2, vision_heads=2,
        vocab_size=96, text_width=32, text_layers=3, text_heads=2,
        cross_freq=3, gated_xattn=gated_xattn, num_img_queries=8,
        pool_heads=2, pool_dim_head=16,
        dtype=dtype if dtype is not None else jnp.float32,
    )
