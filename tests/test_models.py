import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avion_tpu.models import create_model, list_models
from avion_tpu.models.videomae import PretrainVideoMAE

pytestmark = pytest.mark.slow  # excluded from the quick CI tier


def test_registry_lists_families():
    names = list_models()
    for n in ("CLIP_VITB16", "CLIP_VITL14", "CLIP_VITL14_336PX",
              "VIDEOMAE_VITB16", "VIDEOMAE_VITB16_FT"):
        assert n in names


def test_h128_variant_matches_vitb16_param_shapes():
    # the TPU speed variant differs ONLY in the head split: 6x128 vs
    # 12x64.  Same widths -> identical parameter tree (checkpoint
    # layout compatible); different attention grouping.
    b16 = create_model("CLIP_VITB16", num_frames=4)
    h128 = create_model("CLIP_VITB16_H128", num_frames=4)
    assert b16.vision_heads == 12 and h128.vision_heads == 6
    assert (b16.vision_width, b16.vision_layers, b16.patch_size) == (
        h128.vision_width, h128.vision_layers, h128.patch_size)
    assert b16.vision_width % h128.vision_heads == 0
    assert b16.vision_width // h128.vision_heads == 128

    mae = create_model("VIDEOMAE_VITB16")
    mae128 = create_model("VIDEOMAE_VITB16_H128")
    assert (mae.encoder_width, mae.decoder_width) == (
        mae128.encoder_width, mae128.decoder_width)
    assert mae128.encoder_width // mae128.encoder_heads == 128
    assert mae128.decoder_width // mae128.decoder_heads == 128

    l128 = create_model("CLIP_VITL14_H128")
    assert l128.vision_width // l128.vision_heads == 128
    assert (l128.vision_width, l128.vision_layers) == (1024, 24)


@pytest.fixture(scope="module")
def tiny_clip():
    # shrunken dims for CPU test speed; same module code path
    from avion_tpu.models.clip import CLIP

    model = CLIP(
        embed_dim=32, image_size=32, patch_size=16, num_frames=4,
        vision_width=64, vision_layers=2, vision_heads=2,
        context_length=13, vocab_size=128, text_width=32, text_heads=2,
        text_layers=2, use_flash=False, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    video = jnp.zeros((2, 4, 32, 32, 3))
    text = jnp.zeros((2, 13), jnp.int32).at[:, 3].set(127)
    params = model.init(rng, video, text)
    return model, params, video, text


def test_clip_forward_shapes(tiny_clip):
    model, params, video, text = tiny_clip
    out = model.apply(params, video, text)
    assert out["image_embed"].shape == (2, 32)
    assert out["text_embed"].shape == (2, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_embed"]), axis=-1), 1.0,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(out["logit_scale"]), 1 / 0.07, rtol=1e-5
    )


def test_clip_param_names_match_sharding_conventions(tiny_clip):
    _, params, _, _ = tiny_clip
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(getattr(k, "key", k)) for k in p) for p, _ in flat}
    assert any("qkv" in n for n in names)
    assert any("fc1" in n for n in names)
    assert any("out_proj" in n for n in names)
    assert any("logit_scale" in n for n in names)


def test_videomae_pretrain_shapes():
    model = PretrainVideoMAE(
        image_size=32, patch_size=16, num_frames=4, tubelet_size=2,
        encoder_width=48, encoder_layers=1, encoder_heads=2,
        decoder_width=32, decoder_layers=1, decoder_heads=2,
        mask_ratio=0.5, use_flash=False, dtype=jnp.float32,
    )
    n = model.num_patches  # 2 * 2*2 = 8
    assert n == 8
    n_vis = model.n_visible
    rng = jax.random.PRNGKey(0)
    video = jax.random.normal(rng, (2, 4, 32, 32, 3))
    # per-row fixed masked count (tube masking invariant)
    mask = np.zeros((2, n), bool)
    mask[:, : n - n_vis] = True
    mask = jnp.asarray(np.stack([np.random.permutation(m) for m in mask]))
    params = model.init(rng, video, mask)
    pred, masked_idx = model.apply(params, video, mask)
    assert pred.shape == (2, n - n_vis, model.patch_dim)
    # masked_idx rows point at masked positions
    m = np.asarray(mask)
    mi = np.asarray(masked_idx)
    for b in range(2):
        assert set(mi[b]) == set(np.nonzero(m[b])[0])


def test_videomae_finetune_shapes():
    from avion_tpu.models.videomae import FinetuneVideoMAE

    model = FinetuneVideoMAE(
        image_size=32, num_frames=4, width=48, layers=1, heads=2,
        num_classes=10, use_flash=False, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    video = jnp.zeros((2, 4, 32, 32, 3))
    params = model.init(rng, video)
    logits = model.apply(params, video)
    assert logits.shape == (2, 10)


def test_freeze_temperature_keeps_loaded_value_blocks_grad():
    """freeze_temperature must preserve a checkpoint-loaded logit_scale
    (reference freezes via requires_grad_(False), it does not reset)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avion_tpu.models.clip import CLIP

    model = CLIP(embed_dim=16, image_size=16, patch_size=8, num_frames=2,
                 vision_width=32, vision_layers=1, vision_heads=2,
                 context_length=8, vocab_size=64, text_width=32,
                 text_heads=2, text_layers=1, use_flash=False,
                 dtype=jnp.float32, freeze_temperature=True)
    video = jnp.zeros((2, 2, 16, 16, 3))
    text = jnp.zeros((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), video, text)["params"]
    loaded = 3.21  # pretend this came from a checkpoint
    params["logit_scale"] = jnp.asarray(loaded)

    out = model.apply({"params": params}, video, text)
    np.testing.assert_allclose(float(out["logit_scale"]), np.exp(loaded),
                               rtol=1e-6)

    def loss(p):
        o = model.apply({"params": p}, video, text)
        return (o["logit_scale"] * (o["image_embed"] * o["text_embed"]).sum())

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["logit_scale"])) == 0.0


def test_input_norm_in_stem_matches_external_normalize():
    """CLIP with input_norm='openai' consumes the raw uint8 batch and
    must match external normalize_video + the default model exactly
    (the batch-256 HBM lever keeps only the uint8 copy alive)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avion_tpu.data.transforms import normalize_video
    from avion_tpu.models import create_model

    m0 = create_model("CLIP_TINY")
    m1 = create_model("CLIP_TINY", input_norm="openai")
    rs = np.random.RandomState(0)
    video_u8 = rs.randint(0, 256, (2, 2, 32, 32, 3)).astype(np.uint8)
    text = rs.randint(1, 49408, (2, 77)).astype(np.int32)
    vf = normalize_video(jnp.asarray(video_u8), dtype=jnp.float32)
    params = jax.jit(m0.init)(jax.random.PRNGKey(0), vf,
                              jnp.asarray(text))["params"]
    out0 = m0.apply({"params": params}, vf, jnp.asarray(text))
    out1 = m1.apply({"params": params}, jnp.asarray(video_u8),
                    jnp.asarray(text))
    for k in ("image_embed", "text_embed"):
        np.testing.assert_allclose(np.asarray(out1[k]), np.asarray(out0[k]),
                                   atol=2e-5, rtol=2e-5)
    # float inputs pass through unchanged even with input_norm set
    out2 = m1.apply({"params": params}, vf, jnp.asarray(text))
    np.testing.assert_allclose(np.asarray(out2["image_embed"]),
                               np.asarray(out0["image_embed"]), atol=1e-6)


def test_save_attn_kn_policy_grads_match():
    """remat_policy='save_attn_kN' changes only WHAT is saved for the
    backward, never the math: grads must match the full save_attn
    policy exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avion_tpu.models import create_model

    rs = np.random.RandomState(0)
    video = jnp.asarray(rs.rand(2, 2, 32, 32, 3), jnp.float32)
    text = jnp.asarray(rs.randint(1, 49408, (2, 77)), jnp.int32)

    def grads(policy):
        m = create_model("CLIP_TINY", use_grad_checkpointing=True,
                         remat_policy=policy)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), video,
                                 text)["params"]

        def loss(p):
            out = m.apply({"params": p}, video, text)
            return jnp.sum(out["image_embed"] * out["text_embed"])

        return params, jax.grad(loss)(params)

    p0, g0 = grads("save_attn")
    p1, g1 = grads("save_attn_k1")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-6),
        g0, g1)


def test_inference_param_cast_is_exact():
    """cast_inference_params (bf16 weight storage for serving/eval)
    must be numerically IDENTICAL to f32 storage: the bf16-compute
    model casts every matrix param to bf16 at use anyway, so the
    rounding happens either way."""
    from avion_tpu.eval.runners import cast_inference_params
    from avion_tpu.models.clip import CLIP

    model = CLIP(
        embed_dim=32, image_size=32, patch_size=16, num_frames=2,
        vision_width=64, vision_layers=2, vision_heads=2,
        context_length=13, vocab_size=128, text_width=32, text_heads=2,
        text_layers=2, use_flash=False, dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    video = jax.random.randint(rng, (2, 2, 32, 32, 3), 0, 255,
                               jnp.uint8).astype(jnp.float32) / 255.0
    text = jnp.zeros((2, 13), jnp.int32).at[:, 3].set(127)
    params = model.init(rng, video, text)["params"]
    cast = cast_inference_params(params, model)

    # matrix params became bf16; vectors/scalars stayed f32
    leaves = jax.tree_util.tree_leaves(cast)
    assert any(l.dtype == jnp.bfloat16 and l.ndim >= 2 for l in leaves)
    assert all(l.dtype == jnp.float32 for l in leaves if l.ndim < 2)

    out_f32 = model.apply({"params": params}, video, text)
    out_cast = model.apply({"params": cast}, video, text)
    for k in ("image_embed", "text_embed"):
        np.testing.assert_array_equal(np.asarray(out_f32[k], np.float32),
                                      np.asarray(out_cast[k], np.float32))

    # f32-compute models are untouched
    m32 = CLIP(
        embed_dim=32, image_size=32, patch_size=16, num_frames=2,
        vision_width=64, vision_layers=2, vision_heads=2,
        context_length=13, vocab_size=128, text_width=32, text_heads=2,
        text_layers=2, use_flash=False, dtype=jnp.float32,
    )
    assert cast_inference_params(params, m32) is params


def test_inference_param_cast_excludes_moe_router():
    """The MoE router Dense is f32-declared (routing decisions are
    discrete top-k): the inference cast must leave its kernel f32 and
    keep outputs identical."""
    from avion_tpu.eval.runners import cast_inference_params
    from avion_tpu.models.clip import CLIP

    model = CLIP(
        embed_dim=32, image_size=32, patch_size=16, num_frames=2,
        vision_width=64, vision_layers=2, vision_heads=2,
        context_length=13, vocab_size=128, text_width=32, text_heads=2,
        text_layers=2, use_flash=False, dtype=jnp.bfloat16,
        moe_experts=4,
    )
    rng = jax.random.PRNGKey(0)
    video = jax.random.randint(rng, (2, 2, 32, 32, 3), 0, 255,
                               jnp.uint8).astype(jnp.float32) / 255.0
    text = jnp.zeros((2, 13), jnp.int32).at[:, 3].set(127)
    params = model.init(rng, video, text)["params"]
    cast = cast_inference_params(params, model)

    flat = jax.tree_util.tree_flatten_with_path(cast)[0]
    routers = [l for p, l in flat
               if "router" in "/".join(str(getattr(k, "key", k))
                                       for k in p).lower()]
    assert routers and all(l.dtype == jnp.float32 for l in routers)

    a = model.apply({"params": params}, video, text,
                    mutable=["losses", "metrics", "moe_zloss"])[0]
    b = model.apply({"params": cast}, video, text,
                    mutable=["losses", "metrics", "moe_zloss"])[0]
    np.testing.assert_array_equal(np.asarray(a["image_embed"], np.float32),
                                  np.asarray(b["image_embed"], np.float32))


def test_int8_weight_only_encoders_close():
    """weight_dtype='int8' (serving opt-in): quantized leaves really
    are int8, excluded tables stay float, and embeddings remain close
    to the exact bf16 path (per-channel symmetric quantization)."""
    from avion_tpu.eval.runners import CLIPEncoders
    from avion_tpu.models.clip import CLIP

    model = CLIP(
        embed_dim=32, image_size=32, patch_size=16, num_frames=2,
        vision_width=64, vision_layers=2, vision_heads=2,
        context_length=13, vocab_size=128, text_width=32, text_heads=2,
        text_layers=2, use_flash=False, dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    video = jax.random.randint(rng, (3, 2, 32, 32, 3), 0, 255, jnp.uint8)
    text = np.zeros((3, 13), np.int32)
    text[:, 3] = 127
    params = model.init(rng, jnp.asarray(video, jnp.float32),
                        jnp.asarray(text))["params"]

    exact = CLIPEncoders(model, params, batch=4)
    q = CLIPEncoders(model, params, batch=4, weight_dtype="int8")
    leaves, scales = q.params
    assert any(l.dtype == jnp.int8 for l in leaves)
    # every int8 leaf has a scale; excluded leaves have none
    for l, s in zip(leaves, scales):
        assert (l.dtype == jnp.int8) == (s is not None)

    for name, a, b in (
        ("img", exact.encode_images(np.asarray(video)),
         q.encode_images(np.asarray(video))),
        ("txt", exact.encode_texts(text), q.encode_texts(text)),
    ):
        cos = np.sum(a * b, -1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
        assert cos.min() > 0.98, (name, cos)

    import pytest

    with pytest.raises(ValueError):
        CLIPEncoders(model, params, batch=4, weight_dtype="int4")


def test_quantize_dequantize_error_bound():
    """Per-output-channel int8 quantization: reconstruction error is
    bounded by half a quantization step per element."""
    from avion_tpu.eval.runners import (dequantize_params,
                                        quantize_inference_params)

    rs = np.random.RandomState(0)
    params = {"layer": {"kernel": rs.randn(64, 32).astype(np.float32) * 0.2,
                        "bias": rs.randn(32).astype(np.float32)}}

    class M:
        dtype = jnp.bfloat16

    leaves, scales, treedef = quantize_inference_params(params, M())
    out = dequantize_params(leaves, scales, treedef, dtype=jnp.float32)
    w, w2 = params["layer"]["kernel"], np.asarray(out["layer"]["kernel"])
    step = np.abs(w).max(axis=0, keepdims=True) / 127.0
    assert (np.abs(w - w2) <= 0.5 * step + 1e-7).all()
    # bias (1-D) passes through untouched
    np.testing.assert_array_equal(np.asarray(out["layer"]["bias"]),
                                  params["layer"]["bias"])
