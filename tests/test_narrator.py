import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avion_tpu.models.narrator import (
    VCLM,
    caption_loss,
    make_generator,
    nucleus_sample_step,
)

pytestmark = pytest.mark.slow  # excluded from the quick CI tier


@pytest.fixture(scope="module")
def tiny_vclm():
    model = VCLM(
        vocab_size=64, context_length=12, width=32, layers=2, heads=2,
        cross_every=1, image_size=32, patch_size=16, num_frames=2,
        vision_width=32, vision_layers=1, vision_heads=2,
        use_flash=False, dtype=jnp.float32,
    )
    video = jnp.zeros((2, 2, 32, 32, 3))
    tokens = jnp.zeros((2, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), video, tokens)["params"]
    return model, params, video


def test_vclm_logits_shape(tiny_vclm):
    model, params, video = tiny_vclm
    tokens = jnp.ones((2, 12), jnp.int32)
    logits = model.apply({"params": params}, video, tokens)
    assert logits.shape == (2, 12, 64)
    assert np.isfinite(np.asarray(logits)).all()


def test_gates_start_closed(tiny_vclm):
    """Zero-initialized tanh gates: visual input has no effect at init
    (the Flamingo/LaViLa property preserving the pretrained LM)."""
    model, params, video = tiny_vclm
    tokens = jnp.ones((2, 12), jnp.int32)
    l1 = model.apply({"params": params}, video, tokens)
    l2 = model.apply({"params": params}, video + 100.0, tokens)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_caption_loss_and_training(tiny_vclm):
    model, params, video = tiny_vclm
    rs = np.random.RandomState(0)
    tokens = jnp.asarray(rs.randint(1, 64, (2, 12)), jnp.int32)

    import optax

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def lf(p):
            logits = model.apply({"params": p}, video, tokens)
            return caption_loss(logits, tokens)
        l, g = jax.value_and_grad(lf)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    losses = []
    for _ in range(8):
        params, opt, l = step(params, opt)
        losses.append(float(l))
    assert losses[-1] < losses[0]
    # gates opened during training
    g = params["block_0"]["attn_gate"]
    assert abs(float(g)) >= 0  # exists and is trainable


def test_nucleus_sampling_filters_tail():
    key = jax.random.PRNGKey(0)
    # one dominant token: top_p=0.5 must always pick it
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    for i in range(5):
        tok = nucleus_sample_step(jax.random.fold_in(key, i), logits,
                                  top_p=0.5)
        assert int(tok[0]) == 0


def test_generation(tiny_vclm):
    model, params, video = tiny_vclm
    gen = make_generator(model, max_len=8, sot=1, eot=2)
    tokens = jax.jit(gen)(params, video, jax.random.PRNGKey(0))
    tokens = np.asarray(tokens)
    assert tokens.shape == (2, 8)
    assert (tokens[:, 0] == 1).all()
    assert tokens.max() < 64
    # after an EOT, everything is padding
    for row in tokens:
        eots = np.nonzero(row == 2)[0]
        if len(eots):
            assert (row[eots[0] + 1 :] == 0).all()


def test_vclm_captioner_end_to_end(tiny_vclm, tmp_path):
    cv2 = pytest.importorskip("cv2")
    model, params, _ = tiny_vclm
    path = str(tmp_path / "v.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 32))
    for i in range(30):
        vw.write(np.full((32, 32, 3), i * 8 % 255, np.uint8))
    vw.release()

    from avion_tpu.tools.narrator import narrate_dataset, vclm_captioner

    cap = vclm_captioner(model, params, num_samples=2, max_len=6)
    out = str(tmp_path / "narr.pkl")
    n = narrate_dataset([path], cap, out, window_sec=1.5, stride_sec=1.5,
                        clip_length=2, crop_size=32, dedup_threshold=1.1)
    import pickle

    rows = pickle.load(open(out, "rb"))
    assert n == len(rows) >= 1
    assert isinstance(rows[0][3], list) and len(rows[0][3]) == 2


def test_narrator_entry_end_to_end(tmp_path):
    cv2 = pytest.importorskip("cv2")
    import os, os.path as osp, pickle, json

    root = str(tmp_path / "data")
    os.makedirs(root)
    samples = []
    for v in range(8):
        d = osp.join(root, f"vid{v}.mp4")
        os.makedirs(d)
        vw = cv2.VideoWriter(osp.join(d, "0.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 32))
        for i in range(20):
            vw.write(np.random.RandomState(i).randint(0, 255, (32, 32, 3),
                                                      np.uint8))
        vw.release()
        samples.append((f"vid{v}", 0.2, 1.8, f"does action {v}"))
    meta = osp.join(root, "meta.pkl")
    pickle.dump(samples, open(meta, "wb"))

    # tiny VCLM registered on the fly
    from avion_tpu.models.registry import register_model
    from avion_tpu.models.narrator import VCLM
    import jax.numpy as jnp

    @register_model("VCLM_TINY_TEST")
    def _tiny(num_frames=2, use_flash_attn=False, **_):
        return VCLM(vocab_size=49408, context_length=16, width=32, layers=1,
                    heads=2, cross_every=1, image_size=32, patch_size=16,
                    num_frames=num_frames, vision_width=32, vision_layers=1,
                    vision_heads=2, use_flash=False, dtype=jnp.float32)

    from avion_tpu.train.train_narrator import main

    out = str(tmp_path / "narr_run")
    main([
        "model.name=VCLM_TINY_TEST",
        "model.use_flash_attn=false",
        f"data.root={root}",
        f"data.train_metadata={meta}",
        "data.chunk_len=2",
        "data.fps=10",
        "data.clip_length=2",
        "data.crop_size=32",
        "data.batch_size=8",
        "data.num_workers=0",
        "optim.epochs=1",
        "optim.lr=1e-3",
        "optim.warmup_epochs=0",
        f"output_dir={out}",
        "print_freq=1",
        "eval_freq=0",
        "mesh.data=8",
    ])
    logs = [json.loads(l) for l in open(osp.join(out, "log.jsonl"))]
    assert any("train/loss" in l for l in logs)


def test_vclm_cached_decode_matches_full(tiny_vclm):
    """decode_one (KV cache) reproduces decode() logits per position."""
    from avion_tpu.models.gpt2_gated import make_decode_cache

    model, params, video = tiny_vclm
    rs = np.random.RandomState(3)
    tokens = jnp.asarray(rs.randint(1, 64, (2, 7)), jnp.int32)
    visual = model.apply({"params": params}, video,
                         method=model.encode_video)
    full = model.apply({"params": params}, tokens, visual,
                       method=model.decode)
    cross = model.apply({"params": params}, visual,
                        method=model.precompute_cross)
    kv = make_decode_cache(model.layers, 2, 7, model.width, jnp.float32)
    outs = []
    for i in range(7):
        logit, kv = model.apply({"params": params}, tokens[:, i : i + 1],
                                i, kv, cross, method=model.decode_one)
        outs.append(np.asarray(logit))
    np.testing.assert_allclose(np.stack(outs, 1), np.asarray(full),
                               atol=1e-4, rtol=1e-4)


def test_vclm_cached_generation_matches_uncached(tiny_vclm):
    """Same RNG stream + f32 → cached and uncached generators sample
    identical token sequences."""
    model, params, video = tiny_vclm
    key = jax.random.PRNGKey(11)
    fast = jax.jit(make_generator(model, max_len=9, sot=62, eot=63,
                                  use_cache=True))(params, video, key)
    slow = jax.jit(make_generator(model, max_len=9, sot=62, eot=63,
                                  use_cache=False))(params, video, key)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_vclm_inference_cast_generates_identical():
    """bf16 weight storage for the VCLM generator is token-exact: the
    bf16-compute model casts kernels at use anyway; token_embedding
    (f32 LM head) and pos_embed (f32 adds) are excluded from the cast."""
    from avion_tpu.eval.runners import cast_inference_params

    model = VCLM(
        vocab_size=64, context_length=12, width=32, layers=2, heads=2,
        cross_every=1, image_size=32, patch_size=16, num_frames=2,
        vision_width=32, vision_layers=1, vision_heads=2,
        use_flash=False, dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(3)
    video = jax.random.normal(rng, (2, 2, 32, 32, 3), jnp.float32)
    tokens = jnp.zeros((2, 12), jnp.int32)
    params = model.init(rng, video, tokens)["params"]
    cast = cast_inference_params(params, model)
    assert any(l.dtype == jnp.bfloat16
               for l in jax.tree_util.tree_leaves(cast))

    key = jax.random.PRNGKey(11)
    for use_cache in (True, False):
        gen = jax.jit(make_generator(model, max_len=9, sot=62, eot=63,
                                     use_cache=use_cache))
        a = gen(params, video, key)
        b = gen(cast, video, key)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
