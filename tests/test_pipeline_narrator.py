"""Pipelined gated decoders (narrator VCLM + LaViLa GPT-2 interop).

Contract: the group-stacked GPipe decoder (parallel/pipeline_gated.py)
must match the sequential block stack exactly — forward logits, and
gradients through the caption loss — on a multi-device CPU mesh, with
checkpoint layout conversion working in both directions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avion_tpu.models.gpt2_gated import GatedGPT2LMHead
from avion_tpu.models.narrator import VCLM, caption_loss
from avion_tpu.parallel import make_mesh
from avion_tpu.parallel.pipeline import adapt_stacked_layouts
from avion_tpu.parallel.pipeline_gated import (stack_gated_params,
                                               unstack_gated_params)

pytestmark = pytest.mark.slow  # excluded from the quick CI tier

VCLM_KW = dict(
    vocab_size=64, context_length=12, width=32, layers=4, heads=2,
    cross_every=2, image_size=16, patch_size=8, num_frames=2,
    vision_width=32, vision_layers=2, vision_heads=2, use_flash=False,
    dtype=jnp.float32,
)


def _data(b=4):
    rng = jax.random.PRNGKey(7)
    video = jax.random.uniform(rng, (b, 2, 16, 16, 3), jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(8), (b, 12), 0, 64)
    return video, tokens


def _models(m=2):
    seq = VCLM(**VCLM_KW)
    pipe = VCLM(pipeline=True, pipeline_microbatches=m, **VCLM_KW)
    return seq, pipe


def test_vclm_pipeline_forward_matches_sequential():
    video, tokens = _data()
    seq, pipe = _models()
    seq_params = seq.init(jax.random.PRNGKey(0), video, tokens)["params"]
    ref = seq.apply({"params": seq_params}, video, tokens)

    pipe_tpl = jax.eval_shape(
        lambda: pipe.init(jax.random.PRNGKey(0), video, tokens))["params"]
    pipe_params = adapt_stacked_layouts(seq_params, pipe_tpl)
    # converted tree must structurally match the pipelined init
    assert jax.tree_util.tree_structure(
        jax.tree.map(lambda x: 0, pipe_params)) == \
        jax.tree_util.tree_structure(jax.tree.map(lambda x: 0, pipe_tpl))

    mesh = make_mesh(data=4, pp=2)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, v, t: pipe.apply({"params": p}, v, t))(
            pipe_params, video, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("m", [1, 2, 4])
def test_vclm_pipeline_microbatch_counts(m):
    video, tokens = _data(b=4)
    seq, pipe = _models(m)
    seq_params = seq.init(jax.random.PRNGKey(0), video, tokens)["params"]
    ref = seq.apply({"params": seq_params}, video, tokens)
    pipe_tpl = jax.eval_shape(
        lambda: pipe.init(jax.random.PRNGKey(0), video, tokens))["params"]
    pipe_params = adapt_stacked_layouts(seq_params, pipe_tpl)
    mesh = make_mesh(data=4, pp=2)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, v, t: pipe.apply({"params": p}, v, t))(
            pipe_params, video, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_vclm_pipeline_gradients_match_sequential():
    video, tokens = _data()
    seq, pipe = _models()
    seq_params = seq.init(jax.random.PRNGKey(0), video, tokens)["params"]
    pipe_tpl = jax.eval_shape(
        lambda: pipe.init(jax.random.PRNGKey(0), video, tokens))["params"]
    pipe_params = adapt_stacked_layouts(seq_params, pipe_tpl)

    def loss_seq(p):
        return caption_loss(seq.apply({"params": p}, video, tokens), tokens)

    def loss_pipe(p):
        return caption_loss(pipe.apply({"params": p}, video, tokens), tokens)

    g_seq = jax.grad(loss_seq)(seq_params)
    mesh = make_mesh(data=4, pp=2)
    with jax.set_mesh(mesh):
        g_pipe = jax.jit(jax.grad(loss_pipe))(pipe_params)
    # compare in the stacked layout
    g_seq_stacked = adapt_stacked_layouts(g_seq, pipe_tpl)
    flat_a = jax.tree_util.tree_leaves_with_path(g_seq_stacked)
    flat_b = dict(
        ("/".join(str(getattr(k, "key", k)) for k in path), leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(g_pipe))
    for path, leaf in flat_a:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[name]), atol=5e-4,
            rtol=5e-3, err_msg=name)


def test_vclm_pipeline_meshless_fallback():
    """No pp axis in context -> sequential group scan, same numbers."""
    video, tokens = _data()
    seq, pipe = _models()
    seq_params = seq.init(jax.random.PRNGKey(0), video, tokens)["params"]
    ref = seq.apply({"params": seq_params}, video, tokens)
    pipe_tpl = jax.eval_shape(
        lambda: pipe.init(jax.random.PRNGKey(0), video, tokens))["params"]
    pipe_params = adapt_stacked_layouts(seq_params, pipe_tpl)
    out = pipe.apply({"params": pipe_params}, video, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_gated_layout_roundtrip():
    video, tokens = _data()
    seq, _ = _models()
    params = seq.init(jax.random.PRNGKey(1), video, tokens)["params"]
    blocks = {k: v for k, v in params.items() if k.startswith("block_")}
    stacked = stack_gated_params(blocks, prefix="block_")
    assert stacked["qkv_kernel"].shape[:2] == (2, 2)  # [G, cross_every]
    back = unstack_gated_params(stacked, prefix="block_")
    for k in blocks:
        for path, leaf in jax.tree_util.tree_leaves_with_path(blocks[k]):
            got = back[k]
            for pk in path:
                got = got[pk.key]
            np.testing.assert_array_equal(np.asarray(leaf), np.asarray(got))


def test_vclm_cached_decode_requires_sequential_layout():
    video, tokens = _data(b=2)
    _, pipe = _models()
    pipe_tpl = jax.eval_shape(
        lambda: pipe.init(jax.random.PRNGKey(0), video, tokens))["params"]
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), pipe_tpl)
    visual = jnp.zeros((2, 4, 32), jnp.float32)
    with pytest.raises(RuntimeError, match="sequential"):
        pipe.apply({"params": params}, visual,
                   method=pipe.precompute_cross)


GPT2_KW = dict(vocab_size=64, max_positions=16, width=32, layers=6,
               heads=2, cross_freq=3, gated=True, dtype=jnp.float32)


def test_gpt2_pipeline_forward_matches_sequential():
    tokens = jax.random.randint(jax.random.PRNGKey(3), (4, 10), 0, 64)
    enc = jax.random.normal(jax.random.PRNGKey(4), (4, 5, 32), jnp.float32)
    seq = GatedGPT2LMHead(**GPT2_KW)
    pipe = GatedGPT2LMHead(pipeline=True, pipeline_microbatches=2, **GPT2_KW)
    seq_params = seq.init(jax.random.PRNGKey(0), tokens, enc)["params"]
    ref = seq.apply({"params": seq_params}, tokens, enc)
    pipe_tpl = jax.eval_shape(
        lambda: pipe.init(jax.random.PRNGKey(0), tokens, enc))["params"]
    pipe_params = adapt_stacked_layouts(seq_params, pipe_tpl)
    mesh = make_mesh(data=4, pp=2)  # G=2 groups over pp=2
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, t, e: pipe.apply({"params": p}, t, e))(
            pipe_params, tokens, enc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_narrator_entry_pipeline_parallel(tmp_path):
    """Config-reachable narrator pipeline: train_narrator on a
    data x pp mesh with model.pipeline=true, and the stacked-layout
    checkpoint loads back into a sequential VCLM."""
    cv2 = pytest.importorskip("cv2")
    import json
    import os
    import os.path as osp
    import pickle

    root = str(tmp_path / "data")
    os.makedirs(root)
    samples = []
    for v in range(8):
        d = osp.join(root, f"vid{v}.mp4")
        os.makedirs(d)
        vw = cv2.VideoWriter(osp.join(d, "0.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 32))
        for i in range(20):
            vw.write(np.random.RandomState(i).randint(
                0, 255, (32, 32, 3), np.uint8))
        vw.release()
        samples.append((f"vid{v}", 0.2, 1.8, f"does action {v}"))
    meta = osp.join(root, "meta.pkl")
    pickle.dump(samples, open(meta, "wb"))

    from avion_tpu.models.registry import register_model

    kw = dict(VCLM_KW)
    kw.update(image_size=32, patch_size=16, context_length=16,
              vocab_size=49408)

    @register_model("VCLM_TINY_PP")
    def _tiny_pp(num_frames=2, use_flash_attn=False, pipeline=False,
                 pipeline_microbatches=8, **_):
        return VCLM(pipeline=pipeline,
                    pipeline_microbatches=pipeline_microbatches, **kw)

    from avion_tpu.train.train_narrator import main

    out = str(tmp_path / "narr_pp_run")
    main([
        "model.name=VCLM_TINY_PP",
        "model.use_flash_attn=false",
        "model.pipeline=true",
        "model.pipeline_microbatches=2",
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
        "mesh.data=4",
        "mesh.pp=2",
    ])
    logs = [json.loads(l) for l in open(osp.join(out, "log.jsonl"))]
    assert any("train/loss" in l for l in logs)

    # the stacked checkpoint loads into a sequential model and matches
    # the pipelined model applying the same weights
    from avion_tpu.train.common import load_pretrained_params

    seq = VCLM(**kw)
    video = jnp.asarray(
        np.random.RandomState(0).rand(4, 2, 32, 32, 3), jnp.float32)
    tokens = jnp.asarray(
        np.random.RandomState(1).randint(0, 49408, (4, 16)), jnp.int32)
    seq_tpl = jax.jit(seq.init)(
        jax.random.PRNGKey(0), video, tokens)["params"]
    seq_params = load_pretrained_params(
        osp.join(out, "ckpt"), seq_tpl, num_frames=2)
    out_seq = seq.apply({"params": seq_params}, video, tokens)

    pipe = VCLM(pipeline=True, pipeline_microbatches=2, **kw)
    pipe_tpl = jax.jit(pipe.init)(
        jax.random.PRNGKey(0), video, tokens)["params"]
    pipe_params = load_pretrained_params(
        osp.join(out, "ckpt"), pipe_tpl, num_frames=2)
    out_pipe = pipe.apply({"params": pipe_params}, video, tokens)
    np.testing.assert_allclose(np.asarray(out_pipe), np.asarray(out_seq),
                               atol=2e-4, rtol=2e-4)


def test_pp_must_divide_groups():
    """pp=4 with only G=2 cross groups must fail loudly, not wedge."""
    tokens = jax.random.randint(jax.random.PRNGKey(3), (4, 10), 0, 64)
    enc = jax.random.normal(jax.random.PRNGKey(4), (4, 5, 32), jnp.float32)
    pipe = GatedGPT2LMHead(pipeline=True, pipeline_microbatches=2, **GPT2_KW)
    pipe_tpl = jax.eval_shape(
        lambda: pipe.init(jax.random.PRNGKey(0), tokens, enc))["params"]
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), pipe_tpl)
    mesh = make_mesh(data=2, pp=4)
    with jax.set_mesh(mesh):
        with pytest.raises(AssertionError, match="group boundaries"):
            pipe.apply({"params": params}, tokens, enc)


def test_vclm_pipeline_remat_matches_exact():
    """pipeline_remat=True (per-group checkpointing in each stage scan)
    changes memory, not math: fwd + grads match the non-remat pipeline."""
    video, tokens = _data()
    _, pipe = _models()
    remat = VCLM(pipeline=True, pipeline_microbatches=2,
                 pipeline_remat=True, **VCLM_KW)
    params = pipe.init(jax.random.PRNGKey(0), video, tokens)["params"]

    def loss(model):
        def f(p):
            return caption_loss(model.apply({"params": p}, video, tokens),
                                tokens)
        return f

    mesh = make_mesh(data=4, pp=2)
    with jax.set_mesh(mesh):
        l0, g0 = jax.jit(jax.value_and_grad(loss(pipe)))(params)
        l1, g1 = jax.jit(jax.value_and_grad(loss(remat)))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(
        ("/".join(str(getattr(k, "key", k)) for k in path), leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(g1))
    for path, leaf in flat0:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        np.testing.assert_allclose(np.asarray(flat1[name]), np.asarray(leaf),
                                   atol=1e-5, rtol=1e-5, err_msg=name)
