"""Learning-dynamics proof: the full CLIP train step (loss + optimizer
+ sharding) overfits a tiny fixed batch — the 'overfit a small subset'
milestone of the build plan (SURVEY §7 step 3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # excluded from the quick CI tier


def test_clip_step_overfits_fixed_batch(mesh_dp):
    from avion_tpu.core.config import OptimConfig
    from avion_tpu.core.train_state import TrainState
    from avion_tpu.models.clip import CLIP
    from avion_tpu.optim import build_optimizer
    from avion_tpu.parallel import shard_params
    from avion_tpu.parallel.sharding import make_global_batch
    from avion_tpu.train.steps import make_clip_train_step

    model = CLIP(
        embed_dim=32, image_size=32, patch_size=16, num_frames=2,
        vision_width=64, vision_layers=2, vision_heads=2,
        context_length=13, vocab_size=128, text_width=32, text_heads=2,
        text_layers=2, use_flash=False, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    video = rs.randint(0, 255, (16, 2, 32, 32, 3)).astype(np.uint8)
    text = rs.randint(1, 128, (16, 13)).astype(np.int32)

    with jax.set_mesh(mesh_dp):
        params = jax.jit(model.init)(
            rng, jnp.zeros((2, 2, 32, 32, 3)), jnp.zeros((2, 13),
                                                         jnp.int32))["params"]
        params = shard_params(params, mesh_dp)
        cfg = OptimConfig(optimizer="adamw", lr=2e-3, warmup_epochs=0,
                          epochs=1, grad_clip_norm=1.0)
        tx, _ = build_optimizer(cfg, params, niter_per_ep=10 ** 6)
        state = TrainState.create(params, tx)
        step = jax.jit(make_clip_train_step(model, tx, crop_size=32),
                       donate_argnums=(0,))
        batch = {"video": make_global_batch(mesh_dp, video),
                 "text": make_global_batch(mesh_dp, text)}
        losses = []
        for _ in range(60):
            state, m = step(state, batch, rng)
            losses.append(float(m["loss"]))

    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    # 16 distinct pairs: InfoNCE can be driven near zero on a fixed batch
    assert last < 0.5 * first, (first, last)
    assert np.isfinite(losses).all()


def test_clip_step_overfits_with_bf16_opt_state(mesh_dp):
    """optim.state_dtype=bfloat16 (the batch-256 HBM lever) must not
    break learning dynamics: same overfit contract as above, and the
    held optimizer state really is bf16."""
    from avion_tpu.core.config import OptimConfig
    from avion_tpu.core.train_state import TrainState
    from avion_tpu.models.clip import CLIP
    from avion_tpu.optim import build_optimizer
    from avion_tpu.parallel import shard_params
    from avion_tpu.parallel.sharding import make_global_batch
    from avion_tpu.train.steps import make_clip_train_step

    model = CLIP(
        embed_dim=32, image_size=32, patch_size=16, num_frames=2,
        vision_width=64, vision_layers=2, vision_heads=2,
        context_length=13, vocab_size=128, text_width=32, text_heads=2,
        text_layers=2, use_flash=False, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    video = rs.randint(0, 255, (16, 2, 32, 32, 3)).astype(np.uint8)
    text = rs.randint(1, 128, (16, 13)).astype(np.int32)

    with jax.set_mesh(mesh_dp):
        params = jax.jit(model.init)(
            rng, jnp.zeros((2, 2, 32, 32, 3)), jnp.zeros((2, 13),
                                                         jnp.int32))["params"]
        params = shard_params(params, mesh_dp)
        cfg = OptimConfig(optimizer="adamw", lr=2e-3, warmup_epochs=0,
                          epochs=1, grad_clip_norm=1.0,
                          state_dtype="bfloat16")
        tx, _ = build_optimizer(cfg, params, niter_per_ep=10 ** 6)
        state = TrainState.create(params, tx)
        dtypes = {str(x.dtype) for x in jax.tree_util.tree_leaves(
            state.opt_state) if hasattr(x, "dtype")
            and jnp.issubdtype(x.dtype, jnp.floating)}
        assert dtypes == {"bfloat16"}, dtypes
        step = jax.jit(make_clip_train_step(model, tx, crop_size=32),
                       donate_argnums=(0,))
        batch = {"video": make_global_batch(mesh_dp, video),
                 "text": make_global_batch(mesh_dp, text)}
        losses = []
        for _ in range(60):
            state, m = step(state, batch, rng)
            losses.append(float(m["loss"]))

    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < 0.5 * first, (first, last)
    assert np.isfinite(losses).all()


def test_clip_step_overfits_with_wider_head_split(mesh_dp):
    """The H128 geometry variants (CLIP_VITB16_H128 etc.) halve the
    head count at fixed width.  Tiny-scale analogue: 1 head of dim 64
    instead of 2 of dim 32 must keep the same overfit contract —
    guards against the wider-head split breaking learning dynamics."""
    from avion_tpu.core.config import OptimConfig
    from avion_tpu.core.train_state import TrainState
    from avion_tpu.models.clip import CLIP
    from avion_tpu.optim import build_optimizer
    from avion_tpu.parallel import shard_params
    from avion_tpu.parallel.sharding import make_global_batch
    from avion_tpu.train.steps import make_clip_train_step

    model = CLIP(
        embed_dim=32, image_size=32, patch_size=16, num_frames=2,
        vision_width=64, vision_layers=2, vision_heads=1,
        context_length=13, vocab_size=128, text_width=32, text_heads=1,
        text_layers=2, use_flash=False, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    video = rs.randint(0, 255, (16, 2, 32, 32, 3)).astype(np.uint8)
    text = rs.randint(1, 128, (16, 13)).astype(np.int32)

    with jax.set_mesh(mesh_dp):
        params = jax.jit(model.init)(
            rng, jnp.zeros((2, 2, 32, 32, 3)), jnp.zeros((2, 13),
                                                         jnp.int32))["params"]
        params = shard_params(params, mesh_dp)
        cfg = OptimConfig(optimizer="adamw", lr=2e-3, warmup_epochs=0,
                          epochs=1, grad_clip_norm=1.0)
        tx, _ = build_optimizer(cfg, params, niter_per_ep=10 ** 6)
        state = TrainState.create(params, tx)
        step = jax.jit(make_clip_train_step(model, tx, crop_size=32),
                       donate_argnums=(0,))
        batch = {"video": make_global_batch(mesh_dp, video),
                 "text": make_global_batch(mesh_dp, text)}
        losses = []
        for _ in range(60):
            state, m = step(state, batch, rng)
            losses.append(float(m["loss"]))

    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < 0.5 * first, (first, last)
    assert np.isfinite(losses).all()
