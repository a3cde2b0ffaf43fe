"""Tensor-parallel execution: the CLIP train step runs correctly on a
mesh with a tensor axis, and matches the data-parallel-only result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avion_tpu.core.config import OptimConfig
from avion_tpu.core.train_state import TrainState
from avion_tpu.models.clip import CLIP
from avion_tpu.optim import build_optimizer
from avion_tpu.parallel import make_mesh, shard_params
from avion_tpu.parallel.sharding import make_global_batch
from avion_tpu.train.steps import make_clip_train_step

pytestmark = pytest.mark.slow  # excluded from the quick CI tier


def _setup():
    model = CLIP(
        embed_dim=16, image_size=32, patch_size=16, num_frames=2,
        vision_width=128, vision_layers=1, vision_heads=2, context_length=8,
        vocab_size=64, text_width=64, text_heads=2, text_layers=1,
        use_flash=False, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    video = jnp.zeros((2, 2, 32, 32, 3))
    text = jnp.zeros((2, 8), jnp.int32)
    params = model.init(rng, video, text)["params"]
    cfg = OptimConfig(optimizer="adamw", lr=1e-3, warmup_epochs=0, epochs=1)
    tx, _ = build_optimizer(cfg, params, niter_per_ep=10)
    return model, params, tx


def _run(mesh, model, params, tx, n=3):
    rs = np.random.RandomState(0)
    batch = {
        "video": rs.rand(8, 2, 32, 32, 3).astype(np.float32),
        "text": rs.randint(1, 64, (8, 8)).astype(np.int32),
    }
    with jax.set_mesh(mesh):
        sp = shard_params(params, mesh)
        state = TrainState.create(sp, tx)
        gbatch = make_global_batch(mesh, batch)
        step = jax.jit(make_clip_train_step(model, tx))
        losses = []
        for _ in range(n):
            state, metrics = step(state, gbatch, jax.random.PRNGKey(1))
            losses.append(float(metrics["loss"]))
    return losses


def test_tensor_parallel_matches_data_parallel():
    model, params, tx = _setup()
    mesh_dp = make_mesh(data=8)
    mesh_tp = make_mesh(data=2, fsdp=2, tensor=2)
    losses_dp = _run(mesh_dp, model, params, tx)
    losses_tp = _run(mesh_tp, model, params, tx)
    np.testing.assert_allclose(losses_dp, losses_tp, rtol=1e-4)
    assert losses_dp[-1] < losses_dp[0]
