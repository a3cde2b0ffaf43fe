"""Cached-feature gradient accumulation (the open_clip recipe the
reference ships broken — main_lavila_pretrain.py:813-859).

The contract: make_clip_accum_train_step(update_freq=M) on a
microbatch-major [M, B/M, ...] batch produces the SAME loss and the
SAME parameter update as the one-shot global-batch step on [B, ...] —
exactness, not approximation — while holding only one microbatch of
activations at a time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avion_tpu.core.config import OptimConfig
from avion_tpu.core.train_state import TrainState
from avion_tpu.models.clip import CLIP
from avion_tpu.optim import build_optimizer
from avion_tpu.parallel import shard_params
from avion_tpu.parallel.sharding import make_global_batch
from avion_tpu.train.steps import (
    make_clip_accum_train_step,
    make_clip_train_step,
)

pytestmark = pytest.mark.slow  # excluded from the quick CI tier


def _build(loss_type):
    model = CLIP(
        embed_dim=16, image_size=32, patch_size=16, num_frames=2,
        vision_width=32, vision_layers=1, vision_heads=2, context_length=8,
        vocab_size=64, text_width=16, text_heads=2, text_layers=1,
        use_flash=False, dtype=jnp.float32,
        use_logit_bias=(loss_type == "siglip"),
        temperature_init=0.1 if loss_type == "siglip" else 0.07,
    )
    rng = jax.random.PRNGKey(0)
    video = jnp.zeros((4, 2, 32, 32, 3))
    text = jnp.zeros((4, 8), jnp.int32)
    params = model.init(rng, video, text)["params"]
    # SGD: the update is LINEAR in the gradient, so comparing updated
    # params is a direct gradient comparison (adam's g/sqrt(g^2)
    # normalization amplifies f32 summation-order noise on near-zero
    # elements into spurious update differences)
    cfg = OptimConfig(optimizer="sgd", lr=1e-2, warmup_epochs=0, epochs=1,
                      grad_clip_norm=1.0)
    tx, _ = build_optimizer(cfg, params, niter_per_ep=100)
    rs = np.random.RandomState(0)
    host = {
        "video": rs.rand(32, 2, 32, 32, 3).astype(np.float32),
        "text": rs.randint(1, 64, (32, 8)).astype(np.int32),
    }
    return model, params, tx, host


@pytest.mark.parametrize("loss_type", ["clip", "siglip"])
@pytest.mark.parametrize("m", [2, 4])
def test_cached_accum_matches_one_shot(mesh8, loss_type, m):
    model, params, tx, host = _build(loss_type)

    dense_step = jax.jit(make_clip_train_step(model, tx,
                                              loss_type=loss_type))
    accum_step = jax.jit(make_clip_accum_train_step(
        model, tx, update_freq=m, loss_type=loss_type))

    rng = jax.random.PRNGKey(7)
    with jax.set_mesh(mesh8):
        s_dense = TrainState.create(shard_params(params, mesh8), tx)
        s_accum = TrainState.create(shard_params(params, mesh8), tx)
        dense_batch = make_global_batch(mesh8, host)
        mb_host = jax.tree_util.tree_map(
            lambda x: x.reshape(m, x.shape[0] // m, *x.shape[1:]), host)
        accum_batch = make_global_batch(mesh8, mb_host, batch_dim=1)

        s_dense, md = dense_step(s_dense, dense_batch, rng)
        s_accum, ma = accum_step(s_accum, accum_batch, rng)

    np.testing.assert_allclose(float(ma["loss"]), float(md["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(ma["clip_acc"]), float(md["clip_acc"]))
    np.testing.assert_allclose(float(ma["grad_norm"]), float(md["grad_norm"]),
                               rtol=1e-4)
    # the parameter update must be the exact global-batch update
    pd = jax.device_get(s_dense.params)
    pa = jax.device_get(s_accum.params)
    flat_d = jax.tree_util.tree_leaves_with_path(pd)
    flat_a = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(pa)}
    for k, vd in flat_d:
        va = flat_a[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(va, vd, rtol=2e-4, atol=2e-6,
                                   err_msg=jax.tree_util.keystr(k))


def test_cached_accum_multiple_steps_decrease_loss(mesh8):
    model, params, tx, host = _build("clip")
    step = jax.jit(make_clip_accum_train_step(model, tx, update_freq=2))
    with jax.set_mesh(mesh8):
        state = TrainState.create(shard_params(params, mesh8), tx)
        mb_host = jax.tree_util.tree_map(
            lambda x: x.reshape(2, x.shape[0] // 2, *x.shape[1:]), host)
        batch = make_global_batch(mesh8, mb_host, batch_dim=1)
        losses = []
        for _ in range(6):
            state, metrics = step(state, batch, jax.random.PRNGKey(1))
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))
    assert float(metrics["step_ok"]) == 1.0


def test_make_global_batch_microbatch_dim(mesh8):
    x = np.arange(2 * 8 * 4, dtype=np.float32).reshape(2, 8, 4)
    g = make_global_batch(mesh8, x, batch_dim=1)
    assert g.shape == (2, 8, 4)
    spec = g.sharding.spec
    assert spec[0] is None  # microbatch dim unsharded
    np.testing.assert_array_equal(jax.device_get(g), x)


def test_multistep_accum_still_default():
    from avion_tpu.optim import build_optimizer as bo

    cfg = OptimConfig(optimizer="adamw", lr=1e-3, warmup_epochs=0, epochs=1,
                      update_freq=2)
    params = {"w": jnp.zeros((4, 4))}
    tx, _ = bo(cfg, params, niter_per_ep=10)
    # MultiSteps wrapping: two updates with the same grad -> first is
    # all-zero (accumulating), second applies
    state = tx.init(params)
    g = {"w": jnp.ones((4, 4))}
    upd1, state = tx.update(g, state, params)
    assert float(jnp.abs(upd1["w"]).max()) == 0.0
    upd2, state = tx.update(g, state, params)
    assert float(jnp.abs(upd2["w"]).max()) > 0.0

    cfg_c = OptimConfig(optimizer="adamw", lr=1e-3, warmup_epochs=0,
                        epochs=1, update_freq=2, accum="cached")
    tx_c, _ = bo(cfg_c, params, niter_per_ep=10)
    state = tx_c.init(params)
    upd, _ = tx_c.update(g, state, params)
    assert float(jnp.abs(upd["w"]).max()) > 0.0  # no MultiSteps wrap
