import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avion_tpu.core.config import OptimConfig
from avion_tpu.core.train_state import TrainState
from avion_tpu.models.clip import CLIP
from avion_tpu.optim import build_optimizer
from avion_tpu.parallel import shard_params, replicated
from avion_tpu.parallel.sharding import make_global_batch
from avion_tpu.train.steps import make_clip_train_step, LOGIT_SCALE_MAX

pytestmark = pytest.mark.slow  # excluded from the quick CI tier


@pytest.fixture(scope="module")
def tiny_setup():
    model = CLIP(
        embed_dim=16, image_size=32, patch_size=16, num_frames=2,
        vision_width=32, vision_layers=1, vision_heads=2, context_length=8,
        vocab_size=64, text_width=16, text_heads=2, text_layers=1,
        use_flash=False, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    video = jnp.zeros((4, 2, 32, 32, 3))
    text = jnp.zeros((4, 8), jnp.int32)
    params = model.init(rng, video, text)["params"]
    cfg = OptimConfig(optimizer="adamw", lr=1e-2, warmup_epochs=0, epochs=1,
                      grad_clip_norm=1.0)
    tx, _ = build_optimizer(cfg, params, niter_per_ep=100)
    return model, params, tx


def test_clip_train_step_decreases_loss(tiny_setup, mesh8):
    model, params, tx = tiny_setup
    params = shard_params(params, mesh8)
    state = TrainState.create(params, tx)
    state = jax.device_put(state, replicated(mesh8)) if False else state

    step = jax.jit(make_clip_train_step(model, tx))
    rng = jax.random.PRNGKey(1)
    rs = np.random.RandomState(0)
    batch = make_global_batch(mesh8, {
        "video": rs.rand(8, 2, 32, 32, 3).astype(np.float32),
        "text": rs.randint(1, 64, (8, 8)).astype(np.int32),
    })
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))
    assert float(metrics["step_ok"]) == 1.0
    ls = float(jax.device_get(state.params["logit_scale"]))
    assert 0.0 <= ls <= LOGIT_SCALE_MAX
    assert int(state.step) == 8


def test_nan_guard_skips_step(tiny_setup, mesh8):
    model, params, tx = tiny_setup
    state = TrainState.create(shard_params(params, mesh8), tx)
    step = jax.jit(make_clip_train_step(model, tx))
    batch = make_global_batch(mesh8, {
        "video": np.full((8, 2, 32, 32, 3), np.nan, np.float32),
        "text": np.ones((8, 8), np.int32),
    })
    before = jax.device_get(state.params["visual"]["conv1"]["kernel"])
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    after = jax.device_get(state.params["visual"]["conv1"]["kernel"])
    assert float(metrics["step_ok"]) == 0.0
    np.testing.assert_array_equal(before, after)


def test_videomae_regen_mask_varies_per_step():
    """regen_mask=True draws the tube mask on-device from the
    step-folded rng (independent masks across data-echoing repeats);
    False reuses the host batch mask (identical loss at fixed
    params)."""
    from avion_tpu.data.transforms import tube_mask_batch
    from avion_tpu.models.videomae import PretrainVideoMAE
    from avion_tpu.train.steps import make_videomae_train_step

    model = PretrainVideoMAE(
        image_size=32, patch_size=16, num_frames=4, tubelet_size=2,
        encoder_width=32, encoder_layers=1, encoder_heads=2,
        decoder_width=16, decoder_layers=1, decoder_heads=2,
        mask_ratio=0.5, use_flash=False, dtype=jnp.float32)
    rs = np.random.RandomState(0)
    mask = tube_mask_batch(rs, 2, 2, 2, 2, 0.5)
    video = rs.rand(2, 4, 32, 32, 3).astype(np.float32)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((2, 4, 32, 32, 3)),
                        jnp.asarray(mask))["params"]
    cfg = OptimConfig(optimizer="adamw", lr=1e-3, warmup_epochs=0,
                      epochs=1)
    tx, _ = build_optimizer(cfg, params, niter_per_ep=10)
    batch = {"video": jnp.asarray(video), "mask": jnp.asarray(mask)}

    def loss_at_step(regen, step_no):
        state = TrainState.create(params, tx).replace(
            step=jnp.asarray(step_no, jnp.int32))
        step_fn = make_videomae_train_step(model, tx, patch_size=16,
                                           tubelet_size=2,
                                           regen_mask=regen)
        _, m = step_fn(state, batch, rng)
        return float(m["loss"])

    # host mask: identical loss regardless of the optimizer step
    assert loss_at_step(False, 0) == loss_at_step(False, 1)
    # regenerated mask: the step-folded rng draws a different mask
    assert loss_at_step(True, 0) != loss_at_step(True, 1)
