"""SigLIP sigmoid contrastive loss: dense vs chunked-ring parity.

The chunked ring (losses.siglip_loss_chunked) must be a drop-in for the
dense global loss (losses.siglip_loss): same value, same gradients —
the only difference is peak memory ([b_local, b_local] blocks rotating
over ICI vs [b_local, B_global] XLA-partitioned rows).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avion_tpu.losses import siglip_loss, siglip_loss_chunked

pytestmark = pytest.mark.slow  # excluded from the quick CI tier


def _embeds(key, b, d=16):
    k1, k2 = jax.random.split(key)
    img = jax.random.normal(k1, (b, d), jnp.float32)
    txt = jax.random.normal(k2, (b, d), jnp.float32)
    norm = lambda x: x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    return norm(img), norm(txt)


def test_siglip_dense_matches_manual():
    img, txt = _embeds(jax.random.PRNGKey(0), b=6)
    scale, bias = jnp.float32(10.0), jnp.float32(-10.0)
    out = siglip_loss(img, txt, scale, bias)

    logits = np.asarray(scale) * np.asarray(img) @ np.asarray(txt).T \
        + np.asarray(bias)
    z = 2.0 * np.eye(6) - 1.0
    # loss = -(1/B) sum_ij log sigmoid(z_ij l_ij); log sigmoid(x) =
    # -logaddexp(0, -x)
    ref = np.sum(np.logaddexp(0.0, -(z * logits).astype(np.float64))) / 6
    np.testing.assert_allclose(float(out["loss"]), ref, rtol=1e-5)
    # random normalized embeddings: positives are not yet the row max,
    # but the accuracy metric must be a finite percentage
    assert 0.0 <= float(out["clip_acc"]) <= 100.0


def test_siglip_dense_gradients_finite():
    img, txt = _embeds(jax.random.PRNGKey(1), b=8)

    def f(img, txt, s, b):
        return siglip_loss(img, txt, s, b)["loss"]

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(
        img, txt, jnp.float32(10.0), jnp.float32(-10.0))
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    # bias gradient: d/db sum(-log sigmoid(z l)) / b = sum(-z sigmoid(-z l))/b
    assert abs(float(grads[3])) > 0.0


@pytest.mark.parametrize("global_b", [16, 24])
def test_siglip_chunked_matches_dense(mesh8, global_b):
    from jax.sharding import NamedSharding, PartitionSpec as P

    img, txt = _embeds(jax.random.PRNGKey(2), b=global_b)
    scale, bias = jnp.float32(10.0), jnp.float32(-10.0)

    def dense(img, txt, s, b):
        d = siglip_loss(img, txt, s, b)
        return d["loss"], d["clip_acc"]

    def chunked(img, txt, s, b):
        d = siglip_loss_chunked(img, txt, s, b, mesh=mesh8)
        return d["loss"], d["clip_acc"]

    batch_sh = NamedSharding(mesh8, P(("data", "fsdp")))
    img_s = jax.device_put(img, batch_sh)
    txt_s = jax.device_put(txt, batch_sh)

    loss_d, acc_d = jax.jit(dense)(img, txt, scale, bias)
    with jax.set_mesh(mesh8):
        loss_c, acc_c = jax.jit(chunked)(img_s, txt_s, scale, bias)
    np.testing.assert_allclose(float(loss_c), float(loss_d), rtol=1e-5)
    np.testing.assert_allclose(float(acc_c), float(acc_d), rtol=1e-6)

    gd = jax.jit(jax.grad(lambda *a: dense(*a)[0], argnums=(0, 1, 2, 3)))(
        img, txt, scale, bias)
    with jax.set_mesh(mesh8):
        gc = jax.jit(jax.grad(lambda *a: chunked(*a)[0],
                              argnums=(0, 1, 2, 3)))(img_s, txt_s, scale, bias)
    for a, b in zip(gc, gd):
        np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                   np.asarray(jax.device_get(b)),
                                   rtol=2e-5, atol=1e-7)


def test_siglip_chunked_single_device_falls_back():
    # no sharded batch axis -> dense path, same dict keys
    img, txt = _embeds(jax.random.PRNGKey(3), b=4)
    from avion_tpu.parallel import make_mesh

    mesh1 = make_mesh(data=1, devices=jax.devices()[:1])
    d = siglip_loss_chunked(img, txt, jnp.float32(10.0), jnp.float32(-10.0),
                            mesh=mesh1)
    ref = siglip_loss(img, txt, jnp.float32(10.0), jnp.float32(-10.0))
    np.testing.assert_allclose(float(d["loss"]), float(ref["loss"]),
                               rtol=1e-6)


def test_clip_train_step_siglip(mesh8):
    """End-to-end: tiny CLIP with the logit-bias head trains under the
    chunked sigmoid loss on the 8-device mesh; loss decreases and the
    bias parameter moves."""
    from avion_tpu.core.config import OptimConfig
    from avion_tpu.core.train_state import TrainState
    from avion_tpu.models.clip import CLIP
    from avion_tpu.optim import build_optimizer
    from avion_tpu.parallel import shard_params
    from avion_tpu.parallel.sharding import make_global_batch
    from avion_tpu.train.steps import make_clip_train_step

    model = CLIP(
        embed_dim=16, image_size=32, patch_size=16, num_frames=2,
        vision_width=32, vision_layers=1, vision_heads=2, context_length=8,
        vocab_size=64, text_width=16, text_heads=2, text_layers=1,
        use_flash=False, dtype=jnp.float32,
        use_logit_bias=True, temperature_init=0.1,
    )
    rng = jax.random.PRNGKey(0)
    video = jnp.zeros((4, 2, 32, 32, 3))
    text = jnp.zeros((4, 8), jnp.int32)
    params = model.init(rng, video, text)["params"]
    assert "logit_bias" in params
    assert float(params["logit_bias"]) == -10.0
    assert float(params["logit_scale"]) == pytest.approx(np.log(10.0))

    cfg = OptimConfig(optimizer="adamw", lr=1e-2, warmup_epochs=0, epochs=1,
                      grad_clip_norm=1.0)
    tx, _ = build_optimizer(cfg, params, niter_per_ep=100)
    state = TrainState.create(shard_params(params, mesh8), tx)
    step = jax.jit(make_clip_train_step(model, tx, loss_type="siglip"))
    rs = np.random.RandomState(0)
    batch = make_global_batch(mesh8, {
        "video": rs.rand(8, 2, 32, 32, 3).astype(np.float32),
        "text": rs.randint(1, 64, (8, 8)).astype(np.int32),
    })
    bias0 = float(jax.device_get(state.params["logit_bias"]))
    losses = []
    with jax.set_mesh(mesh8):
        for _ in range(8):
            state, metrics = step(state, batch, jax.random.PRNGKey(1))
            losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert float(jax.device_get(state.params["logit_bias"])) != bias0


def test_siglip_config_wiring():
    from avion_tpu.core.config import TrainConfig

    cfg = TrainConfig().apply_overrides(
        ["loss=siglip", "siglip_chunked=false", "model.use_logit_bias=true"])
    assert cfg.loss == "siglip" and not cfg.siglip_chunked
    assert cfg.model.use_logit_bias

    from avion_tpu.models import create_model

    m = create_model("CLIP_VITB16", num_frames=2, use_logit_bias=True,
                     use_flash_attn=False)
    assert m.use_logit_bias


def test_unknown_loss_type_rejected():
    from avion_tpu.train.steps import make_clip_train_step

    with pytest.raises(ValueError):
        make_clip_train_step(None, None, loss_type="nce")
