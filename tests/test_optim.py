import jax
import jax.numpy as jnp
import numpy as np
import optax

from avion_tpu.core.config import OptimConfig
from avion_tpu.optim import build_optimizer, cosine_schedule, wd_mask, layer_decay_scales


def test_cosine_schedule_shape():
    s = cosine_schedule(1.0, 0.1, epochs=2, niter_per_ep=100,
                        warmup_epochs=0.5, start_warmup_value=0.0)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(50)), 1.0, rtol=1e-6)  # warmup end
    np.testing.assert_allclose(float(s(200)), 0.1, atol=1e-6)  # final
    assert float(s(125)) > float(s(175))  # decaying


def test_wd_mask_excludes_norms_and_biases():
    params = {
        "transformer": {"resblocks_0": {
            "attn": {"qkv": {"kernel": jnp.zeros((8, 24)), "bias": jnp.zeros((24,))}},
            "ln_1": {"norm": {"scale": jnp.zeros((8,)), "bias": jnp.zeros((8,))}},
        }},
        "positional_embedding": jnp.zeros((10, 8)),
        "logit_scale": jnp.zeros(()),
    }
    mask = wd_mask(params)
    assert mask["transformer"]["resblocks_0"]["attn"]["qkv"]["kernel"] is True
    assert mask["transformer"]["resblocks_0"]["attn"]["qkv"]["bias"] is False
    assert mask["transformer"]["resblocks_0"]["ln_1"]["norm"]["scale"] is False
    assert mask["positional_embedding"] is False
    assert mask["logit_scale"] is False


def test_layer_decay_scales():
    params = {
        "conv1": {"kernel": jnp.zeros((4, 4))},
        "transformer": {
            "resblocks_0": {"mlp": {"fc1": {"kernel": jnp.zeros((4, 4))}}},
            "resblocks_2": {"mlp": {"fc1": {"kernel": jnp.zeros((4, 4))}}},
        },
        "head": {"kernel": jnp.zeros((4, 4))},
    }
    scales = layer_decay_scales(params, num_layers=3, decay=0.5)
    assert scales["head"]["kernel"] == 1.0
    assert scales["conv1"]["kernel"] == 0.5 ** 4
    assert scales["transformer"]["resblocks_0"]["mlp"]["fc1"]["kernel"] == 0.5 ** 3
    assert scales["transformer"]["resblocks_2"]["mlp"]["fc1"]["kernel"] == 0.5


def _run_steps(cfg, params, n=3):
    tx, _ = build_optimizer(cfg, params, niter_per_ep=10, num_layers=2)
    state = tx.init(params)
    for _ in range(n):
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return params


def test_optimizers_step():
    params = {"w": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}
    for name in ("adamw", "sgd", "lion"):
        cfg = OptimConfig(optimizer=name, lr=0.1, warmup_epochs=0, epochs=1,
                          grad_clip_norm=1.0)
        out = _run_steps(cfg, params)
        assert float(jnp.abs(out["w"]).sum()) != float(jnp.abs(params["w"]).sum())


def test_grad_accumulation_multisteps():
    params = {"w": jnp.ones((2, 2))}
    cfg = OptimConfig(optimizer="sgd", lr=0.1, wd=0.0, warmup_epochs=0,
                      epochs=1, update_freq=2)
    tx, _ = build_optimizer(cfg, params, niter_per_ep=10)
    state = tx.init(params)
    g = {"w": jnp.ones((2, 2))}
    up1, state = tx.update(g, state, params)
    # first micro-step: no param change yet
    assert float(jnp.abs(up1["w"]).sum()) == 0.0
    up2, state = tx.update(g, state, params)
    assert float(jnp.abs(up2["w"]).sum()) > 0.0
