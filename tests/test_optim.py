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


def test_fix_lr_constant_schedule():
    """--fix-lr parity: LR is cfg.lr from step 0, no warmup/decay
    (main_videomae_pretrain.py:246 sets lr_schedule=None)."""
    params = {"w": jnp.ones((4, 4))}
    cfg = OptimConfig(optimizer="sgd", lr=0.25, wd=0.0, warmup_epochs=1,
                      epochs=2, fix_lr=True)
    tx, schedule = build_optimizer(cfg, params, niter_per_ep=10)
    for step in (0, 5, 19):
        assert float(schedule(step)) == 0.25
    # one sgd step moves by exactly lr * grad
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones((4, 4))}, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.25, rtol=1e-6)


def test_wd_end_cosine_schedule_matches_manual():
    """--wd-end parity (main_videomae_finetune.py:399-401,493-494):
    weight decay cosine-ramps wd -> wd_end per iteration; masked params
    get no decay.  Verified against a manual AdamW-style computation."""
    params = {"w": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}
    wd0, wd1, lr = 0.05, 0.2, 0.1
    cfg = OptimConfig(optimizer="adamw", lr=lr, lr_start=lr, lr_end=lr,
                      warmup_epochs=0, epochs=1, wd=wd0, wd_end=wd1)
    tx, _ = build_optimizer(cfg, params, niter_per_ep=2)
    state = tx.init(params)

    # reference manual chain: scale_by_adam -> +wd(t)*p -> *-lr
    ref = optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps)
    ref_state = ref.init(params)
    wd_sched = cosine_schedule(wd0, wd1, epochs=1, niter_per_ep=2)

    p_ours, p_ref = params, params
    for t in range(2):
        g = jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, 0.5), p_ours)
        up, state = tx.update(g, state, p_ours)
        p_ours = optax.apply_updates(p_ours, up)

        rup, ref_state = ref.update(g, ref_state, p_ref)
        wd_t = float(wd_sched(t))
        rup = {"w": -lr * (rup["w"] + wd_t * p_ref["w"]),
               "bias": -lr * rup["bias"]}  # bias masked from decay
        p_ref = optax.apply_updates(p_ref, rup)
        np.testing.assert_allclose(np.asarray(p_ours["w"]),
                                   np.asarray(p_ref["w"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p_ours["bias"]),
                                   np.asarray(p_ref["bias"]), rtol=1e-6)
    # the ramp is real: wd at the two steps differs
    assert float(wd_sched(0)) != float(wd_sched(1))


def test_wd_end_all_optimizers_step():
    params = {"w": jnp.ones((4, 4))}
    for name in ("adamw", "sgd", "lion"):
        cfg = OptimConfig(optimizer=name, lr=0.1, warmup_epochs=0, epochs=1,
                          wd=0.05, wd_end=0.2)
        out = _run_steps(cfg, params)
        assert float(jnp.abs(out["w"] - params["w"]).sum()) > 0.0
