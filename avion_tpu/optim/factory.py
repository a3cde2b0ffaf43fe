"""Optimizer factory: AdamW / SGD / Lion with weight-decay masking and
layer-wise LR decay.

Maps the reference's optimizer setup:
- param-group wd exclusion for biases/norms/embeddings
  (``scripts/main_lavila_pretrain.py:296-320``) → optax wd mask tree;
- Lion (``avion/optim/lion.py``) → ``optax.lion``;
- ``LayerDecayValueAssigner`` (``avion/optim/layer_decay.py``) →
  a per-param LR-scale pytree applied as a gradient transformation;
- ZeRO-1 sharded optimizer state → nothing to do: optimizer state is a
  pytree sharded like the params by the same sharding rules.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

_NO_WD_TOKENS = (
    "bias", "norm", "ln_", "positional_embedding", "temporal_embedding",
    "class_embedding", "logit_scale", "token_embedding", "mask_token",
    "gamma", "fc_norm",
)


def _param_name(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path).lower()


def wd_mask(params) -> Any:
    """True where weight decay applies: ndim>=2 and not an excluded name."""

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        name = _param_name(path)
        decay = jnp.ndim(leaf) >= 2 and not any(t in name for t in _NO_WD_TOKENS)
        out.append(decay)
    return jax.tree_util.tree_unflatten(treedef, out)


def _block_id(name: str, num_layers: int) -> int:
    """Depth id for layer-decay (``layer_decay.py:1-20``): embeddings are
    depth 0, block i is depth i+1, head/norm params are depth
    num_layers+1."""
    m = re.search(r"resblocks_(\d+)", name)
    if m:
        return int(m.group(1)) + 1
    if any(t in name for t in ("patch_embed", "conv1", "class_embedding",
                               "positional_embedding", "temporal_embedding",
                               "token_embedding")):
        return 0
    return num_layers + 1


def layer_decay_scales(params, num_layers: int, decay: float) -> Any:
    """Pytree of per-param LR multipliers decay^(num_layers+1-depth)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        depth = _block_id(_param_name(path), num_layers)
        out.append(decay ** (num_layers + 1 - depth))
    return jax.tree_util.tree_unflatten(treedef, out)


def scale_by_tree(scales: Any) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree_util.tree_map(
            lambda u, s: u * s, updates, scales
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def apply_batch_lr_scale(cfg, global_batch: int, default_base: int = 0):
    """Linear-scaling rule for finetunes: LR x= global_batch / base
    (``main_lavila_finetune_cls.py:367-370`` uses 128,
    ``main_videomae_finetune.py:285-288`` uses 256).  ``global_batch``
    is the full cross-host batch.  Mutates cfg.lr once and clears the
    knob so repeated calls cannot compound."""
    base = cfg.lr_scale_by_batch or default_base
    if base:
        cfg.lr = cfg.lr * global_batch / base
        cfg.lr_scale_by_batch = None
    return cfg.lr


def cast_opt_state(tx: optax.GradientTransformation,
                   dtype) -> optax.GradientTransformation:
    """Hold float optimizer state (Adam mu/nu, momentum) in ``dtype``
    between steps; updates run in f32.  Halves optimizer HBM at
    bf16 — the lever that fits batch 256 on one chip (VERDICT r2 #2).
    Integer state (step counts) is untouched."""
    dtype = jnp.dtype(dtype)

    def down(t):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

    def up(t):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == dtype else x, t)

    def init(params):
        return down(tx.init(params))

    def update(updates, state, params=None):
        updates, new_state = tx.update(updates, up(state), params)
        return updates, down(new_state)

    return optax.GradientTransformation(init, update)


def add_scheduled_decayed_weights(
    wd_schedule: Callable, mask: Any
) -> optax.GradientTransformation:
    """``optax.add_decayed_weights`` with a per-step decay schedule —
    the reference's cosine weight-decay ramp (``--wd-end``,
    ``main_videomae_finetune.py:399-401,493-494``: param_group
    weight_decay reassigned from ``wd_schedule[it]`` every iteration).
    Placed where add_decayed_weights sits in the optax chains (after the
    second-moment rescale, before the LR scale), so the applied update
    matches torch AdamW's ``p -= lr * (update + wd * p)``."""

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("scheduled weight decay needs params")
        wd = wd_schedule(state.count)
        updates = jax.tree_util.tree_map(
            lambda u, p, m: u + wd * p if m else u, updates, params, mask,
        )
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    cfg,
    params,
    niter_per_ep: int,
    num_layers: Optional[int] = None,
) -> tuple[optax.GradientTransformation, Callable]:
    """Build the optax chain from an OptimConfig. Returns (tx, lr_schedule)."""
    from avion_tpu.optim.schedules import cosine_schedule

    if getattr(cfg, "fix_lr", False):
        # constant LR from step 0 (reference --fix-lr: lr_schedule=None,
        # optimizer keeps its initial args.lr)
        schedule = lambda step: cfg.lr  # noqa: E731
    else:
        schedule = cosine_schedule(
            cfg.lr, cfg.lr_end, cfg.epochs, niter_per_ep, cfg.warmup_epochs,
            cfg.lr_start,
        )
    mask = wd_mask(params)
    wd_end = getattr(cfg, "wd_end", None)
    wd_schedule = None
    if wd_end is not None and wd_end != cfg.wd:
        # cosine wd -> wd_end over the whole run, no warmup
        # (main_videomae_finetune.py:401)
        wd_schedule = cosine_schedule(cfg.wd, wd_end, cfg.epochs, niter_per_ep)

    name = cfg.optimizer.lower()
    if name == "adamw":
        if wd_schedule is not None:
            core = optax.chain(
                optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1],
                                    eps=cfg.eps),
                add_scheduled_decayed_weights(wd_schedule, mask),
                optax.scale_by_learning_rate(schedule),
            )
        else:
            core = optax.adamw(
                schedule, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
                weight_decay=cfg.wd, mask=mask,
            )
    elif name == "sgd":
        core = optax.chain(
            add_scheduled_decayed_weights(wd_schedule, mask)
            if wd_schedule is not None
            else optax.add_decayed_weights(cfg.wd, mask=mask),
            optax.sgd(schedule, momentum=cfg.momentum),
        )
    elif name == "lion":
        if wd_schedule is not None:
            core = optax.chain(
                optax.scale_by_lion(b1=cfg.betas[0], b2=cfg.betas[1]),
                add_scheduled_decayed_weights(wd_schedule, mask),
                optax.scale_by_learning_rate(schedule),
            )
        else:
            core = optax.lion(
                schedule, b1=cfg.betas[0], b2=cfg.betas[1],
                weight_decay=cfg.wd, mask=mask,
            )
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    parts = []
    if cfg.grad_clip_norm:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    parts.append(core)
    if cfg.layer_decay and num_layers:
        # scale the *final* update (post-Adam), matching per-group LR
        parts.append(
            scale_by_tree(layer_decay_scales(params, num_layers, cfg.layer_decay))
        )
    tx = optax.chain(*parts) if len(parts) > 1 else parts[0]
    state_dtype = getattr(cfg, "state_dtype", "float32")
    if state_dtype and state_dtype != "float32":
        tx = cast_opt_state(tx, state_dtype)
    if cfg.update_freq > 1 and getattr(cfg, "accum", "multistep") != "cached":
        # correct gradient accumulation (the reference's accum path is
        # broken/dead — main_lavila_pretrain.py:821-859).  The "cached"
        # mode accumulates inside the train step instead (exact global-
        # batch contrastive loss; steps.make_clip_accum_train_step).
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.update_freq)
    return tx, schedule
