"""jit-compiled train/eval step builders.

One pjit step function replaces the reference's per-rank train loop
body (``scripts/main_lavila_pretrain.py:793-903``): forward, loss over
the global batch, grad, optimizer update, logit-scale clamp — all
partitioned over the mesh; XLA inserts gradient reductions and the
InfoNCE gather on ICI.  Buffers are donated so params/opt-state update
in place.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from avion_tpu.core.train_state import TrainState
from avion_tpu.losses import clip_loss, max_margin_ranking_loss
from avion_tpu.losses.losses import (
    soft_target_cross_entropy,
    softmax_cross_entropy,
    videomae_loss,
)

LOGIT_SCALE_MAX = 4.6052  # ln(100); scripts/main_lavila_pretrain.py:880


def prep_video(video, mean=None, std=None, dtype=jnp.bfloat16, batch=None,
               crop_size=None, model=None):
    """Normalize uint8 device batches in-graph (the reference's kornia
    GPU normalize, ``main_lavila_pretrain.py:430-435``); float inputs
    pass through (already normalized, e.g. in tests).  When the batch
    carries host-sampled crop params ("crop"/"hflip"), the full
    augmentation — crop + resize + flip + normalize — runs on device
    (``ops/fused_input``)."""
    from avion_tpu.data.transforms import OPENAI_MEAN, OPENAI_STD, normalize_video

    mean = mean if mean is not None else OPENAI_MEAN
    std = std if std is not None else OPENAI_STD
    if batch is not None and "crop" in batch and crop_size is not None:
        from avion_tpu.ops.fused_input import crop_resize_flip_normalize

        return crop_resize_flip_normalize(
            video, batch["crop"], batch.get("hflip"),
            out_size=(crop_size, crop_size), mean=mean, std=std, dtype=dtype)
    if video.dtype == jnp.uint8:
        if model is not None and getattr(model, "input_norm", "none") != "none":
            # model normalizes uint8 inside its rematerialized stem:
            # passing the raw batch keeps only the uint8 copy in HBM
            return video
        return normalize_video(video, mean, std, dtype)
    return video


def _clamp_logit_scale(params):
    if "logit_scale" in params:
        params = dict(params)
        params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0,
                                         LOGIT_SCALE_MAX)
    return params


def _finite_or_skip(new_state, old_state, loss):
    """NaN guard: keep old state on non-finite loss (the reference kills
    the whole run, ``avion/utils/misc.py:13-16``; we skip the step and
    surface the event in metrics instead)."""
    ok = jnp.isfinite(loss)
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(ok, n, o), new_state, old_state
    ), ok


def _collect_sown(tree, name):
    """Leaves sown under ``name`` (any module path) in a collection."""
    out = []
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        if name in keys:
            out.append(jnp.asarray(leaf))
    return out


def make_clip_train_step(
    model,
    tx: optax.GradientTransformation,
    label_smoothing: float = 0.0,
    crop_size: Optional[int] = None,
    moe_aux_weight: float = 0.01,
    moe_zloss_weight: float = 0.0,
    loss_type: str = "clip",
    siglip_chunked: bool = True,
) -> Callable:
    """``loss_type``: "clip" (softmax InfoNCE, the reference objective)
    or "siglip" (sigmoid pairwise, arXiv:2303.15343 — requires a model
    built with ``use_logit_bias=True``).  ``siglip_chunked`` computes
    the sigmoid loss blockwise around the mesh batch ring instead of as
    XLA-partitioned dense rows (see losses.siglip_loss_chunked)."""
    if loss_type not in ("clip", "siglip"):
        raise ValueError(f"unknown loss_type {loss_type!r}")

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        dropout_rng, pd_rng = jax.random.split(rng)

        def loss_fn(params):
            out, variables = model.apply(
                {"params": params},
                prep_video(batch["video"], batch=batch, crop_size=crop_size,
                           model=model),
                batch["text"],
                False,
                rngs={"dropout": dropout_rng, "patch_dropout": pd_rng},
                mutable=["losses", "moe_zloss", "metrics"],
            )
            if loss_type == "siglip":
                from avion_tpu.losses.losses import (
                    siglip_loss,
                    siglip_loss_chunked,
                )

                sig = siglip_loss_chunked if siglip_chunked else siglip_loss
                d = sig(out["image_embed"], out["text_embed"],
                        out["logit_scale"], out["logit_bias"])
            else:
                d = clip_loss(out["image_embed"], out["text_embed"],
                              out["logit_scale"], label_smoothing)
            d["logit_scale"] = out["logit_scale"]
            # MoE towers sow per-block router load-balance losses into
            # the "losses" collection (empty for dense models)
            aux = jax.tree_util.tree_leaves(variables.get("losses", {}))
            if aux:
                d["moe_aux"] = sum(jnp.asarray(a).sum() for a in aux)
                d["loss"] = d["loss"] + moe_aux_weight * d["moe_aux"]
            zs = jax.tree_util.tree_leaves(variables.get("moe_zloss", {}))
            if zs and moe_zloss_weight > 0:
                d["moe_zloss"] = sum(z.sum() for z in zs)
                d["loss"] = d["loss"] + moe_zloss_weight * d["moe_zloss"]
            # router observability: worst/best expert load share and
            # dropped-assignment fraction, averaged over blocks
            loads = _collect_sown(variables.get("metrics", {}),
                                  "moe_expert_load")
            if loads:
                load = jnp.mean(jnp.stack(loads), axis=0)
                d["moe_load_max"] = jnp.max(load)
                d["moe_load_min"] = jnp.min(load)
                ovf = _collect_sown(variables.get("metrics", {}),
                                    "moe_overflow")
                d["moe_overflow"] = jnp.mean(jnp.stack(ovf))
            return d["loss"], d

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = _clamp_logit_scale(params)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        new_state, ok = _finite_or_skip(new_state, state.replace(step=state.step + 1), loss)
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["step_ok"] = ok.astype(jnp.float32)
        return new_state, metrics

    return step


def make_clip_accum_train_step(
    model,
    tx: optax.GradientTransformation,
    update_freq: int,
    label_smoothing: float = 0.0,
    crop_size: Optional[int] = None,
    moe_aux_weight: float = 0.01,
    moe_zloss_weight: float = 0.0,
    loss_type: str = "clip",
    siglip_chunked: bool = True,
) -> Callable:
    """Gradient accumulation with feature caching — the open_clip recipe
    the reference intends but ships broken
    (``scripts/main_lavila_pretrain.py:813-859`` references undefined
    ``images/texts/args.accum_freq``), rebuilt as one jitted step.

    The batch arrives microbatch-major ``[M, B/M, ...]`` (dim 1 mesh-
    sharded; see ``make_global_batch(batch_dim=1)``).  Pass 1 scans the
    microbatches and caches their embeddings (no grads — activations
    die per iteration).  Pass 2 re-encodes each microbatch WITH grads,
    splices the live rows into the cached global embedding matrix, and
    takes the gradient of the full global-batch loss; because each row
    is live in exactly one pass, the accumulated gradient equals the
    exact one-shot global-batch gradient, while activation memory stays
    at one microbatch (the loss matrix itself is tiny).  The learnable
    scale/bias are kept live only at m=0 so their gradients are not
    counted M times.  Costs one extra forward (~1/3 more FLOPs) — the
    price the reference recipe also pays.

    MoE note: router capacity is per-forward, so expert assignment under
    M microbatches can differ from a single full-batch forward — the
    contrastive gradient stays exact, the router aux term is exact for
    the microbatched routing actually executed.
    """
    if loss_type not in ("clip", "siglip"):
        raise ValueError(f"unknown loss_type {loss_type!r}")
    M = int(update_freq)

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def encode(params, mb, m, mutable=()):
            # rngs derive from (step, m) identically in both passes, so
            # pass-2 live rows reproduce pass-1 cached rows exactly
            d_rng, pd_rng = jax.random.split(jax.random.fold_in(rng, m))
            video = prep_video(mb["video"], batch=mb, crop_size=crop_size,
                               model=model)
            return model.apply(
                {"params": params}, video, mb["text"], False,
                rngs={"dropout": d_rng, "patch_dropout": pd_rng},
                mutable=list(mutable) or ["losses", "moe_zloss", "metrics"],
            )

        ms = jnp.arange(M)

        # ---- pass 1: cache the global embedding matrix ----------------
        def cache_body(_, xs):
            m, mb = xs
            out, _ = encode(state.params, mb, m)
            return None, (out["image_embed"], out["text_embed"])

        _, (zi, zt) = jax.lax.scan(cache_body, None, (ms, batch))
        dim = zi.shape[-1]
        zi = jax.lax.stop_gradient(zi.reshape(-1, dim))  # [B, D]
        zt = jax.lax.stop_gradient(zt.reshape(-1, dim))
        b_micro = zi.shape[0] // M

        # ---- pass 2: per-microbatch grads of the global loss -----------
        def loss_m(params, mb, m):
            out, variables = encode(params, mb, m)
            zi_f = jax.lax.dynamic_update_slice(
                zi, out["image_embed"].astype(zi.dtype), (m * b_micro, 0))
            zt_f = jax.lax.dynamic_update_slice(
                zt, out["text_embed"].astype(zt.dtype), (m * b_micro, 0))
            # learnable scale (and bias) live exactly once across the M
            # passes — a direct-dependence grad per pass would be M x too
            # large
            live = (m == 0)
            scale = jnp.where(live, out["logit_scale"],
                              jax.lax.stop_gradient(out["logit_scale"]))
            if loss_type == "siglip":
                from avion_tpu.losses.losses import (
                    siglip_loss,
                    siglip_loss_chunked,
                )

                bias = jnp.where(live, out["logit_bias"],
                                 jax.lax.stop_gradient(out["logit_bias"]))
                sig = siglip_loss_chunked if siglip_chunked else siglip_loss
                d = sig(zi_f, zt_f, scale, bias)
            else:
                d = clip_loss(zi_f, zt_f, scale, label_smoothing)
            d["logit_scale"] = out["logit_scale"]
            # router losses: each microbatch contributes aux_m / M to the
            # differentiated objective so the accumulated gradient equals
            # the dense step's (whose aux is the full-batch mean == the
            # mean of the microbatch means); the REPORTED d["loss"] keeps
            # the full weight so the metric mean matches the dense metric
            obj = d["loss"]
            aux = jax.tree_util.tree_leaves(variables.get("losses", {}))
            if aux:
                d["moe_aux"] = sum(jnp.asarray(a).sum() for a in aux)
                obj = obj + moe_aux_weight * d["moe_aux"] / M
                d["loss"] = d["loss"] + moe_aux_weight * d["moe_aux"]
            zs = jax.tree_util.tree_leaves(variables.get("moe_zloss", {}))
            if zs and moe_zloss_weight > 0:
                d["moe_zloss"] = sum(z.sum() for z in zs)
                obj = obj + moe_zloss_weight * d["moe_zloss"] / M
                d["loss"] = d["loss"] + moe_zloss_weight * d["moe_zloss"]
            return obj, d

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        def grad_body(carry, xs):
            gacc, macc, n = carry
            m, mb = xs
            (_, d), gm = jax.value_and_grad(loss_m, has_aux=True)(
                state.params, mb, m)
            gacc = jax.tree_util.tree_map(jnp.add, gacc, gm)
            macc = d if macc is None else jax.tree_util.tree_map(
                jnp.add, macc, d)
            return (gacc, macc, n + 1), None

        # first iteration outside the scan so the metric-accumulator
        # structure is concrete; remaining M-1 microbatches scan
        carry, _ = grad_body((zero_grads, None, 0), (ms[0],
                             jax.tree_util.tree_map(lambda x: x[0], batch)))
        if M > 1:
            rest = jax.tree_util.tree_map(lambda x: x[1:], batch)
            carry, _ = jax.lax.scan(grad_body, carry, (ms[1:], rest))
        grads, msum, _ = carry
        # every loss_m evaluates the SAME global-batch loss value (live
        # rows reproduce cached rows exactly), so the mean un-does the sum
        metrics = jax.tree_util.tree_map(lambda v: v / M, msum)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = _clamp_logit_scale(params)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        new_state, ok = _finite_or_skip(
            new_state, state.replace(step=state.step + 1), metrics["loss"])
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["step_ok"] = ok.astype(jnp.float32)
        return new_state, metrics

    return step


def make_mir_finetune_step(model, tx, margin: float = 0.2) -> Callable:
    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out = model.apply(
                {"params": params},
                prep_video(batch["video"], model=model), batch["text"],
                False, rngs={"dropout": rng, "patch_dropout": rng},
            )
            d = max_margin_ranking_loss(
                out["image_embed"], out["text_embed"], margin=margin
            )
            return d["loss"], d

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        new_state, ok = _finite_or_skip(new_state, state.replace(step=state.step + 1), loss)
        metrics["step_ok"] = ok.astype(jnp.float32)
        return new_state, metrics

    return step


def make_cls_train_step(
    model,
    tx,
    label_smoothing: float = 0.0,
    ema_decay: Optional[float] = None,
    mixup_fn: Optional[Callable] = None,
) -> Callable:
    """Classification finetune step; batch["label"] is either int labels
    or a soft-target distribution.  ``mixup_fn(key, video, labels) ->
    (video, soft_targets)`` runs on device inside the jitted step
    (replacing timm Mixup on GPU, ``main_lavila_finetune_cls.py:320-339``)."""

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        mix_rng, rng = jax.random.split(rng)

        def loss_fn(params):
            video = prep_video(batch["video"])
            label = batch["label"]
            if mixup_fn is not None and label.ndim == 1:
                video, label = mixup_fn(mix_rng, video, label)
            logits = model.apply(
                {"params": params}, video, False,
                rngs={"dropout": rng},
            )
            if label.ndim == logits.ndim:
                loss = soft_target_cross_entropy(logits, label)
                hard = jnp.argmax(label, axis=-1)
            else:
                loss = softmax_cross_entropy(logits, label, label_smoothing)
                hard = label
            acc = 100.0 * jnp.mean(
                (jnp.argmax(logits, -1) == hard).astype(jnp.float32)
            )
            return loss, {"loss": loss, "acc1": acc}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None and ema_decay is not None:
            ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + (1 - ema_decay) * p, ema, params
            )
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            ema_params=ema,
        )
        new_state, ok = _finite_or_skip(
            new_state,
            state.replace(step=state.step + 1),
            loss,
        )
        metrics["step_ok"] = ok.astype(jnp.float32)
        return new_state, metrics

    return step


def make_videomae_train_step(
    model, tx, patch_size: int = 16, tubelet_size: int = 2,
    normalize_target: bool = True, regen_mask: bool = False,
) -> Callable:
    """``regen_mask``: draw the tube mask ON-DEVICE from the
    step-folded rng instead of using the host batch's mask — under
    data echoing (``data.echo_factor``) the host mask ships once per
    decoded batch, so repeats would otherwise reconstruct the SAME
    masked tokens; per-step regeneration restores the independent-mask
    regime (same shapes: the tube count is deterministic)."""

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            from avion_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

            video = prep_video(batch["video"], IMAGENET_MEAN, IMAGENET_STD)
            mask = batch["mask"]
            if regen_mask:
                from avion_tpu.data.transforms import tube_mask_device

                b, t, h, w, _ = video.shape
                mask = tube_mask_device(
                    jax.random.fold_in(rng, 1), b,
                    t // tubelet_size, h // patch_size, w // patch_size,
                    model.mask_ratio)
            pred, masked_idx = model.apply(
                {"params": params}, video, mask, False,
                rngs={"dropout": rng},
            )
            d = videomae_loss(pred, video, masked_idx, patch_size,
                              tubelet_size, normalize_target)
            return d["loss"], d

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        new_state, ok = _finite_or_skip(new_state, state.replace(step=state.step + 1), loss)
        metrics["step_ok"] = ok.astype(jnp.float32)
        return new_state, metrics

    return step


def compile_step(step_fn, mesh, donate_state: bool = True):
    """jit the step with state donated; under a mesh, shardings propagate
    from the input state/batch placements."""
    return jax.jit(step_fn, donate_argnums=(0,) if donate_state else ())
