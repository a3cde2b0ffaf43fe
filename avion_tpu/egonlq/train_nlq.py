"""EgoNLQ training entry: VSLNet on extracted dual-encoder features.

Counterpart of ``egonlq/main.py:263-407``: AdamW with linear warmup,
span + highlight losses, R@k/IoU evaluation — plus the framework's
operational envelope the reference's NLQ driver lacks: per-step JSONL
logging (``log.jsonl``), orbax checkpointing with auto-resume, and
SIGTERM preemption (checkpoint + clean stop), matching the other
training entries.

Usage::

    python -m avion_tpu.egonlq.train_nlq \
        annotations=/path/nlq_train.json val_annotations=/path/nlq_val.json \
        feature_dir=/path/features epochs=10
"""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from avion_tpu.egonlq.nlq_dataset import NLQFeatureDataset, parse_nlq_annotations
from avion_tpu.egonlq.nlq_eval import evaluate_nlq
from avion_tpu.egonlq.vslnet import VSLNet, extract_top_spans, vslnet_loss


@dataclass
class NLQConfig:
    annotations: str = ""
    val_annotations: str = ""
    feature_dir: str = ""
    val_feature_dir: str = ""
    output_dir: str = "./nlq_out"
    dim: int = 128
    num_heads: int = 8
    max_pos_len: int = 128
    video_feature_dim: int = 768
    query_feature_dim: int = 512
    drop_rate: float = 0.2
    variant: str = "full"  # "full" (CQAttention) | "small" (VSLNet_small)
    highlight_weight: float = 5.0
    lr: float = 1e-3
    epochs: int = 10
    batch_size: int = 32
    warmup_proportion: float = 0.0
    seed: int = 0
    print_freq: int = 10


def _collate(items):
    out = {}
    maxq = max(it["query"].shape[0] for it in items)
    for it in items:
        q = it["query"]
        if q.shape[0] < maxq:
            pad = np.zeros((maxq - q.shape[0], q.shape[1]), np.float32)
            it["query"] = np.concatenate([q, pad])
            it["q_mask"] = np.concatenate(
                [it["q_mask"], np.zeros(maxq - len(it["q_mask"]), np.float32)])
    for k in items[0]:
        out[k] = np.stack([it[k] for it in items])
    return out


def make_train_step(model, tx, highlight_weight):
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            h, s, e = model.apply({"params": p}, batch["video"],
                                  batch["v_mask"], batch["query"],
                                  batch["q_mask"], False,
                                  rngs={"dropout": rng})
            loss, aux = vslnet_loss(h, s, e, batch, highlight_weight)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, **aux}

    return jax.jit(step)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = NLQConfig()
    for tok in argv:
        k, v = tok.split("=", 1)
        t = type(getattr(cfg, k))
        setattr(cfg, k, t(v) if t is not bool else v.lower() == "true")
    os.makedirs(cfg.output_dir, exist_ok=True)
    from avion_tpu.parallel.launch import setup_host
    setup_host(cfg.seed)

    train_samples = parse_nlq_annotations(cfg.annotations)
    train_ds = NLQFeatureDataset(train_samples, cfg.feature_dir,
                                 cfg.max_pos_len)
    model = VSLNet(dim=cfg.dim, num_heads=cfg.num_heads,
                   max_pos_len=cfg.max_pos_len,
                   video_feature_dim=cfg.video_feature_dim,
                   query_feature_dim=cfg.query_feature_dim,
                   drop_rate=cfg.drop_rate,
                   use_cq_attention=(cfg.variant != "small"))
    rng = jax.random.PRNGKey(cfg.seed)
    b0 = _collate([train_ds[0]])
    params = model.init(rng, b0["video"], b0["v_mask"], b0["query"],
                        b0["q_mask"])["params"]

    steps_per_epoch = max(1, len(train_ds) // cfg.batch_size)
    total = steps_per_epoch * cfg.epochs
    schedule = optax.linear_schedule(cfg.lr, 0.0, total,
                                     int(total * cfg.warmup_proportion))
    tx = optax.adamw(schedule, weight_decay=0.01)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg.highlight_weight)

    import time as _time

    from avion_tpu.core.checkpoint import Checkpointer
    from avion_tpu.core.logging import MetricLogger
    from avion_tpu.core.meters import StepTimer
    from avion_tpu.parallel.launch import (
        install_preemption_handler,
        preempted,
    )

    logger = MetricLogger(cfg.output_dir)
    ckpt = Checkpointer(os.path.join(cfg.output_dir, "ckpt"))
    state = {"params": params, "opt_state": opt_state}
    restored, extra = ckpt.restore(state)
    start_epoch = 0
    if restored is not None:
        state = restored
        start_epoch = int((extra or {}).get("epoch", -1)) + 1
        print(f"[nlq] resumed from epoch {start_epoch}")
    params, opt_state = state["params"], state["opt_state"]
    install_preemption_handler()

    def save(epoch):
        s = (epoch + 1) * steps_per_epoch
        if ckpt.latest_step() == s:  # preempt right after a boundary
            return                   # save: that step already exists
        ckpt.save(s, {"params": params, "opt_state": opt_state},
                  extra={"epoch": epoch})

    order_rng = np.random.RandomState(cfg.seed)
    for epoch in range(start_epoch):
        order_rng.permutation(len(train_ds))  # keep resume order aligned
    global_step = start_epoch * steps_per_epoch
    timer = StepTimer()
    marked = global_step  # windows count only post-resume steps
    stop = False
    for epoch in range(start_epoch, cfg.epochs):
        order = order_rng.permutation(len(train_ds))
        for i in range(steps_per_epoch):
            if preempted():
                # scheduler SIGTERM: ensure the last epoch BOUNDARY is
                # checkpointed and stop cleanly (auto-resume re-runs
                # this epoch; the submitit requeue pattern,
                # run_with_submit_lavila_pretrain.py:53-59).  In the
                # very first epoch there is no boundary yet — saving
                # the mid-epoch params as one would make resume train
                # epoch 0 twice on stepped state, so start fresh.
                if epoch > 0:
                    save(epoch - 1)
                    ckpt.wait()
                stop = True
                break
            t_fetch = _time.perf_counter()
            idx = order[i * cfg.batch_size : (i + 1) * cfg.batch_size]
            batch = _collate([train_ds[int(j)] for j in idx])
            timer.data_time.update(_time.perf_counter() - t_fetch)
            rng, sub = jax.random.split(rng)
            params, opt_state, metrics = step(params, opt_state, batch, sub)
            global_step += 1
            if (i + 1) % cfg.print_freq == 0 or i + 1 == steps_per_epoch:
                loss = float(metrics["loss"])  # forces the chain
                timer.mark_window(global_step - marked)
                marked = global_step
                logger.log(
                    {"train/loss": loss, "train/epoch": epoch,
                     **{f"train/{k}": float(v) for k, v in metrics.items()
                        if k != "loss"},
                     **{f"perf/{k}": v for k, v in timer.stats().items()}},
                    step=global_step)
        if stop:
            break
        print(f"[epoch {epoch}] loss={float(metrics['loss']):.4f}")
        if cfg.val_annotations:
            val = evaluate(cfg, model, params)
            print(val)
            logger.log({f"val/{k}": v for k, v in val.items()},
                       step=global_step)
        save(epoch)
    ckpt.wait()
    ckpt.close()
    logger.finish()
    return params


def evaluate(cfg, model, params):
    val_samples = parse_nlq_annotations(cfg.val_annotations)
    val_ds = NLQFeatureDataset(
        val_samples, cfg.val_feature_dir or cfg.feature_dir, cfg.max_pos_len)

    @jax.jit
    def fwd(p, batch):
        h, s, e = model.apply({"params": p}, batch["video"], batch["v_mask"],
                              batch["query"], batch["q_mask"], True)
        return extract_top_spans(s, e, k=5)

    preds, gts = [], []
    for i in range(0, len(val_ds), cfg.batch_size):
        items = [val_ds[j] for j in range(i, min(i + cfg.batch_size,
                                                 len(val_ds)))]
        batch = _collate(items)
        si, ei = fwd(params, batch)
        si, ei = np.asarray(si), np.asarray(ei)
        for b, it in enumerate(items):
            scale = float(it["duration"]) / max(int(it["n_features"]), 1)
            spans = np.stack([si[b] * scale, (ei[b] + 1) * scale], axis=1)
            preds.append(spans)
            s = val_samples[i + b]
            gts.append((s["gt_start"], s["gt_end"]))
    return evaluate_nlq(preds, gts)


if __name__ == "__main__":
    main()
