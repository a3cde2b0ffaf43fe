"""VCLM narrator training entry: caption generation on (video, text).

Trains the native narrator (``avion_tpu/models/narrator.py``) on
narrated clips with next-token cross-entropy — the stage the reference
delegates to the externally-trained LaViLa VCLM
(``second_party/lavilla_narrator``); here it is a first-class entry so
the pseudo-narration pipeline is fully self-hosted.

Usage::

    python -m avion_tpu.train.train_narrator \
        data.root=$ROOT data.train_metadata=$TRAIN_METADATA \
        model.name=VCLM_VITB16 optim.epochs=5
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import optax

from avion_tpu.core.config import TrainConfig
from avion_tpu.data.datasets import AugmentSpec, VideoCaptionDataset
from avion_tpu.data.loader import DataLoader
from avion_tpu.models import create_model
from avion_tpu.models.narrator import caption_loss
from avion_tpu.optim import build_optimizer
from avion_tpu.parallel.launch import setup_host
from avion_tpu.train.loop import (
    finish_if_preempted,
    save_epoch,
    setup_run,
    train_one_epoch,
)
from avion_tpu.train.steps import _finite_or_skip, prep_video


def make_narrator_step(model, tx):
    from avion_tpu.core.train_state import TrainState

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            logits = model.apply(
                {"params": params}, prep_video(batch["video"]),
                batch["text"], rngs={"dropout": rng},
            )
            loss = caption_loss(logits, batch["text"])
            return loss, {"loss": loss}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        new_state, ok = _finite_or_skip(
            new_state, state.replace(step=state.step + 1), loss)
        metrics["step_ok"] = ok.astype(jnp.float32)
        return new_state, metrics

    return step


def main(argv=None):
    from avion_tpu.core.config import load_dotenv

    load_dotenv()
    argv = argv if argv is not None else sys.argv[1:]
    cfg = TrainConfig().apply_overrides(argv)
    d = cfg.data
    d.root = d.root or os.environ.get("ROOT", "")
    d.train_metadata = d.train_metadata or os.environ.get("TRAIN_METADATA", "")
    os.makedirs(cfg.output_dir, exist_ok=True)
    cfg.save(os.path.join(cfg.output_dir, "config.json"))
    # multi-host bring-up BEFORE any jax use (jax.distributed must
    # init before the backend); installs the preemption handler
    setup_host(cfg.seed)

    name = cfg.model.name if cfg.model.name.startswith("VCLM") else "VCLM_VITB16"
    model = create_model(
        name, num_frames=d.clip_length,
        use_flash_attn=cfg.model.use_flash_attn,
        pipeline=cfg.model.pipeline,
        pipeline_microbatches=cfg.model.pipeline_microbatches,
        # the pipelined decoder remats per group under the same knob the
        # sequential towers use for per-block checkpointing
        pipeline_remat=cfg.model.use_grad_checkpointing,
        # H128 speed geometry for from-scratch narrators:
        # model.vision_heads=6 model.text_heads=4 (docs/PERF.md)
        vision_heads=cfg.model.vision_heads,
        heads=cfg.model.text_heads)

    train_ds = VideoCaptionDataset(
        "ego4d", d.root, d.train_metadata, is_training=True,
        clip_length=d.clip_length, chunk_len=d.chunk_len, fps=d.fps,
        threads=d.decode_threads, decode_fast=d.decode_fast,
        context_length=model.context_length,
        augment=AugmentSpec(crop_size=d.crop_size, mode="rrc",
                            scale_min=d.scale_min, scale_max=d.scale_max),
    )
    train_loader = DataLoader(train_ds, d.batch_size, shuffle=True,
                              drop_last=True, num_workers=d.num_workers,
                              seed=cfg.seed)
    # steps/epoch includes data-echo repeats (LR schedule spans
    # the true step count)
    niter = max(1, len(train_loader)) * max(1, cfg.data.echo_factor)

    rng = jax.random.PRNGKey(cfg.seed)
    video = jnp.zeros((2, d.clip_length, model.image_size, model.image_size,
                       3), jnp.bfloat16)
    tokens = jnp.zeros((2, model.context_length), jnp.int32)
    params = jax.jit(model.init)(rng, video, tokens)["params"]

    tx, _ = build_optimizer(cfg.optim, params, niter,
                            num_layers=model.layers)
    run = setup_run(cfg, params, tx, make_narrator_step(model, tx))

    rng = jax.random.PRNGKey(cfg.seed + 1)
    for epoch in range(run.start_epoch, cfg.optim.epochs):
        train_loader.set_epoch(epoch)
        metrics = train_one_epoch(run, train_loader, epoch, rng)
        print(f"[epoch {epoch}] " + " ".join(
            f"{k}={v:.4f}" for k, v in metrics.items()))
        if finish_if_preempted(run, epoch, metrics):
            break
        save_epoch(run, epoch, metrics)
    run.ckpt.wait()
    run.logger.finish()


if __name__ == "__main__":
    main()
