"""EK100-MIR retrieval finetuning entry point.

Counterpart of ``scripts/main_lavila_finetune_mir.py``: start from a
pretrained dual encoder, finetune on EPIC-Kitchens-100 with the
max-margin ranking loss over relevancy-sampled positives, evaluate
retrieval mAP/nDCG.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp

from avion_tpu.core.config import TrainConfig
from avion_tpu.data.datasets import AugmentSpec, VideoCaptionDataset
from avion_tpu.data.loader import DataLoader
from avion_tpu.models import create_model
from avion_tpu.optim import build_optimizer
from avion_tpu.train.common import load_pretrained_params
from avion_tpu.parallel.launch import setup_host
from avion_tpu.train.loop import (
    finish_if_preempted,
    save_epoch,
    setup_run,
    train_one_epoch,
)
from avion_tpu.train.steps import make_mir_finetune_step


def env_defaults(cfg: TrainConfig) -> TrainConfig:
    d = cfg.data
    d.dataset = "ek100_mir"
    d.root = d.root or os.environ.get("EK100_VIDEO_DIR", "")
    d.root_val = d.root_val or d.root
    d.train_metadata = d.train_metadata or os.environ.get("EK100_TRAIN", "")
    d.val_metadata = d.val_metadata or os.environ.get("EK100_VAL", "")
    d.relevancy_path = d.relevancy_path or os.environ.get("RELEVANCY_PATH", "")
    return cfg


def main(argv=None):
    from avion_tpu.core.config import load_dotenv

    load_dotenv()  # dataset-path env vars, reference .env convention
    argv = argv if argv is not None else sys.argv[1:]
    cfg = env_defaults(TrainConfig().apply_overrides(argv))
    os.makedirs(cfg.output_dir, exist_ok=True)
    cfg.save(os.path.join(cfg.output_dir, "config.json"))
    # multi-host bring-up BEFORE any jax use (jax.distributed must
    # init before the backend); installs the preemption handler
    setup_host(cfg.seed)

    d = cfg.data
    mir_augment = AugmentSpec(crop_size=d.crop_size, mode="rrc",
                              scale_min=d.scale_min, scale_max=d.scale_max)
    if d.shard_dir:
        # tar-sharded input (data/shards.py); relevancy extras still
        # come from the csv via mir_metadata
        from avion_tpu.data.shards import ShardedVideoCaptionDataset

        train_ds = ShardedVideoCaptionDataset(
            d.shard_dir, is_training=True, clip_length=d.clip_length,
            threads=d.decode_threads, augment=mir_augment,
            subsample_stride=d.subsample_stride,
            decode_fast=bool(d.decode_fast)
            if d.decode_fast is not None else True,
            mir_metadata=d.train_metadata,
        )
    else:
        train_ds = VideoCaptionDataset(
            "ek100_mir", d.root, d.train_metadata, is_training=True,
            clip_length=d.clip_length, chunk_len=d.chunk_len,
            threads=d.decode_threads, decode_fast=d.decode_fast,
            subsample_stride=d.subsample_stride,
            augment=mir_augment,
        )
    train_loader = DataLoader(train_ds, d.batch_size, shuffle=True,
                              drop_last=True, num_workers=d.num_workers,
                              prefetch_depth=d.prefetch_depth, seed=cfg.seed)
    # steps/epoch includes data-echo repeats (LR schedule spans
    # the true step count)
    niter = max(1, len(train_loader)) * max(1, cfg.data.echo_factor)

    model = create_model(
        cfg.model.name, num_frames=d.clip_length,
        project_embed_dim=cfg.model.project_embed_dim,
        use_quick_gelu=cfg.model.use_quick_gelu,
        use_flash_attn=cfg.model.use_flash_attn,
        use_grad_checkpointing=cfg.model.use_grad_checkpointing,
        input_norm=cfg.model.input_norm,
    )
    rng = jax.random.PRNGKey(cfg.seed)
    video = jnp.zeros((2, d.clip_length, model.image_size, model.image_size, 3),
                      jnp.bfloat16)
    text = jnp.zeros((2, model.context_length), jnp.int32)
    params = jax.jit(model.init)(rng, video, text)["params"]
    if cfg.pretrain_model:
        params = load_pretrained_params(
            cfg.pretrain_model, params, num_frames=d.clip_length,
            context_length=model.context_length, vocab_size=model.vocab_size,
        )
        print(f"[init] loaded pretrain weights from {cfg.pretrain_model}")

    tx, _ = build_optimizer(cfg.optim, params, niter,
                            num_layers=cfg.model.vision_layers)
    step_fn = make_mir_finetune_step(model, tx)
    run = setup_run(cfg, params, tx, step_fn)

    rng = jax.random.PRNGKey(cfg.seed + 1)
    best = -1.0
    for epoch in range(run.start_epoch, cfg.optim.epochs):
        if cfg.evaluate:
            break
        train_loader.set_epoch(epoch)
        metrics = train_one_epoch(run, train_loader, epoch, rng)
        if finish_if_preempted(run, epoch, metrics):
            break
        eval_metrics = {}
        if cfg.eval_freq and (epoch + 1) % cfg.eval_freq == 0:
            eval_metrics = run_mir_validation(cfg, model, run)
            run.logger.log(eval_metrics, step=int(run.state.step))
        score = eval_metrics.get("avg_map", 0.0)
        is_best = score > best
        best = max(best, score)
        save_epoch(run, epoch, {**metrics, **eval_metrics}, is_best)
    if cfg.evaluate:
        print(run_mir_validation(cfg, model, run))
    run.ckpt.wait()
    run.logger.finish()


def run_mir_validation(cfg: TrainConfig, model, run):
    import pickle

    import pandas as pd

    from avion_tpu.eval.runners import CLIPEncoders, validate_mir

    d = cfg.data
    if not (d.val_metadata and d.relevancy_path
            and os.path.exists(d.relevancy_path)):
        return {}
    with jax.set_mesh(run.mesh):
        params = jax.device_get(run.state.params)
    encoders = CLIPEncoders.cached(model, params, batch=d.val_batch_size)
    val_ds = VideoCaptionDataset(
        "ek100_mir", d.root_val, d.val_metadata, is_training=False,
        clip_length=d.clip_length, chunk_len=d.chunk_len,
        augment=AugmentSpec(crop_size=d.crop_size, mode="center"),
    )
    loader = DataLoader(val_ds, d.val_batch_size, shuffle=False,
                        drop_last=False, num_workers=d.num_workers)
    rel = pickle.load(open(d.relevancy_path, "rb"))
    video_ids = pd.read_csv(d.val_metadata).values[:, 0]
    sent_csv = os.path.join(
        os.path.dirname(d.val_metadata),
        os.path.basename(d.val_metadata).replace("test", "test_sentence"))
    text_ids = pd.read_csv(sent_csv).values[:, 0]
    return validate_mir(encoders, loader, rel, video_ids, text_ids)


if __name__ == "__main__":
    main()
