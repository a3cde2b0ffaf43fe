"""CLIP dual-encoder contrastive pretraining entry point.

TPU-native counterpart of ``scripts/main_lavila_pretrain.py``: Ego4D
video-text contrastive training with fused-decode input, gathered
InfoNCE (pjit-global), cosine LR, bf16, checkpoint/resume, and the
zero-shot validation fan-out.

Usage::

    python -m avion_tpu.train.pretrain_clip \
        model.name=CLIP_VITB16 data.root=$ROOT \
        data.train_metadata=$TRAIN_METADATA optim.epochs=5

Dataset paths fall back to the same environment variables the
reference reads via dotenv (``main_lavila_pretrain.py:44-73``):
ROOT, ROOT_VAL, TRAIN_METADATA, VAL_METADATA, RELEVANCY_PATH.
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from avion_tpu.core.config import TrainConfig
from avion_tpu.data.datasets import AugmentSpec, VideoCaptionDataset
from avion_tpu.data.loader import DataLoader
from avion_tpu.models import create_model
from avion_tpu.optim import build_optimizer
from avion_tpu.parallel.launch import setup_host
from avion_tpu.train.loop import (
    finish_if_preempted,
    save_epoch,
    setup_run,
    train_one_epoch,
)
from avion_tpu.train.steps import make_clip_train_step


def env_defaults(cfg: TrainConfig) -> TrainConfig:
    d = cfg.data
    d.root = d.root or os.environ.get("ROOT", "")
    d.root_val = d.root_val or os.environ.get("ROOT_VAL", d.root)
    d.train_metadata = d.train_metadata or os.environ.get("TRAIN_METADATA", "")
    d.val_metadata = d.val_metadata or os.environ.get("VAL_METADATA", "")
    d.relevancy_path = d.relevancy_path or os.environ.get("RELEVANCY_PATH", "")
    return cfg


def build_model_and_state(cfg: TrainConfig, niter_per_ep: int):
    m = cfg.model
    model = create_model(
        m.name,
        num_frames=cfg.data.clip_length,
        project_embed_dim=m.project_embed_dim,
        use_quick_gelu=m.use_quick_gelu,
        use_flash_attn=m.use_flash_attn,
        use_grad_checkpointing=m.use_grad_checkpointing,
        remat_policy=m.remat_policy,
        sequence_parallel=m.sequence_parallel,
        moe_experts=m.moe_experts,
        pipeline=m.pipeline,
        pipeline_microbatches=m.pipeline_microbatches,
        patch_dropout=m.patch_dropout,
        pooling=m.pooling,
        input_norm=m.input_norm,
        freeze_temperature=m.freeze_temperature,
        temperature_init=m.temperature_init,
        use_logit_bias=m.use_logit_bias,
    )
    rng = jax.random.PRNGKey(cfg.seed)
    import jax.numpy as jnp

    video = jnp.zeros(
        (2, cfg.data.clip_length, model.image_size, model.image_size, 3),
        jnp.bfloat16,
    )
    text = jnp.zeros((2, model.context_length), jnp.int32)
    params = jax.jit(model.init)(rng, video, text)["params"]

    if cfg.pretrain_model:  # e.g. OpenAI CLIP weights or AVION .pt ckpt
        from avion_tpu.models.pt_import import import_clip_pt, merge_into_params

        imported = import_clip_pt(
            cfg.pretrain_model, num_frames=cfg.data.clip_length,
            context_length=model.context_length,
            vocab_size=model.vocab_size,
        )
        params = merge_into_params(params, imported, strict=False)
        print(f"[init] imported weights from {cfg.pretrain_model}")

    tx, schedule = build_optimizer(cfg.optim, params, niter_per_ep,
                                   num_layers=m.vision_layers)
    return model, params, tx


def build_loaders(cfg: TrainConfig):
    d = cfg.data
    augment = AugmentSpec(
        crop_size=d.crop_size,
        # fused_decode_crop=False moves the crop/resize/flip work to
        # the TPU (ops/fused_input); the host then only decodes
        mode="rrc" if d.fused_decode_crop else "device_rrc",
        decode_size=d.decode_size, scale_min=d.scale_min,
        scale_max=d.scale_max, hflip_prob=d.hflip_prob,
        vflip_prob=d.vflip_prob,
    )

    def make_ds(meta):
        return VideoCaptionDataset(
            d.dataset, d.root, meta,
            is_training=True, clip_length=d.clip_length,
            chunk_len=d.chunk_len, fps=d.fps, threads=d.decode_threads,
            decode_fast=d.decode_fast, augment=augment,
            subsample_stride=d.subsample_stride,
        )

    if d.shard_dir:
        # tar-sharded input: per-sample clips packed into large shard
        # files (data/shards.py) — the object-storage deployment path
        from avion_tpu.data.shards import ShardedVideoCaptionDataset

        train_ds = ShardedVideoCaptionDataset(
            d.shard_dir, is_training=True, clip_length=d.clip_length,
            threads=d.decode_threads, augment=augment,
            subsample_stride=d.subsample_stride,
            decode_fast=bool(d.decode_fast)
            if d.decode_fast is not None else True,
        )
    else:
        train_ds = make_ds(d.train_metadata)
    if d.train_metadata_aux:
        # auxiliary pseudo-narration pkls concatenated into the train
        # set (main_lavila_pretrain.py:470-495)
        from avion_tpu.data.datasets import ConcatDataset

        paths = [p.strip() for p in d.train_metadata_aux.split(",")
                 if p.strip()]
        aux = [make_ds(p) for p in paths]
        for i, (p, ds) in enumerate(zip(paths, aux)):
            print(f"auxiliary dataset [{i}]: source={p} len={len(ds)}")
        train_ds = ConcatDataset([train_ds] + aux)
    train_loader = DataLoader(
        train_ds, d.batch_size, shuffle=True, drop_last=True,
        num_workers=d.num_workers, prefetch_depth=d.prefetch_depth,
        seed=cfg.seed,
    )
    return train_ds, train_loader


def main(argv=None):
    from avion_tpu.core.config import load_dotenv

    load_dotenv()  # dataset-path env vars, reference .env convention
    argv = argv if argv is not None else sys.argv[1:]
    cfg = env_defaults(TrainConfig().apply_overrides(argv))
    if cfg.loss == "siglip" and not cfg.model.use_logit_bias:
        # the sigmoid objective needs the pairwise bias head
        # (arXiv:2303.15343 §4: init bias -10, temperature 10)
        cfg.model.use_logit_bias = True
    os.makedirs(cfg.output_dir, exist_ok=True)
    cfg.save(os.path.join(cfg.output_dir, "config.json"))
    # multi-host bring-up BEFORE any jax use (jax.distributed must
    # init before the backend); installs the preemption handler
    setup_host(cfg.seed)

    train_ds, train_loader = build_loaders(cfg)
    # steps/epoch includes data-echo repeats (LR schedule spans
    # the true step count)
    niter = max(1, len(train_loader)) * max(1, cfg.data.echo_factor)
    model, params, tx = build_model_and_state(cfg, niter)
    if cfg.optim.update_freq > 1 and cfg.optim.accum == "cached":
        from avion_tpu.train.steps import make_clip_accum_train_step

        assert cfg.data.batch_size % cfg.optim.update_freq == 0, (
            "cached accumulation needs batch_size % update_freq == 0")
        step_fn = make_clip_accum_train_step(
            model, tx, cfg.optim.update_freq,
            label_smoothing=cfg.label_smoothing,
            crop_size=cfg.data.crop_size,
            moe_aux_weight=cfg.model.moe_aux_weight,
            moe_zloss_weight=cfg.model.moe_zloss_weight,
            loss_type=cfg.loss, siglip_chunked=cfg.siglip_chunked)
    else:
        step_fn = make_clip_train_step(
            model, tx, label_smoothing=cfg.label_smoothing,
            crop_size=cfg.data.crop_size,
            moe_aux_weight=cfg.model.moe_aux_weight,
            moe_zloss_weight=cfg.model.moe_zloss_weight,
            loss_type=cfg.loss, siglip_chunked=cfg.siglip_chunked)
    run = setup_run(cfg, params, tx, step_fn)

    rng = jax.random.PRNGKey(cfg.seed + 1)
    best = -1.0
    if cfg.eval_freq and run.start_epoch == 0:
        # zero-shot-before-training sanity pass
        # (main_lavila_pretrain.py:686-696)
        zs = run_validation(cfg, model, run)
        if zs:
            print(f"[epoch -1 zero-shot] {zs}")
            run.logger.log(zs, step=0)
    for epoch in range(run.start_epoch, cfg.optim.epochs):
        train_loader.set_epoch(epoch)
        metrics = train_one_epoch(run, train_loader, epoch, rng)
        print(f"[epoch {epoch}] " + " ".join(
            f"{k}={v:.4f}" for k, v in metrics.items()))
        if finish_if_preempted(run, epoch, metrics):
            break
        eval_metrics = {}
        if cfg.eval_freq and (epoch + 1) % cfg.eval_freq == 0:
            eval_metrics = run_validation(cfg, model, run)
            run.logger.log(eval_metrics, step=int(run.state.step))
        score = eval_metrics.get("test_ek100_mir_avg_map", metrics.get("clip_acc", 0))
        is_best = score > best
        best = max(best, score)
        if (epoch + 1) % cfg.save_freq == 0 or epoch + 1 == cfg.optim.epochs:
            save_epoch(run, epoch, {**metrics, **eval_metrics}, is_best)
    run.ckpt.wait()
    run.logger.finish()


def run_validation(cfg: TrainConfig, model, run):
    """Zero-shot validation fan-out over the five suites
    (``avion/utils/validate.py``); each suite activates when its data
    paths are configured (flags or env vars)."""
    from avion_tpu.eval.validate import run_validation as _run

    with jax.set_mesh(run.mesh):
        params = jax.device_get(run.state.params)
    return _run(model, params, cfg.data)


if __name__ == "__main__":
    main()
