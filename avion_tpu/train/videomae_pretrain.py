"""VideoMAE masked-autoencoder pretraining entry point.

Counterpart of ``scripts/main_videomae_pretrain.py``: Kinetics strided
clips with fused MSC+hflip decode, 90% tube masking, visible-token-only
encoder, normalized-pixel MSE target, AdamW or Lion, LR scaled by
global batch / 256.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp

from avion_tpu.core.config import TrainConfig
from avion_tpu.data.datasets import AugmentSpec, KineticsDataset
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
from avion_tpu.train.steps import make_videomae_train_step


def main(argv=None):
    from avion_tpu.core.config import load_dotenv

    load_dotenv()  # dataset-path env vars, reference .env convention
    argv = argv if argv is not None else sys.argv[1:]
    cfg = TrainConfig().apply_overrides(argv)
    cfg.data.dataset = "kinetics"
    d = cfg.data
    d.root = d.root or os.environ.get("K400_ROOT", "")
    d.train_metadata = d.train_metadata or os.environ.get("K400_TRAIN_LIST", "")
    os.makedirs(cfg.output_dir, exist_ok=True)
    cfg.save(os.path.join(cfg.output_dir, "config.json"))
    # multi-host bring-up BEFORE any jax use (jax.distributed must
    # init before the backend); installs the preemption handler
    setup_host(cfg.seed)

    name = cfg.model.name if "VIDEOMAE" in cfg.model.name else "VIDEOMAE_VITB16"
    model = create_model(
        name,
        num_frames=d.clip_length,
        use_flash_attn=cfg.model.use_flash_attn,
        use_grad_checkpointing=cfg.model.use_grad_checkpointing,
        decoder_depth=cfg.model.decoder_layers,
        mask_ratio=d.mask_ratio,
    )
    cfg.model.patch_size = model.patch_size
    cfg.model.tubelet_size = model.tubelet_size
    d.crop_size = model.image_size

    train_ds = KineticsDataset(
        d.root, d.train_metadata, clip_length=d.clip_length,
        clip_stride=d.clip_stride, threads=d.decode_threads,
        decode_fast=d.decode_fast,
        crop_size=d.crop_size, patch_size=cfg.model.patch_size,
        tubelet_size=cfg.model.tubelet_size, mask_ratio=d.mask_ratio,
        augment=AugmentSpec(crop_size=d.crop_size, mode="msc",
                            hflip_prob=0.5),
    )
    train_loader = DataLoader(train_ds, d.batch_size, shuffle=True,
                              drop_last=True, num_workers=d.num_workers,
                              prefetch_depth=d.prefetch_depth, seed=cfg.seed)
    # steps/epoch includes data-echo repeats (LR schedule spans
    # the true step count)
    niter = max(1, len(train_loader)) * max(1, cfg.data.echo_factor)

    rng = jax.random.PRNGKey(cfg.seed)
    video = jnp.zeros((2, d.clip_length, d.crop_size, d.crop_size, 3),
                      jnp.bfloat16)
    import numpy as np

    n = model.num_patches
    n_vis = model.n_visible
    mask0 = np.zeros((2, n), bool)
    mask0[:, n_vis:] = True
    params = jax.jit(model.init)(rng, video, jnp.asarray(mask0))["params"]

    # LR x global_batch / 256 (main_videomae_pretrain.py:151-154)
    cfg.optim.lr = cfg.optim.lr * d.batch_size / 256
    tx, _ = build_optimizer(cfg.optim, params, niter,
                            num_layers=model.encoder_layers)
    step_fn = make_videomae_train_step(
        model, tx, patch_size=cfg.model.patch_size,
        tubelet_size=cfg.model.tubelet_size,
        # echoed repeats must not reuse the host batch's tube mask
        regen_mask=cfg.data.echo_factor > 1,
    )
    run = setup_run(cfg, params, tx, step_fn)

    rng = jax.random.PRNGKey(cfg.seed + 1)
    for epoch in range(run.start_epoch, cfg.optim.epochs):
        train_loader.set_epoch(epoch)
        metrics = train_one_epoch(run, train_loader, epoch, rng)
        print(f"[epoch {epoch}] " + " ".join(
            f"{k}={v:.4f}" for k, v in metrics.items()))
        if finish_if_preempted(run, epoch, metrics):
            break
        # save every save_freq epochs (reference: every 20,
        # main_videomae_pretrain.py:264-275)
        if (epoch + 1) % cfg.save_freq == 0 or epoch + 1 == cfg.optim.epochs:
            save_epoch(run, epoch, metrics)
    run.ckpt.wait()
    run.logger.finish()


if __name__ == "__main__":
    main()
