"""VideoMAE supervised finetuning entry point (Kinetics-400).

Counterpart of ``scripts/main_videomae_finetune.py``: load the MAE
encoder into the finetune ViT (qkv remap handled by the importer),
layer-wise LR decay, mixup/cutmix, label smoothing, EMA, RandAugment +
RandomErasing on the host, multi-view (temporal x spatial crop) test.
"""

from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from avion_tpu.core.config import TrainConfig
from avion_tpu.data.datasets import AugmentSpec, VideoClassyDataset
from avion_tpu.data.loader import DataLoader
from avion_tpu.data.rand_augment import rand_augment_clip, random_erase_clip
from avion_tpu.models import create_model
from avion_tpu.optim import build_optimizer
from avion_tpu.train.augment_device import mixup_cutmix
from avion_tpu.parallel.launch import setup_host
from avion_tpu.train.loop import (
    finish_if_preempted,
    save_epoch,
    setup_run,
    train_one_epoch,
)
from avion_tpu.train.steps import make_cls_train_step


class AugmentedK400(VideoClassyDataset):
    """Adds host-side RandAugment + cube RandomErasing on train items
    (``classification_dataset.py:72-90``)."""

    def __init__(self, *args, use_randaug=True, erase_prob=0.25, **kwargs):
        super().__init__(*args, **kwargs)
        self.use_randaug = use_randaug
        self.erase_prob = erase_prob

    def __getitem__(self, i):
        item = super().__getitem__(i)
        if not self.is_training:
            return item
        # repeated augmentation (num_sample>1) yields a list of views;
        # each gets its own independent RandAugment/erase draw
        views = item if isinstance(item, list) else [item]
        rng = np.random.RandomState()
        for v in views:
            if self.use_randaug:
                v["video"] = rand_augment_clip(v["video"], rng)
            if self.erase_prob > 0:
                v["video"] = random_erase_clip(v["video"], rng,
                                               self.erase_prob)
        return item


def main(argv=None):
    from avion_tpu.core.config import load_dotenv

    load_dotenv()  # dataset-path env vars, reference .env convention
    argv = argv if argv is not None else sys.argv[1:]
    cfg = TrainConfig().apply_overrides(argv)
    d = cfg.data
    d.dataset = "kinetics"
    d.root = d.root or os.environ.get("K400_ROOT", "")
    d.train_metadata = d.train_metadata or os.environ.get("K400_TRAIN_LIST", "")
    d.val_metadata = d.val_metadata or os.environ.get("K400_VAL_LIST", "")
    os.makedirs(cfg.output_dir, exist_ok=True)
    cfg.save(os.path.join(cfg.output_dir, "config.json"))
    # multi-host bring-up BEFORE any jax use (jax.distributed must
    # init before the backend); installs the preemption handler
    setup_host(cfg.seed)

    num_classes = cfg.model.num_classes or 400
    name = (cfg.model.name if "VIDEOMAE" in cfg.model.name
            else "VIDEOMAE_VITB16_FT")
    model = create_model(
        name, num_frames=d.clip_length,
        num_classes=num_classes, use_flash_attn=cfg.model.use_flash_attn,
        use_grad_checkpointing=cfg.model.use_grad_checkpointing,
        drop_path_rate=cfg.model.drop_path_rate,
        fc_drop_rate=cfg.model.classifier_dropout,
    )
    d.crop_size = model.image_size
    rng = jax.random.PRNGKey(cfg.seed)
    video = jnp.zeros((2, d.clip_length, d.crop_size, d.crop_size, 3),
                      jnp.bfloat16)
    params = jax.jit(model.init)(rng, video)["params"]

    if cfg.pretrain_model:
        from avion_tpu.models.pt_import import import_videomae_pt, merge_into_params

        imported = import_videomae_pt(cfg.pretrain_model)
        params = merge_into_params(params, imported, strict=False)
        print(f"[init] MAE encoder from {cfg.pretrain_model}")

    train_ds = AugmentedK400(
        "kinetics", d.root, d.train_metadata, is_training=True,
        clip_length=d.clip_length, clip_stride=d.clip_stride,
        threads=d.decode_threads, num_sample=d.repeated_aug,
        decode_fast=d.decode_fast,
        use_randaug=d.rand_aug, erase_prob=d.erase_prob,
        augment=AugmentSpec(crop_size=d.crop_size, mode="rrc",
                            scale_min=d.scale_min, scale_max=d.scale_max,
                            hflip_prob=0.5),
    )
    train_loader = DataLoader(train_ds, d.batch_size, shuffle=True,
                              drop_last=True, num_workers=d.num_workers,
                              seed=cfg.seed)
    # steps/epoch includes data-echo repeats (LR schedule spans
    # the true step count)
    niter = max(1, len(train_loader)) * max(1, cfg.data.echo_factor)

    # LR x global_batch / 256 (main_videomae_finetune.py:285-288)
    from avion_tpu.optim.factory import apply_batch_lr_scale
    apply_batch_lr_scale(cfg.optim, d.batch_size, default_base=256)
    tx, _ = build_optimizer(cfg.optim, params, niter,
                            num_layers=model.layers)

    mix_fn = None
    if cfg.mixup > 0 or cfg.cutmix > 0:
        mix = functools.partial(
            mixup_cutmix, num_classes=num_classes, mixup_alpha=cfg.mixup,
            cutmix_alpha=cfg.cutmix, switch_prob=cfg.mixup_switch_prob,
            prob=cfg.mixup_prob, smoothing=cfg.smoothing,
            mode=cfg.mixup_mode, cutmix_minmax=cfg.cutmix_minmax,
        )
        mix_fn = lambda key, v, l: mix(key, v, l)
    step_fn = make_cls_train_step(model, tx, label_smoothing=cfg.smoothing,
                                  ema_decay=cfg.ema_decay if cfg.use_ema else None,
                                  mixup_fn=mix_fn)
    run = setup_run(cfg, params, tx, step_fn, use_ema=cfg.use_ema)

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
        if cfg.eval_freq and (epoch + 1) % cfg.eval_freq == 0 and d.val_metadata:
            eval_metrics = validate(cfg, model, run)
            run.logger.log(eval_metrics, step=int(run.state.step))
        score = eval_metrics.get("acc1", metrics.get("acc1", 0))
        is_best = score > best
        best = max(best, score)
        save_epoch(run, epoch, {**metrics, **eval_metrics}, is_best)
    if cfg.evaluate and d.val_metadata:
        print(validate(cfg, model, run))
    run.ckpt.wait()
    run.logger.finish()


def validate(cfg: TrainConfig, model, run):
    """Multi-view test: num_clips temporal x 3 spatial crops, softmax
    mean (``main_videomae_finetune.py`` test path)."""
    from avion_tpu.data.transforms import (
        IMAGENET_MEAN, IMAGENET_STD, normalize_video,
    )
    from avion_tpu.eval.classification_metrics import topk_accuracy

    d = cfg.data
    val_ds = VideoClassyDataset(
        "kinetics", d.root_val or d.root, d.val_metadata, is_training=False,
        clip_length=d.clip_length, clip_stride=d.clip_stride,
        num_clips=d.num_clips, num_crops=d.num_crops,
        augment=AugmentSpec(crop_size=d.crop_size, mode="center"),
    )
    loader = DataLoader(val_ds, d.val_batch_size, shuffle=False,
                        drop_last=False, num_workers=d.num_workers)
    with jax.set_mesh(run.mesh):
        params = jax.device_get(
            run.state.ema_params if cfg.use_ema and run.state.ema_params
            is not None else run.state.params)

    @jax.jit
    def forward(p, video):
        return model.apply(
            {"params": p}, normalize_video(video, IMAGENET_MEAN, IMAGENET_STD)
        )

    probs_all, labels_all = [], []
    for batch in loader:
        video = batch["video"]
        if video.ndim == 6:
            b, nv = video.shape[:2]
            logits = np.asarray(
                forward(params, video.reshape((b * nv,) + video.shape[2:])),
                np.float32).reshape(b, nv, -1)
            p = _softmax(logits).mean(1)
        else:
            p = _softmax(np.asarray(forward(params, video), np.float32))
        probs_all.append(p)
        labels_all.append(np.asarray(batch["label"]))
    probs = np.concatenate(probs_all)
    labels = np.concatenate(labels_all)
    acc1, acc5 = topk_accuracy(probs, labels, (1, 5))
    return {"acc1": acc1, "acc5": acc5}


def _softmax(x):
    x = x - x.max(-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(-1, keepdims=True)


if __name__ == "__main__":
    main()
