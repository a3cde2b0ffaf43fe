"""EK100-CLS action-recognition finetuning entry point.

Counterpart of ``scripts/main_lavila_finetune_cls.py``: put a linear
classifier on the pretrained visual tower, finetune with mixup/cutmix +
label smoothing, LR scaled by global batch / 128, SGD or AdamW, and
evaluate with multi-clip/crop views + verb/noun marginalization.
"""

from __future__ import annotations

import csv
import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from avion_tpu.core.config import TrainConfig
from avion_tpu.data.datasets import AugmentSpec, VideoClassyDataset
from avion_tpu.data.loader import DataLoader
from avion_tpu.models.clip import VideoClassifier
from avion_tpu.models.vit import VisionTransformer
from avion_tpu.models.layers import quick_gelu
from avion_tpu.optim import build_optimizer
from avion_tpu.train.augment_device import mixup_cutmix
from avion_tpu.train.common import extract_visual_params, load_pretrained_params
from avion_tpu.parallel.launch import setup_host
from avion_tpu.train.loop import (
    finish_if_preempted,
    save_epoch,
    setup_run,
    train_one_epoch,
)
from avion_tpu.train.steps import make_cls_train_step


def env_defaults(cfg: TrainConfig) -> TrainConfig:
    d = cfg.data
    d.dataset = "ek100_cls"
    d.root = d.root or os.environ.get("EK100_VIDEO_DIR", "")
    d.root_val = d.root_val or d.root
    d.train_metadata = d.train_metadata or os.environ.get("EK100_TRAIN", "")
    d.val_metadata = d.val_metadata or os.environ.get("EK100_VAL", "")
    d.label_map = d.label_map or os.environ.get("EK100_ACTIONS_CSV", "")
    return cfg


def load_actions(actions_csv: str):
    """EPIC-100 actions.csv -> (action label texts, (verb, noun) pairs,
    'v:n' -> action-id mapping)."""
    labels, pairs, mapping = [], [], {}
    with open(actions_csv) as f:
        reader = csv.reader(f)
        next(reader)
        for i, row in enumerate(reader):
            labels.append(row[3].replace("_", " "))
            verb, noun = int(row[1]), int(row[2])
            pairs.append((verb, noun))
            mapping[f"{verb}:{noun}"] = i
    return labels, pairs, mapping


def build_classifier(cfg: TrainConfig, num_classes: int):
    m = cfg.model
    act = quick_gelu if m.use_quick_gelu else None
    import flax.linen as nn

    vision = VisionTransformer(
        image_size=m.image_size, patch_size=m.patch_size,
        num_frames=cfg.data.clip_length, width=m.vision_width,
        layers=m.vision_layers, heads=m.vision_heads, output_dim=None,
        act=act or nn.gelu, use_flash=m.use_flash_attn,
        remat=m.use_grad_checkpointing, patch_dropout_rate=m.patch_dropout,
        drop_path_rate=m.drop_path_rate,
    )
    return VideoClassifier(vision, dropout=m.classifier_dropout,
                           num_classes=num_classes)


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

    labels, pairs, mapping = load_actions(d.label_map)
    num_classes = len(labels)

    model = build_classifier(cfg, num_classes)
    rng = jax.random.PRNGKey(cfg.seed)
    video = jnp.zeros((2, d.clip_length, cfg.model.image_size,
                       cfg.model.image_size, 3), jnp.bfloat16)
    params = model.init(rng, video)["params"]

    if cfg.pretrain_model:
        # visual tower from the CLIP pretrain checkpoint
        from avion_tpu.models.pt_import import import_clip_pt, merge_into_params

        if cfg.pretrain_model.endswith((".pt", ".pth")):
            imported = import_clip_pt(cfg.pretrain_model,
                                      num_frames=d.clip_length)
            visual = extract_visual_params(imported)
        else:
            # orbax CLIP checkpoint: restore then take the visual subtree
            restored = load_pretrained_params(
                cfg.pretrain_model,
                _clip_params_template(cfg, d),
                num_frames=d.clip_length,
            )
            visual = extract_visual_params(restored)
        params = merge_into_params(params, {"vision": visual}, strict=False)
        print(f"[init] visual tower from {cfg.pretrain_model}")

    # LR x global_batch / 128 (main_lavila_finetune_cls.py:367-370)
    from avion_tpu.optim.factory import apply_batch_lr_scale
    apply_batch_lr_scale(cfg.optim, d.batch_size, default_base=128)
    train_ds = VideoClassyDataset(
        "ek100_cls", d.root, d.train_metadata, is_training=True,
        clip_length=d.clip_length, chunk_len=d.chunk_len,
        threads=d.decode_threads, decode_fast=d.decode_fast,
        label_mapping=mapping,
        num_sample=d.repeated_aug,
        augment=AugmentSpec(crop_size=d.crop_size, mode="rrc",
                            scale_min=d.scale_min, scale_max=d.scale_max),
    )
    train_loader = DataLoader(train_ds, d.batch_size, shuffle=True,
                              drop_last=True, num_workers=d.num_workers,
                              seed=cfg.seed)
    # steps/epoch includes data-echo repeats (LR schedule spans
    # the true step count)
    niter = max(1, len(train_loader)) * max(1, cfg.data.echo_factor)
    tx, _ = build_optimizer(cfg.optim, params, niter,
                            num_layers=cfg.model.vision_layers)

    mix = None
    if cfg.mixup > 0 or cfg.cutmix > 0:
        mix = functools.partial(
            mixup_cutmix, num_classes=num_classes, mixup_alpha=cfg.mixup,
            cutmix_alpha=cfg.cutmix, switch_prob=cfg.mixup_switch_prob,
            prob=cfg.mixup_prob, smoothing=cfg.smoothing,
            mode=cfg.mixup_mode, cutmix_minmax=cfg.cutmix_minmax,
        )
        mix_fn = lambda key, v, l: mix(key, v, l)
    else:
        mix_fn = None
    step_fn = make_cls_train_step(model, tx, label_smoothing=cfg.smoothing,
                                  mixup_fn=mix_fn)
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
            eval_metrics = validate(cfg, model, run, pairs)
            run.logger.log(eval_metrics, step=int(run.state.step))
        score = eval_metrics.get("acc1", metrics.get("acc1", 0))
        is_best = score > best
        best = max(best, score)
        save_epoch(run, epoch, {**metrics, **eval_metrics}, is_best)
    if cfg.evaluate:
        print(validate(cfg, model, run, pairs))
    run.ckpt.wait()
    run.logger.finish()


def _clip_params_template(cfg, d):
    from avion_tpu.models import create_model

    clip = create_model(cfg.model.name, num_frames=d.clip_length,
                        use_flash_attn=False)
    rng = jax.random.PRNGKey(0)
    v = jnp.zeros((1, d.clip_length, clip.image_size, clip.image_size, 3))
    t = jnp.zeros((1, clip.context_length), jnp.int32)
    return clip.init(rng, v, t)["params"]


def validate(cfg: TrainConfig, model, run, pairs):
    """Multi-view eval with softmax-mean over views + verb/noun
    marginalized accuracy (``main_lavila_finetune_cls.py:810-955``)."""
    from avion_tpu.data.transforms import normalize_video
    from avion_tpu.eval.classification_metrics import (
        confusion_matrix, get_marginal_indexes, marginalize,
        mean_class_accuracy, topk_accuracy,
    )

    d = cfg.data
    if not d.val_metadata:
        return {}
    mapping = {f"{v}:{n}": i for i, (v, n) in enumerate(pairs)}
    val_ds = VideoClassyDataset(
        "ek100_cls", d.root_val, d.val_metadata, is_training=False,
        clip_length=d.clip_length, chunk_len=d.chunk_len,
        num_clips=d.num_clips, label_mapping=mapping,
        augment=AugmentSpec(crop_size=d.crop_size, mode="center"),
    )
    loader = DataLoader(val_ds, d.val_batch_size, shuffle=False,
                        drop_last=False, num_workers=d.num_workers)
    with jax.set_mesh(run.mesh):
        params = jax.device_get(run.state.params)

    @jax.jit
    def forward(params, video):
        v = normalize_video(video)
        return model.apply({"params": params}, v)

    all_logits, all_labels = [], []
    for batch in loader:
        video = batch["video"]
        if video.ndim == 6:
            b, nv = video.shape[:2]
            logits = np.asarray(
                forward(params, video.reshape((b * nv,) + video.shape[2:])),
                np.float32,
            ).reshape(b, nv, -1)
            probs = _softmax(logits).mean(axis=1)
        else:
            probs = _softmax(np.asarray(forward(params, video), np.float32))
        all_logits.append(probs)
        all_labels.append(np.asarray(batch["label"]))
    probs = np.concatenate(all_logits)
    labels = np.concatenate(all_labels)
    acc1, acc5 = topk_accuracy(probs, labels, (1, 5))
    cm = confusion_matrix(np.argmax(probs, 1), labels, len(pairs))
    mean_acc, _ = mean_class_accuracy(cm)
    out = {"acc1": acc1, "acc5": acc5, "mean_class_acc": mean_acc}
    for mode in ("verb", "noun"):
        idx = get_marginal_indexes(pairs, mode)
        mp = marginalize(probs, idx)
        col = 0 if mode == "verb" else 1
        part = np.asarray([pairs[a][col] for a in labels])
        out[f"{mode}_acc1"] = topk_accuracy(mp, part, (1,))[0]
    return out


def _softmax(x):
    x = x - x.max(-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(-1, keepdims=True)


if __name__ == "__main__":
    main()
