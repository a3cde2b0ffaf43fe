"""Zero-shot validation fan-out over the five suites.

Counterpart of ``avion/utils/validate.py`` + the ``get_val_dataset``
builders in ``evaluation_{ek100cls,egtea,charades,egomcq}.py``: each
suite activates when its dataset paths are configured (same env-var
names the reference reads through dotenv, ``misc.py:80-124``):

  EK100 MIR:  val_metadata + relevancy_path (csv + pkl)
  EK100 CLS:  EK100_ACTIONS_CSV (+ EK100 video dirs)
  EGTEA:      EGTEA_DATA_DIR + EGTEA_META_DIR
  Charades:   CHARADES_DATA_DIR + CHARADES_META_DIR
  EgoMCQ:     EGO4D_MCQ_DATA_DIR + EGO4D_MCQ_META_DIR
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
from typing import Dict, Optional

import numpy as np

from avion_tpu.data.datasets import (
    AugmentSpec,
    VideoCaptionDataset,
    VideoCaptionMCQDataset,
    VideoClassyDataset,
)
from avion_tpu.data.loader import DataLoader
from avion_tpu.eval.runners import (
    CLIPEncoders,
    build_text_classifier,
    validate_all,
    validate_egomcq,
    validate_mir,
    validate_zeroshot_cls,
)


def build_suites(encoders: CLIPEncoders, data_cfg, env=None) -> Dict:
    env = env if env is not None else os.environ
    d = data_cfg
    suites = {}

    # --- EK100 MIR retrieval -------------------------------------------------
    if d.val_metadata and d.relevancy_path and osp.exists(d.relevancy_path):
        def mir():
            import pandas as pd

            val_ds = VideoCaptionDataset(
                "ek100_mir", d.root_val or d.root, d.val_metadata,
                is_training=False, clip_length=d.clip_length,
                chunk_len=d.chunk_len,
                augment=AugmentSpec(crop_size=d.crop_size, mode="center"),
            )
            loader = DataLoader(val_ds, d.val_batch_size, shuffle=False,
                                drop_last=False, num_workers=d.num_workers)
            rel = pickle.load(open(d.relevancy_path, "rb"))
            video_ids = pd.read_csv(d.val_metadata).values[:, 0]
            sent = osp.join(
                osp.dirname(d.val_metadata),
                osp.basename(d.val_metadata).replace("test", "test_sentence"))
            text_ids = pd.read_csv(sent).values[:, 0]
            return validate_mir(encoders, loader, rel, video_ids, text_ids)

        suites["ek100_mir"] = mir

    # --- EK100 CLS zero-shot -------------------------------------------------
    actions_csv = env.get("EK100_ACTIONS_CSV", "")
    ek_val = env.get("EK100_VAL", d.val_metadata)
    ek_dir = env.get("EK100_VIDEO_DIR", "")
    if actions_csv and ek_val and ek_dir and osp.exists(actions_csv):
        def ek100_cls():
            from avion_tpu.train.finetune_cls import load_actions

            labels, pairs, mapping = load_actions(actions_csv)
            ds = VideoClassyDataset(
                "ek100_cls", ek_dir, ek_val, is_training=False,
                clip_length=d.clip_length, chunk_len=d.chunk_len,
                label_mapping=mapping,
                augment=AugmentSpec(crop_size=d.crop_size, mode="center"),
            )
            loader = DataLoader(ds, d.val_batch_size, shuffle=False,
                                drop_last=False, num_workers=d.num_workers)
            clf = build_text_classifier(encoders, labels)
            return validate_zeroshot_cls(
                encoders, loader, clf, n_classes=len(labels),
                marginal_actions=pairs)

        suites["ek100_cls"] = ek100_cls

    # --- EGTEA zero-shot -----------------------------------------------------
    egtea_data = env.get("EGTEA_DATA_DIR", "")
    egtea_meta = env.get("EGTEA_META_DIR", "")
    if egtea_data and egtea_meta and osp.isdir(egtea_meta):
        def egtea():
            from avion_tpu.data.metadata import generate_label_map

            split = osp.join(egtea_meta, "test_split1.txt")
            ds = VideoClassyDataset(
                "egtea", egtea_data, split, is_training=False,
                clip_length=d.clip_length, chunk_len=-1,
                augment=AugmentSpec(crop_size=d.crop_size, mode="center"),
            )
            labels = generate_label_map(
                "egtea", {"action_idx": osp.join(egtea_meta, "action_idx.txt")})
            loader = DataLoader(ds, d.val_batch_size, shuffle=False,
                                drop_last=False, num_workers=d.num_workers)
            clf = build_text_classifier(encoders, labels)
            return validate_zeroshot_cls(encoders, loader, clf,
                                         n_classes=len(labels))

        suites["egtea"] = egtea

    # --- Charades-Ego multi-label --------------------------------------------
    cha_data = env.get("CHARADES_DATA_DIR", "")
    cha_meta = env.get("CHARADES_META_DIR", "")
    if cha_data and cha_meta and osp.isdir(cha_meta):
        def charades():
            from avion_tpu.data.metadata import generate_label_map

            labels = generate_label_map(
                "charades_ego",
                {"classes_txt": osp.join(cha_meta, "Charades_v1_classes.txt")})
            mapping = {f"c{i:03d}": i for i in range(len(labels))}
            ds = VideoClassyDataset(
                "charades_ego", cha_data,
                osp.join(cha_meta, "CharadesEgo_v1_test_only1st.csv"),
                is_training=False, clip_length=d.clip_length, chunk_len=-1,
                label_mapping=mapping,
                augment=AugmentSpec(crop_size=d.crop_size, mode="center"),
            )
            loader = DataLoader(ds, d.val_batch_size, shuffle=False,
                                drop_last=False, num_workers=d.num_workers)
            clf = build_text_classifier(encoders, labels)
            return validate_zeroshot_cls(encoders, loader, clf,
                                         multilabel=True)

        suites["charades_ego"] = charades

    # --- EgoMCQ --------------------------------------------------------------
    mcq_data = env.get("EGO4D_MCQ_DATA_DIR", "")
    mcq_meta = env.get("EGO4D_MCQ_META_DIR", "")
    if mcq_data and mcq_meta:
        def egomcq():
            ds = VideoCaptionMCQDataset(
                mcq_data, osp.join(mcq_meta, "egomcq.json"),
                clip_length=d.clip_length, chunk_len=d.chunk_len,
                crop_size=d.crop_size,
            )
            loader = DataLoader(ds, max(1, d.val_batch_size // 8),
                                shuffle=False, drop_last=False,
                                num_workers=d.num_workers)
            return validate_egomcq(encoders, loader)

        suites["egomcq"] = egomcq

    return suites


def run_validation(model, params, data_cfg, env=None,
                   strict: bool = False) -> Dict[str, float]:
    enc = CLIPEncoders.cached(model, params, batch=data_cfg.val_batch_size)
    return validate_all(enc, build_suites(enc, data_cfg, env), strict=strict)


def main(argv=None):
    """Standalone zero-shot evaluation CLI (the reference's
    ``--evaluate`` path, ``main_lavila_pretrain.py:664-669``)::

        python -m avion_tpu.eval.validate model.name=CLIP_VITB16 \\
            pretrain_model=checkpoints/avion_pretrain_lavila_vitb_best.pt

    Suites activate from configured paths / env vars; failures raise
    (strict mode) so a misconfigured suite is loud.
    """
    import json
    import sys

    import jax

    from avion_tpu.core.config import TrainConfig, load_dotenv
    from avion_tpu.models import create_model
    from avion_tpu.parallel.launch import setup_host

    load_dotenv()
    argv = argv if argv is not None else sys.argv[1:]
    cfg = TrainConfig().apply_overrides(argv)
    setup_host(cfg.seed)

    m = cfg.model
    model = create_model(
        m.name, num_frames=cfg.data.clip_length,
        project_embed_dim=m.project_embed_dim,
        use_quick_gelu=m.use_quick_gelu, use_flash_attn=m.use_flash_attn,
        pooling=m.pooling, temperature_init=m.temperature_init,
    )
    if not cfg.pretrain_model:
        raise SystemExit("pretrain_model=<ckpt.pt|orbax_dir> is required")
    import jax.numpy as jnp

    video = jnp.zeros((2, cfg.data.clip_length, model.image_size,
                       model.image_size, 3), jnp.bfloat16)
    text = jnp.zeros((2, model.context_length), jnp.int32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), video,
                                   text)["params"]
    from avion_tpu.train.common import load_pretrained_params

    params = load_pretrained_params(
        cfg.pretrain_model, template, num_frames=cfg.data.clip_length,
        context_length=model.context_length, vocab_size=model.vocab_size)

    results = run_validation(model, params, cfg.data, strict=True)
    print(json.dumps(results, indent=2, sort_keys=True))
    return results


if __name__ == "__main__":
    main()
