"""One live end-to-end convergence run on the real chip.

Proof that the ASSEMBLED system trains on hardware: generates a
learnable synthetic x264 dataset (seeded per-class video content),
runs the REAL training entry — real fused-decode loader with worker
processes, shm transport and device prefetch — through a mid-run
SIGTERM preemption (checkpoint + clean exit, ``parallel/launch.py``)
and an auto-resumed second launch to completion, then restores the
final checkpoint and runs a held-out evaluation.  The log (descending
loss, measured duty cycle, resume step) is summarized into a
``docs/E2E*.md`` report.

Five families:

- ``--family clip`` (default): ``train/pretrain_clip.py`` on chunked
  caption windows; final held-out zero-shot retrieval sweep
  (``docs/E2E.md``).
- ``--family videomae``: ``train/videomae_pretrain.py`` on a Kinetics
  video list (strided 16-frame clips, 90% tube masking); final
  held-out masked-reconstruction MSE, restored checkpoint vs a fresh
  init (``docs/E2E_VIDEOMAE.md``).
- ``--family cls``: ``train/finetune_cls.py`` on an EK100-layout
  synthetic dataset (chunked ``P00/P00_xxx.MP4/0.MP4`` videos +
  ``actions.csv`` verb/noun label map) with device mixup/cutmix +
  label smoothing; final held-out top-1 plus verb/noun marginalized
  accuracy from the restored classifier (``docs/E2E_CLS.md``).
- ``--family mir``: ``train/finetune_mir.py`` (max-margin ranking
  over relevancy-sampled captions) on an EK100-MIR-layout synthetic
  dataset (sentence tables + graded relevancy pickles); final
  held-out retrieval mAP/nDCG from the restored checkpoint vs a
  fresh init (``docs/E2E_MIR.md``).
- ``--family nlq``: ``egonlq/train_nlq.py`` (VSLNet span grounding)
  on synthetic-but-learnable per-sample feature files; final held-out
  R@k/IoU from the restored checkpoint vs a fresh init
  (``docs/E2E_NLQ.md``).

Mirrors the reference's operational loop: train -> preempt/requeue
(``run_with_submit_lavila_pretrain.py:53-59``) -> resume
(``main_lavila_pretrain.py:386-403``) -> validation.

Usage (real chip; ~20-30 min on a 1-core CI host, decode-bound)::

    python -m avion_tpu.tools.e2e_convergence \
        [--family clip|videomae] [--classes 32] [--windows 64]
        [--batch 32] [--epochs 6] [--out /tmp/avion_e2e]
        [--report docs/E2E.md]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import pickle
import signal
import subprocess
import sys
import time

import numpy as np

_NOUNS = [
    "knife", "drawer", "kettle", "sponge", "ladder", "wrench", "bottle",
    "carrot", "mirror", "pencil", "bucket", "window", "garlic", "hammer",
    "teapot", "folder", "sheets", "candle", "pillow", "shovel", "magnet",
    "basket", "helmet", "napkin", "button", "litter", "violin", "barrel",
    "gloves", "lentil", "switch", "strap",
]
_VERBS = ["picks up", "washes", "opens", "closes", "cuts", "stirs",
          "wipes", "folds"]


def caption_for(cls: int) -> str:
    noun = _NOUNS[cls % len(_NOUNS)]
    verb = _VERBS[(cls // len(_NOUNS)) % len(_VERBS)]
    return f"#C C {verb} the {noun} number {cls}"


def make_class_dataset(root: str, n_classes: int, windows_per_class: int,
                       chunk_len: int = 15, fps: int = 30,
                       w: int = 456, h: int = 256):
    """Seeded x264 videos (one 15-sec chunk per class, visually distinct
    texture/chroma) + train metadata pkl + held-out window list."""
    from avion_tpu.data.video_reader import write_test_video

    os.makedirs(root, exist_ok=True)
    train, heldout = [], []
    rs = np.random.RandomState(0)
    for c in range(n_classes):
        vid = f"cls{c:03d}"
        d = osp.join(root, f"{vid}.mp4")
        os.makedirs(d, exist_ok=True)
        path = osp.join(d, "0.mp4")
        if not osp.exists(path):
            write_test_video(path, chunk_len * fps, w=w, h=h, fps=fps,
                             gop=250, bframes=3, codec="libx264",
                             noise=True, seed=1000 + 7919 * c)
        cap = caption_for(c)
        for _ in range(windows_per_class):
            st = float(rs.uniform(0.2, chunk_len - 2.2))
            train.append((vid, st, st + 2.0, cap))
        for k in range(4):  # held-out eval windows (fixed offsets)
            st = 0.5 + k * 3.0
            heldout.append((vid, st, st + 2.0, c))
    meta = osp.join(root, "train.pkl")
    with open(meta, "wb") as f:
        pickle.dump(train, f)
    with open(osp.join(root, "heldout.json"), "w") as f:
        json.dump(heldout, f)
    return meta


def make_mae_dataset(root: str, n_videos: int, repeats: int,
                     n_frames: int = 240, fps: int = 30,
                     w: int = 456, h: int = 256) -> str:
    """Seeded x264 videos + a Kinetics-style 'path num_frames label'
    list (each video listed ``repeats`` times: KineticsDataset samples
    a fresh strided window per row) + fixed held-out eval windows."""
    from avion_tpu.data.video_reader import write_test_video

    os.makedirs(root, exist_ok=True)
    lines = []
    for v in range(n_videos):
        name = f"mae{v:03d}.mp4"
        path = osp.join(root, name)
        if not osp.exists(path):
            write_test_video(path, n_frames, w=w, h=h, fps=fps, gop=250,
                             bframes=3, codec="libx264", noise=True,
                             seed=5000 + 7919 * v)
        lines.extend([f"{name} {n_frames} {v}"] * repeats)
    meta = osp.join(root, "train.txt")
    with open(meta, "w") as f:
        f.write("\n".join(lines) + "\n")
    return meta


def _sec2ts(s: float) -> str:
    """seconds -> 'HH:MM:SS.xx' (inverse of metadata.datetime2sec)."""
    return f"{int(s) // 3600:02d}:{int(s) % 3600 // 60:02d}:{s % 60:05.2f}"


def make_cls_dataset(root: str, n_classes: int, windows_per_class: int,
                     chunk_len: int = 15, fps: int = 30,
                     w: int = 456, h: int = 256) -> str:
    """EK100-layout synthetic classification set: chunked
    ``root/P00/P00_xxx.MP4/0.MP4`` seeded videos (one class each),
    ``actions.csv`` (verb/noun -> action id, ``load_actions``), a
    train csv in the EPIC column layout (``metadata.load_ek100``), and
    fixed held-out windows."""
    from avion_tpu.data.video_reader import write_test_video

    os.makedirs(osp.join(root, "P00"), exist_ok=True)
    # distinct, coprime-ish verb/noun pool sizes so BOTH marginalized
    # evals aggregate multiple actions per class (noun == action id
    # would make noun-marginalized top-1 identical to action top-1);
    # (verb, noun) pairs stay unique for n_classes <= lcm(8, 5) = 40
    n_verbs = max(1, min(8, n_classes))
    n_nouns = max(1, min(5, n_classes))
    assert n_classes <= 40, "verb/noun pair uniqueness needs lcm(8,5)=40"
    rows, heldout = [], []
    actions = []
    rs = np.random.RandomState(0)
    for c in range(n_classes):
        vid = f"P00_{c:03d}"
        d = osp.join(root, "P00", vid + ".MP4")
        os.makedirs(d, exist_ok=True)
        path = osp.join(d, "0.MP4")
        if not osp.exists(path):
            write_test_video(path, chunk_len * fps, w=w, h=h, fps=fps,
                             gop=250, bframes=3, codec="libx264",
                             noise=True, seed=2000 + 7919 * c)
        verb, noun = c % n_verbs, c % n_nouns
        actions.append((c, verb, noun, caption_for(c).replace(" ", "_")))
        for _ in range(windows_per_class):
            st = float(rs.uniform(0.2, chunk_len - 2.2))
            rows.append((vid, st, st + 2.0, verb, noun))
        for k in range(4):
            st = 0.5 + k * 3.0
            heldout.append((f"P00/{vid}", st, st + 2.0, c))
    with open(osp.join(root, "actions.csv"), "w") as f:
        f.write("id,verb,noun,action\n")
        for i, v, n, txt in actions:
            f.write(f"{i},{v},{n},{txt}\n")
    meta = osp.join(root, "train.csv")
    with open(meta, "w") as f:
        # column layout consumed by load_ek100: [1]=pid [2]=vid
        # [4]=start [5]=stop [8]=narration [10]=verb [12]=noun
        f.write("uid,participant_id,video_id,narration_timestamp,"
                "start_timestamp,stop_timestamp,start_frame,stop_frame,"
                "narration,verb_id_raw,verb_class,noun_raw,noun_class\n")
        for i, (vid, st, en, verb, noun) in enumerate(rows):
            f.write(f"{i},P00,{vid},{_sec2ts(st)},{_sec2ts(st)},"
                    f"{_sec2ts(en)},0,0,win {i},{verb},{verb},"
                    f"{noun},{noun}\n")
    with open(osp.join(root, "heldout.json"), "w") as f:
        json.dump(heldout, f)
    return meta


def make_mir_dataset(root: str, n_classes: int, windows_per_class: int,
                     chunk_len: int = 15, fps: int = 30,
                     w: int = 456, h: int = 256,
                     heldout_per_class: int = 3) -> str:
    """EK100-MIR layout: chunked ``root/P00/P00_xxx.MP4/0.MP4`` seeded
    videos (one class each), ``train.csv``/``test.csv`` in the EPIC
    column layout, ``*_sentence.csv`` caption tables and graded
    relevancy pickles under ``relevancy/`` (the file set
    ``metadata.load_ek100_mir_extras`` consumes; reference:
    ``clip_dataset.py:240-270``).  Relevancy grades: 1.0 same class,
    0.25 same verb (above the 0.1 sampling threshold, so training also
    draws same-verb captions the way EPIC's soft relevancy does)."""
    import csv as _csv

    from avion_tpu.data.video_reader import write_test_video

    os.makedirs(osp.join(root, "P00"), exist_ok=True)
    os.makedirs(osp.join(root, "relevancy"), exist_ok=True)
    n_verbs = max(1, min(8, n_classes))
    captions = [caption_for(c) for c in range(n_classes)]
    rs = np.random.RandomState(0)
    for c in range(n_classes):
        d = osp.join(root, "P00", f"P00_{c:03d}.MP4")
        os.makedirs(d, exist_ok=True)
        path = osp.join(d, "0.MP4")
        if not osp.exists(path):
            write_test_video(path, chunk_len * fps, w=w, h=h, fps=fps,
                             gop=250, bframes=3, codec="libx264",
                             noise=True, seed=3000 + 7919 * c)

    header = ("uid,participant_id,video_id,narration_timestamp,"
              "start_timestamp,stop_timestamp,start_frame,stop_frame,"
              "narration,verb_id_raw,verb_class,noun_raw,noun_class"
              ).split(",")

    def write_split(name, per_class, fixed):
        rows = []
        for c in range(n_classes):
            for k in range(per_class):
                st = (0.5 + k * 3.0 if fixed
                      else float(rs.uniform(0.2, chunk_len - 2.2)))
                rows.append((c, f"P00_{c:03d}", st, st + 2.0))
        csv_path = osp.join(root, f"{name}.csv")
        with open(csv_path, "w", newline="") as f:
            wcsv = _csv.writer(f)
            wcsv.writerow(header)
            for i, (c, vid, st, en) in enumerate(rows):
                wcsv.writerow([i, "P00", vid, _sec2ts(st), _sec2ts(st),
                               _sec2ts(en), 0, 0, captions[c],
                               c % n_verbs, c % n_verbs, c, c])
        with open(osp.join(root, f"{name}_sentence.csv"), "w",
                  newline="") as f:
            wcsv = _csv.writer(f)
            wcsv.writerow(["id", "sentence"])
            for c, cap in enumerate(captions):
                wcsv.writerow([c, cap])
        rel = np.zeros((len(rows), n_classes), np.float32)
        for i, (c, *_rest) in enumerate(rows):
            rel[i, [j for j in range(n_classes)
                    if j % n_verbs == c % n_verbs]] = 0.25
            rel[i, c] = 1.0
        split = "train" if name == "train" else "test"
        with open(osp.join(root, "relevancy",
                           f"caption_relevancy_EPIC_100_retrieval_"
                           f"{split}.pkl"), "wb") as f:
            pickle.dump(rel, f)
        return csv_path

    write_split("test", heldout_per_class, fixed=True)
    return write_split("train", windows_per_class, fixed=False)


def make_nlq_dataset(root: str, n_concepts: int, samples_per_concept: int,
                     *, n_feat: int = 48, feat_hz: float = 8.0,
                     dv: int = 64, dq: int = 32,
                     val_per_concept: int = 4) -> str:
    """Synthetic-but-learnable NLQ grounding set: per-sample feature
    files (``feat_<i>.npz``: video [n_feat, dv], pooled text [dq]) plus
    official-layout annotation jsons.  Each query concept k has a fixed
    video-space pattern added over the GT span and a matching text
    embedding, so VSLNet can localize the span from the query — R@k/IoU
    must rise from init if the head trains (reference driver:
    ``egonlq/main.py:263-407``)."""
    rs = np.random.RandomState(0)
    pv = rs.randn(n_concepts, dv).astype(np.float32)
    pv /= np.linalg.norm(pv, axis=1, keepdims=True)
    pq = rs.randn(n_concepts, dq).astype(np.float32)
    pq /= np.linalg.norm(pq, axis=1, keepdims=True)
    duration = n_feat / feat_hz

    def split(name, per_concept):
        feats = osp.join(root, "features" if name == "train"
                         else "features_val")
        os.makedirs(feats, exist_ok=True)
        videos = []
        idx = 0
        for k in range(n_concepts):
            for _ in range(per_concept):
                span = rs.randint(n_feat // 8, n_feat // 4 + 1)
                s = int(rs.randint(0, n_feat - span))
                e = s + span - 1
                video = rs.randn(n_feat, dv).astype(np.float32) * 0.5
                video[s : e + 1] += pv[k]
                text = pq[k] + rs.randn(dq).astype(np.float32) * 0.1
                np.savez(osp.join(feats, f"feat_{idx}.npz"),
                         video=video, text=text.astype(np.float32))
                videos.append({
                    "video_uid": f"v_{name}_{idx}",
                    "clips": [{
                        "clip_uid": f"c{idx}",
                        "video_start_sec": 0.0,
                        "video_end_sec": duration,
                        "annotations": [{"language_queries": [{
                            "query": f"where is concept {k}",
                            "clip_start_sec": s / feat_hz,
                            "clip_end_sec": (e + 1) / feat_hz,
                        }]}],
                    }],
                })
                idx += 1
        path = osp.join(root, f"nlq_{name}.json")
        with open(path, "w") as f:
            json.dump({"videos": videos}, f)
        return path

    split("val", val_per_concept)
    return split("train", samples_per_concept)


_FAMILY_ENTRY = {
    "clip": "avion_tpu.train.pretrain_clip",
    "videomae": "avion_tpu.train.videomae_pretrain",
    "cls": "avion_tpu.train.finetune_cls",
    "mir": "avion_tpu.train.finetune_mir",
    "nlq": "avion_tpu.egonlq.train_nlq",
}

# VSLNet drill geometry (shared by the training subprocess and the
# restored-checkpoint eval)
_NLQ_DIMS = dict(dim=64, num_heads=4, max_pos_len=64,
                 video_feature_dim=64, query_feature_dim=32)


class TrainingStalled(RuntimeError):
    """The training child made no step progress for stall_timeout_s
    (e.g. a wedged device tunnel) and was killed; auto-resume makes a
    relaunch safe."""


def launch_training(root, meta, out_dir, *, model, batch, epochs, workers,
                    lr, log_path, preempt_after_steps=None,
                    timeout_s=3600, stall_timeout_s=900, extra=(),
                    family="clip", clip_length=None):
    """Run the real training entry as a subprocess; optionally SIGTERM
    it once log.jsonl shows >= preempt_after_steps train steps.

    If no new train step lands in ``log.jsonl`` for ``stall_timeout_s``
    (a wedged remote-device tunnel presents as an alive-but-idle
    child), the child is killed and ``TrainingStalled`` raised — the
    caller relaunches and orbax auto-resume continues from the last
    checkpoint, the same elasticity loop the reference runs via
    submitit requeue (``run_with_submit_lavila_pretrain.py:53-59``)."""
    if clip_length is None:
        clip_length = 4 if family == "clip" else 16
    if family == "clip":
        family_overrides = ("data.dataset=ego4d", "data.crop_size=224")
    elif family == "cls":
        # the real finetune recipe: device mixup/cutmix + smoothing
        # (main_lavila_finetune_cls.py:320-339); label map from the
        # generated actions.csv
        # vision_heads=6 = the H128 flagship head split (the classifier
        # builder reads cfg.model fields directly, not the registry)
        family_overrides = (
            f"data.label_map={osp.join(root, 'actions.csv')}",
            "data.crop_size=224", "mixup=0.8", "cutmix=1.0",
            "model.vision_heads=6")
    elif family == "mir":
        family_overrides = ("data.crop_size=224",)
    else:
        family_overrides = ()
    if family == "nlq":
        # flat key=value config (NLQConfig), features pre-extracted
        cmd = [
            sys.executable, "-m", _FAMILY_ENTRY["nlq"],
            f"annotations={meta}",
            f"feature_dir={osp.join(root, 'features')}",
            f"val_annotations={osp.join(root, 'nlq_val.json')}",
            f"val_feature_dir={osp.join(root, 'features_val')}",
            f"output_dir={out_dir}", f"epochs={epochs}", f"lr={lr}",
            f"batch_size={batch}", "print_freq=5",
            *(f"{k}={v}" for k, v in _NLQ_DIMS.items()), *extra,
        ]
    else:
        cmd = [
            sys.executable, "-m", _FAMILY_ENTRY[family],
            f"model.name={model}", *family_overrides,
            f"data.root={root}", f"data.train_metadata={meta}",
            f"data.batch_size={batch}", f"data.num_workers={workers}",
            f"data.clip_length={clip_length}",
            f"optim.epochs={epochs}", f"optim.lr={lr}",
            "optim.warmup_epochs=0.5", "eval_freq=0", "save_freq=1",
            "print_freq=10", f"output_dir={out_dir}", *extra,
        ]
    logf = open(log_path, "ab")
    proc = subprocess.Popen(cmd, stdout=logf, stderr=subprocess.STDOUT,
                            cwd=osp.dirname(osp.dirname(osp.dirname(
                                osp.abspath(__file__)))))
    jsonl = osp.join(out_dir, "log.jsonl")
    t0 = time.monotonic()
    sent = False
    last_step = _last_step(jsonl)
    # generous first window: startup includes dataset open + compile
    last_progress = time.monotonic()
    try:
        while proc.poll() is None:
            time.sleep(1)
            now = time.monotonic()

            def _kill(reason):
                # SIGTERM triggers the entry's checkpoint-then-exit
                # preemption handler; escalate to SIGKILL if it stalls
                # (a wedged tunnel can't run the save either)
                proc.terminate()
                try:
                    proc.wait(timeout=120)
                except subprocess.TimeoutExpired:
                    proc.kill()
                    proc.wait()
                raise (TrainingStalled if reason == "stalled"
                       else RuntimeError)(f"training subprocess {reason}")

            if now - t0 > timeout_s:
                _kill("timed out")
            step = _last_step(jsonl)
            if step > last_step:
                last_step = step
                last_progress = now
            elif stall_timeout_s and now - last_progress > stall_timeout_s:
                print(f"[e2e] no step progress in {stall_timeout_s:.0f}s "
                      f"(last step {last_step}) — killing stalled child",
                      file=sys.stderr)
                _kill("stalled")
            if preempt_after_steps and not sent:
                if step >= preempt_after_steps:
                    print(f"[e2e] sending SIGTERM at step {step} "
                          "(preemption drill)", file=sys.stderr)
                    proc.send_signal(signal.SIGTERM)
                    sent = True
    finally:
        logf.close()
    if preempt_after_steps and not sent:
        raise RuntimeError(
            "run finished before the preemption point — raise epochs "
            "or lower --preempt-step")
    return proc.returncode


def _last_step(jsonl):
    step = 0
    if osp.exists(jsonl):
        with open(jsonl) as f:
            for line in f:
                try:
                    row = json.loads(line)
                    step = max(step, int(row.get("step", 0)))
                except Exception:
                    pass
    return step


def read_log(out_dir, acc_key="train/clip_acc"):
    rows = []
    with open(osp.join(out_dir, "log.jsonl")) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except Exception:
                pass
    # normalize logger namespacing (train/loss, train/clip_acc, step)
    out = []
    for r in rows:
        if "train/loss" not in r:
            continue
        out.append({"step": r.get("step"), "loss": r["train/loss"],
                    "clip_acc": r.get(acc_key, float("nan")),
                    **{k: v for k, v in r.items()
                       if k.startswith("perf/")}})
    return out


def zero_shot_sweep(root, out_dir, *, model_name, batch, n_classes,
                    extra=()):
    """Restore the final checkpoint and run held-out retrieval: encode
    4 fresh windows per class, classify over the K class captions."""
    import jax
    import jax.numpy as jnp

    from avion_tpu.core.checkpoint import Checkpointer
    from avion_tpu.core.config import TrainConfig
    from avion_tpu.core.train_state import TrainState
    from avion_tpu.data.sampling import get_frame_ids
    from avion_tpu.data.tokenizer import tokenize
    from avion_tpu.data.transforms import center_crop_spec, normalize_video
    from avion_tpu.data.video_reader import VideoReader
    from avion_tpu.train.pretrain_clip import build_model_and_state

    # rebuild the model EXACTLY as the entry did: the run's saved
    # config (the reference embeds args in the checkpoint the same way,
    # main_lavila_finetune_cls.py:278)
    cfg_path = osp.join(out_dir, "config.json")
    if osp.exists(cfg_path):
        cfg = TrainConfig.from_dict(json.load(open(cfg_path)))
    else:
        cfg = TrainConfig()
        cfg.model.name = model_name
        for ov in extra:
            if ov.split("=")[0].startswith(("model.", "data.")):
                cfg.apply_overrides([ov])
    crop_size = cfg.data.crop_size
    clip_length = cfg.data.clip_length
    model, params, tx = build_model_and_state(cfg, niter_per_ep=10)
    template = TrainState.create(params, tx)
    ckpt = Checkpointer(osp.join(out_dir, "ckpt"))
    state, _ = ckpt.restore(template)
    assert state is not None, "no checkpoint found"
    step = int(state.step)
    params = jax.device_get(state.params)
    ckpt.close()

    heldout = json.load(open(osp.join(root, "heldout.json")))
    captions = [caption_for(c) for c in range(n_classes)]
    toks = np.stack([tokenize(c) for c in captions]).astype(np.int32)

    @jax.jit
    def encode_text(params, text):
        return model.apply({"params": params}, text,
                           method=model.encode_text)

    @jax.jit
    def encode_video(params, video):
        v = normalize_video(video, dtype=model.dtype)
        return model.apply({"params": params}, v,
                           method=model.encode_image)

    tvecs = np.asarray(encode_text(params, toks), np.float32)

    clips, labels = [], []
    for vid, st, en, c in heldout:
        vr = VideoReader(osp.join(root, f"{vid}.mp4", "0.mp4"))
        fps = vr.get_avg_fps() or 30.0
        ids = get_frame_ids(int(st * fps), min(int(en * fps), len(vr)),
                            num_segments=clip_length, jitter=False)
        crop = center_crop_spec(vr.width, vr.height)
        clips.append(vr.get_batch(ids, crop, (crop_size, crop_size)))
        labels.append(c)
    clips = np.stack(clips)
    labels = np.asarray(labels)
    vecs = []
    for i in range(0, len(clips), batch):
        chunk = clips[i : i + batch]
        pad = batch - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        v = np.asarray(encode_video(params, chunk), np.float32)
        vecs.append(v[: len(v) - pad] if pad else v)
    sims = np.concatenate(vecs) @ tvecs.T
    order = np.argsort(-sims, axis=1)
    top1 = float((order[:, 0] == labels).mean())
    top5 = float((order[:, :5] == labels[:, None]).any(1).mean())
    return {"ckpt_step": step, "heldout_clips": len(labels),
            "zeroshot_top1": round(top1, 4), "zeroshot_top5": round(top5, 4)}


def mae_eval(root, out_dir, *, batch, n_videos, windows_per_video=2):
    """Restore the final VideoMAE checkpoint and measure held-out
    masked-reconstruction MSE (fixed windows + fixed tube masks),
    against the SAME measurement on a fresh init — the learning signal
    analogous to the CLIP family's zero-shot sweep."""
    import jax
    import jax.numpy as jnp

    from avion_tpu.core.checkpoint import Checkpointer
    from avion_tpu.core.config import TrainConfig
    from avion_tpu.core.train_state import TrainState
    from avion_tpu.data.sampling import strided_frame_ids
    from avion_tpu.data.transforms import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        center_crop_spec,
        tube_mask,
    )
    from avion_tpu.data.video_reader import VideoReader
    from avion_tpu.losses.losses import videomae_loss
    from avion_tpu.models import create_model
    from avion_tpu.optim import build_optimizer
    from avion_tpu.train.steps import prep_video

    cfg = TrainConfig.from_dict(
        json.load(open(osp.join(out_dir, "config.json"))))
    d = cfg.data
    name = (cfg.model.name if "VIDEOMAE" in cfg.model.name
            else "VIDEOMAE_VITB16")
    model = create_model(
        name, num_frames=d.clip_length,
        use_flash_attn=cfg.model.use_flash_attn,
        use_grad_checkpointing=cfg.model.use_grad_checkpointing,
        decoder_depth=cfg.model.decoder_layers, mask_ratio=d.mask_ratio)
    crop_size = model.image_size
    rng = jax.random.PRNGKey(0)
    video0 = jnp.zeros((2, d.clip_length, crop_size, crop_size, 3),
                       jnp.bfloat16)
    n = model.num_patches
    mask0 = np.zeros((2, n), bool)
    mask0[:, model.n_visible:] = True
    init_params = jax.jit(model.init)(rng, video0,
                                      jnp.asarray(mask0))["params"]
    # mirror the entry's optimizer construction so the restore
    # template's opt_state tree matches (incl. layer-decay configs)
    tx, _ = build_optimizer(cfg.optim, init_params, 10,
                            num_layers=model.encoder_layers)
    template = TrainState.create(init_params, tx)
    ckpt = Checkpointer(osp.join(out_dir, "ckpt"))
    state, _ = ckpt.restore(template)
    assert state is not None, "no checkpoint found"
    step = int(state.step)
    trained = jax.device_get(state.params)
    ckpt.close()

    # held-out clips: deterministic strided windows + seeded tube masks
    clips, masks = [], []
    g = crop_size // model.patch_size
    for v in range(n_videos):
        vr = VideoReader(osp.join(root, f"mae{v:03d}.mp4"))
        crop = center_crop_spec(vr.width, vr.height)
        for k in range(windows_per_video):
            rs = np.random.RandomState(31 * v + k)
            ids = strided_frame_ids(len(vr), d.clip_length, d.clip_stride,
                                    random_shift=True, rng=rs)
            clips.append(vr.get_batch(ids, crop, (crop_size, crop_size)))
            masks.append(tube_mask(rs, d.clip_length // model.tubelet_size,
                                   g, g, d.mask_ratio))
        vr.close()
    clips = np.stack(clips)
    masks = np.stack(masks)

    @jax.jit
    def eval_loss(params, video, mask):
        v = prep_video(video, IMAGENET_MEAN, IMAGENET_STD)
        pred, masked_idx = model.apply({"params": params}, v, mask, True)
        return videomae_loss(pred, v, masked_idx, model.patch_size,
                             model.tubelet_size, True)["loss"]

    def sweep(params):
        tot, cnt = 0.0, 0
        for i in range(0, len(clips), batch):
            cv, cm = clips[i: i + batch], masks[i: i + batch]
            # no padding: a partial tail evaluates at its own shape (at
            # most one extra compile) so duplicate rows never bias the
            # held-out mean
            tot += float(eval_loss(params, cv, cm)) * len(cv)
            cnt += len(cv)
        return tot / cnt

    mse_final = sweep(trained)
    mse_init = sweep(jax.device_get(init_params))
    return {"ckpt_step": step, "heldout_clips": len(clips),
            "mse_init": round(mse_init, 4),
            "mse_final": round(mse_final, 4),
            "mse_ratio": round(mse_final / max(mse_init, 1e-9), 4)}


def cls_eval(root, out_dir, *, batch, n_classes):
    """Restore the final classifier checkpoint and measure held-out
    top-1/top-5 plus verb/noun marginalized top-1 (the EK100-CLS eval
    semantics, ``main_lavila_finetune_cls.py:810-955``) on fixed
    center-crop windows."""
    import jax
    import jax.numpy as jnp

    from avion_tpu.core.checkpoint import Checkpointer
    from avion_tpu.core.config import TrainConfig
    from avion_tpu.core.train_state import TrainState
    from avion_tpu.data.sampling import get_frame_ids
    from avion_tpu.data.transforms import center_crop_spec, normalize_video
    from avion_tpu.data.video_reader import VideoReader
    from avion_tpu.eval.classification_metrics import (
        get_marginal_indexes,
        marginalize,
    )
    from avion_tpu.optim import build_optimizer
    from avion_tpu.optim.factory import apply_batch_lr_scale
    from avion_tpu.train.finetune_cls import build_classifier, load_actions

    cfg = TrainConfig.from_dict(
        json.load(open(osp.join(out_dir, "config.json"))))
    labels, pairs, _ = load_actions(osp.join(root, "actions.csv"))
    model = build_classifier(cfg, len(labels))
    d = cfg.data
    rng = jax.random.PRNGKey(0)
    video0 = jnp.zeros((2, d.clip_length, cfg.model.image_size,
                        cfg.model.image_size, 3), jnp.bfloat16)
    init_params = jax.jit(model.init)(rng, video0)["params"]
    # mirror the entry's optimizer construction (incl. the batch LR
    # scale it applies before build_optimizer) so the restore template
    # matches
    apply_batch_lr_scale(cfg.optim, d.batch_size, default_base=128)
    tx, _ = build_optimizer(cfg.optim, init_params, 10,
                            num_layers=cfg.model.vision_layers)
    template = TrainState.create(init_params, tx)
    ckpt = Checkpointer(osp.join(out_dir, "ckpt"))
    state, _ = ckpt.restore(template)
    assert state is not None, "no checkpoint found"
    step = int(state.step)
    params = jax.device_get(state.params)
    ckpt.close()

    heldout = json.load(open(osp.join(root, "heldout.json")))
    clips, ys = [], []
    for vid, st, en, c in heldout:
        vr = VideoReader(osp.join(root, vid + ".MP4", "0.MP4"))
        fps = vr.get_avg_fps() or 30.0
        ids = get_frame_ids(int(st * fps), min(int(en * fps), len(vr)),
                            num_segments=d.clip_length, jitter=False)
        crop = center_crop_spec(vr.width, vr.height)
        clips.append(vr.get_batch(ids, crop, (cfg.model.image_size,) * 2))
        ys.append(c)
        vr.close()
    clips = np.stack(clips)
    ys = np.asarray(ys)

    @jax.jit
    def logits_fn(params, video):
        v = normalize_video(video, dtype=jnp.bfloat16)
        return model.apply({"params": params}, v, True)

    outs = []
    for i in range(0, len(clips), batch):
        chunk = clips[i: i + batch]
        outs.append(np.asarray(logits_fn(params, chunk), np.float32))
    logits = np.concatenate(outs)
    order = np.argsort(-logits, axis=1)
    top1 = float((order[:, 0] == ys).mean())
    # with --classes <= 5, top-5 would be trivially 1.0 — clamp k and
    # report it so the metric stays meaningful
    topk_k = min(5, n_classes)
    topk = float((order[:, :topk_k] == ys[:, None]).any(1).mean())
    # verb/noun marginalized accuracy over the action softmax
    probs = np.exp(logits - logits.max(1, keepdims=True))
    probs /= probs.sum(1, keepdims=True)
    vi = get_marginal_indexes(pairs, "verb")
    ni = get_marginal_indexes(pairs, "noun")
    vprob, nprob = marginalize(probs, vi), marginalize(probs, ni)
    vy = np.asarray([pairs[c][0] for c in ys])
    ny = np.asarray([pairs[c][1] for c in ys])
    verb_top1 = float((vprob.argmax(1) == vy).mean())
    noun_top1 = float((nprob.argmax(1) == ny).mean())
    return {"ckpt_step": step, "heldout_clips": len(ys),
            "top1": round(top1, 4), "topk": round(topk, 4),
            "topk_k": topk_k,
            "verb_top1": round(verb_top1, 4),
            "noun_top1": round(noun_top1, 4),
            "chance": round(1.0 / len(labels), 4)}


def mir_eval(root, out_dir, *, batch):
    """EK100-MIR retrieval metrics (mAP/nDCG, ``eval/runners.py
    validate_mir``) on the held-out split from BOTH a fresh init and
    the RESTORED checkpoint — convergence evidence is the
    trained-vs-init delta (reference eval:
    ``evaluation_ek100mir.py:214-332``)."""
    import jax
    import jax.numpy as jnp

    from avion_tpu.core.checkpoint import Checkpointer
    from avion_tpu.core.config import TrainConfig
    from avion_tpu.core.train_state import TrainState
    from avion_tpu.data.datasets import AugmentSpec, VideoCaptionDataset
    from avion_tpu.data.loader import DataLoader
    from avion_tpu.eval.runners import CLIPEncoders
    from avion_tpu.models import create_model
    from avion_tpu.optim import build_optimizer

    cfg = TrainConfig.from_dict(
        json.load(open(osp.join(out_dir, "config.json"))))
    d = cfg.data
    # mirror the entry's model + optimizer construction so the restore
    # template matches (train/finetune_mir.py)
    model = create_model(
        cfg.model.name, num_frames=d.clip_length,
        project_embed_dim=cfg.model.project_embed_dim,
        use_quick_gelu=cfg.model.use_quick_gelu,
        use_flash_attn=cfg.model.use_flash_attn,
        use_grad_checkpointing=cfg.model.use_grad_checkpointing,
        input_norm=cfg.model.input_norm)
    rng = jax.random.PRNGKey(cfg.seed)
    video0 = jnp.zeros((2, d.clip_length, model.image_size,
                        model.image_size, 3), jnp.bfloat16)
    text0 = jnp.zeros((2, model.context_length), jnp.int32)
    init_params = jax.jit(model.init)(rng, video0, text0)["params"]
    tx, _ = build_optimizer(cfg.optim, init_params, 10,
                            num_layers=cfg.model.vision_layers)
    template = TrainState.create(init_params, tx)
    ckpt = Checkpointer(osp.join(out_dir, "ckpt"))
    state, _ = ckpt.restore(template)
    assert state is not None, "no checkpoint found"
    step = int(state.step)
    trained_params = jax.device_get(state.params)
    ckpt.close()

    val_ds = VideoCaptionDataset(
        "ek100_mir", root, osp.join(root, "test.csv"), is_training=False,
        clip_length=d.clip_length, chunk_len=15,
        augment=AugmentSpec(crop_size=d.crop_size, mode="center"))
    rel = pickle.load(open(osp.join(
        root, "relevancy",
        "caption_relevancy_EPIC_100_retrieval_test.pkl"), "rb"))

    def sweep(params):
        loader = DataLoader(val_ds, batch, shuffle=False, drop_last=False,
                            num_workers=0)
        # each held-out row's text is its own class caption: the
        # [n_videos, n_classes] relevancy needs sim columns in CLASS
        # order, which is per-row caption order deduplicated — use the
        # class-caption encodings directly via the id orders.
        # .cached swaps params into the already-jitted towers, so the
        # init and trained sweeps share one compile
        enc = CLIPEncoders.cached(model, params, batch=batch)
        res = enc.sweep_loader(loader)
        img, txt = res["image_embed"], res["text_embed"]
        # one text per class, in class order: rows are grouped by class
        # (test.csv write order), heldout_per_class each
        n_videos = rel.shape[0]
        per = n_videos // rel.shape[1]
        tcls = txt[::per][: rel.shape[1]]
        sim = (img[:n_videos] @ tcls.T + 1) / 2
        from avion_tpu.eval.retrieval_metrics import get_map, get_ndcg

        vmap, tmap, amap = get_map(sim, rel)
        vndcg, tndcg, andcg = get_ndcg(sim, rel)
        return {"avg_map": round(float(amap), 4),
                "avg_ndcg": round(float(andcg), 4),
                "vis_map": round(float(vmap), 4),
                "txt_map": round(float(tmap), 4)}

    init_metrics = sweep(init_params)
    trained = sweep(trained_params)
    return {"ckpt_step": step, "heldout_clips": int(rel.shape[0]),
            "init": init_metrics, "trained": trained}


def _init_vs_trained_lines(zs):
    lines = ["", "## held-out eval: fresh init vs restored checkpoint",
             "", "| metric | init | trained |", "|---|---|---|"]
    for k in zs["trained"]:
        lines.append(f"| {k} | {zs['init'][k]} | {zs['trained'][k]} |")
    return lines


def write_report_mir(path, *, cfg, rows, resume_step, zs, wall_s):
    lines = [
        "# E2E MIR-finetune convergence run (real chip)",
        "",
        "Produced by `python -m avion_tpu.tools.e2e_convergence "
        "--family mir` — the real `train/finetune_mir.py` entry",
        "(max-margin ranking loss over relevancy-sampled captions) on",
        "an EK100-MIR-layout synthetic dataset (chunked seeded-x264",
        "videos, sentence tables, graded relevancy pickles), live",
        "worker decode, a mid-run SIGTERM preemption + auto-resume,",
        "and a final held-out retrieval sweep (mAP/nDCG) comparing the",
        "RESTORED checkpoint against a fresh init.",
        "",
        *_report_stats(cfg, rows, resume_step, wall_s,
                       loss_label="train loss"),
        f"- held-out sweep: {zs['heldout_clips']} clips, ckpt step "
        f"{zs['ckpt_step']}",
        *_init_vs_trained_lines(zs),
        *_report_curve(rows),
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def nlq_eval(root, out_dir, *, batch):
    """R@k/IoU on the held-out NLQ split from BOTH a fresh init and the
    RESTORED checkpoint — the drill's convergence evidence is the
    trained-vs-init delta (reference metrics:
    ``egonlq/utils/evaluate_ego4d_nlq.py``)."""
    import jax
    import optax

    from avion_tpu.core.checkpoint import Checkpointer
    from avion_tpu.egonlq.train_nlq import NLQConfig, _collate, evaluate
    from avion_tpu.egonlq.nlq_dataset import (
        NLQFeatureDataset,
        parse_nlq_annotations,
    )
    from avion_tpu.egonlq.vslnet import VSLNet

    cfg = NLQConfig(
        annotations=osp.join(root, "nlq_train.json"),
        val_annotations=osp.join(root, "nlq_val.json"),
        feature_dir=osp.join(root, "features"),
        val_feature_dir=osp.join(root, "features_val"),
        output_dir=out_dir, batch_size=batch, **_NLQ_DIMS)
    model = VSLNet(dim=cfg.dim, num_heads=cfg.num_heads,
                   max_pos_len=cfg.max_pos_len,
                   video_feature_dim=cfg.video_feature_dim,
                   query_feature_dim=cfg.query_feature_dim,
                   drop_rate=cfg.drop_rate, use_cq_attention=True)
    val = NLQFeatureDataset(parse_nlq_annotations(cfg.val_annotations),
                            cfg.val_feature_dir, cfg.max_pos_len)
    b0 = _collate([val[0]])
    init_params = model.init(jax.random.PRNGKey(cfg.seed), b0["video"],
                             b0["v_mask"], b0["query"],
                             b0["q_mask"])["params"]
    init_metrics = evaluate(cfg, model, init_params)

    # template must match the entry's saved tree (adamw over a schedule)
    tx = optax.adamw(optax.linear_schedule(cfg.lr, 0.0, 1),
                     weight_decay=0.01)
    ckpt = Checkpointer(osp.join(out_dir, "ckpt"))
    state, _ = ckpt.restore({"params": init_params,
                             "opt_state": tx.init(init_params)})
    assert state is not None, "no checkpoint found"
    step = ckpt.latest_step()
    trained = evaluate(cfg, model, state["params"])
    ckpt.close()
    return {"ckpt_step": int(step), "val_queries": len(val),
            "init": {k: round(v, 2) for k, v in init_metrics.items()},
            "trained": {k: round(v, 2) for k, v in trained.items()}}


def write_report_nlq(path, *, cfg, rows, resume_step, zs, wall_s):
    lines = [
        "# E2E NLQ-grounding convergence run (real chip)",
        "",
        "Produced by `python -m avion_tpu.tools.e2e_convergence "
        "--family nlq` — the real `egonlq/train_nlq.py` entry (VSLNet",
        "span localization) on synthetic-but-learnable grounding",
        "features, a mid-run SIGTERM preemption + orbax auto-resume,",
        "and a final held-out R@k/IoU sweep comparing the RESTORED",
        "checkpoint against a fresh init.",
        "",
        *_report_stats(cfg, rows, resume_step, wall_s,
                       loss_label="train loss", wall_note=""),
        f"- held-out sweep: {zs['val_queries']} queries, ckpt step "
        f"{zs['ckpt_step']}",
        *_init_vs_trained_lines(zs),
        *_report_curve(rows),
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def write_report_cls(path, *, cfg, rows, resume_step, zs, wall_s):
    lines = [
        "# E2E classification-finetune convergence run (real chip)",
        "",
        "Produced by `python -m avion_tpu.tools.e2e_convergence "
        "--family cls` — the real `train/finetune_cls.py` entry on an",
        "EK100-layout synthetic dataset (chunked seeded-x264 videos,",
        "actions.csv verb/noun label map), live worker decode, device",
        "mixup/cutmix + label smoothing, a mid-run SIGTERM preemption +",
        "auto-resume, and a final held-out sweep from the restored",
        "classifier with verb/noun marginalization.",
        "",
        *_report_stats(cfg, rows, resume_step, wall_s,
                       loss_label="train loss",
                       acc_line=("train acc1 (mixup-soft targets)",
                                 "clip_acc")),
        f"- held-out eval (chance {zs['chance']}): top-1 {zs['top1']}, "
        f"top-{zs.get('topk_k', 5)} {zs.get('topk', zs.get('top5'))}, "
        f"verb top-1 {zs['verb_top1']}, noun top-1 "
        f"{zs['noun_top1']} over {zs['heldout_clips']} clips "
        f"(ckpt step {zs['ckpt_step']})",
        *_report_curve(rows, acc_col="acc1"),
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def _report_stats(cfg, rows, resume_step, wall_s, *, loss_label,
                  acc_line=None, wall_note=" (1-core CI host; "
                  "decode-bound)"):
    """The stats block every family report shares: config, wall time,
    step count, first/last-10% loss means, optional accuracy line and
    the duty-window summary."""
    first = rows[: max(1, len(rows) // 10)]
    last = rows[-max(1, len(rows) // 10):]
    mean = lambda rs, k: float(np.mean([r[k] for r in rs if k in r]))
    duty = [r.get("perf/duty_cycle_win", r.get("perf/duty_cycle"))
            for r in rows
            if "perf/duty_cycle_win" in r or "perf/duty_cycle" in r]
    lines = [
        f"- config: `{json.dumps(cfg)}`",
        f"- total wall time: {wall_s:.0f}s{wall_note}",
        f"- steps logged: {len(rows)} (resume at step {resume_step})",
        f"- {loss_label}: first-10% mean {mean(first, 'loss'):.4f} -> "
        f"last-10% mean {mean(last, 'loss'):.4f}",
    ]
    if acc_line is not None:
        label, key = acc_line
        lines.append(f"- {label}: {mean(first, key):.2f} -> "
                     f"{mean(last, key):.2f}")
    lines.append(
        f"- measured duty cycle (window median {np.median(duty):.3f}, "
        f"min {min(duty):.3f}, max {max(duty):.3f} over {len(duty)} "
        f"print windows)" if duty else "- duty cycle: n/a")
    return lines


def _report_curve(rows, *, loss_col="loss", acc_col=None):
    """The sampled loss-curve table every family report ends with."""
    curve = rows[:: max(1, len(rows) // 16)]
    head = f"| step | {loss_col} |" if acc_col is None \
        else f"| step | {loss_col} | {acc_col} |"
    lines = ["", "## loss curve (sampled)", "", head,
             "|---|---|" if acc_col is None else "|---|---|---|"]
    for r in curve:
        if acc_col is None:
            lines.append(f"| {r.get('step', '?')} | {r['loss']:.4f} |")
        else:
            lines.append(f"| {r.get('step', '?')} | {r['loss']:.4f} | "
                         f"{r.get('clip_acc', float('nan')):.2f} |")
    lines.append("")
    return lines


def write_report_mae(path, *, cfg, rows, resume_step, zs, wall_s):
    lines = [
        "# E2E VideoMAE convergence run (real chip, live loader)",
        "",
        "Produced by `python -m avion_tpu.tools.e2e_convergence "
        "--family videomae` — the real `train/videomae_pretrain.py`",
        "entry on synthetic seeded-x264 videos (Kinetics list format),",
        "decoded live by worker processes, with a mid-run SIGTERM",
        "preemption + auto-resume, and a final held-out",
        "masked-reconstruction sweep from the restored checkpoint.",
        "",
        *_report_stats(cfg, rows, resume_step, wall_s,
                       loss_label="train MSE"),
        f"- held-out masked-reconstruction MSE: fresh init "
        f"{zs['mse_init']} -> trained {zs['mse_final']} "
        f"({zs['mse_ratio']:.2f}x, {zs['heldout_clips']} clips, "
        f"ckpt step {zs['ckpt_step']})",
        *_report_curve(rows, loss_col="mse"),
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def write_report(path, *, cfg, rows, resume_step, zs, wall_s):
    lines = [
        "# E2E convergence run (real chip, live loader)",
        "",
        "Produced by `python -m avion_tpu.tools.e2e_convergence` — the",
        "real `train/pretrain_clip.py` entry on synthetic seeded-x264",
        "chunked video, decoded live by worker processes, with a",
        "mid-run SIGTERM preemption + auto-resume, and a final",
        "held-out zero-shot sweep from the restored checkpoint.",
        "",
        *_report_stats(cfg, rows, resume_step, wall_s, loss_label="loss",
                       acc_line=("clip_acc", "clip_acc")),
        f"- zero-shot held-out retrieval: top-1 {zs['zeroshot_top1']}, "
        f"top-5 {zs['zeroshot_top5']} over {zs['heldout_clips']} clips "
        f"(ckpt step {zs['ckpt_step']})",
        *_report_curve(rows, acc_col="clip_acc"),
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))


# per-family defaults for flags left unset (None)
_FAMILY_DEFAULTS = {
    # windows = caption windows per class (clip) / list repeats (mae)
    "clip": dict(model="CLIP_VITB16_H128", classes=32, windows=64,
                 batch=32, epochs=6, lr=1e-4, preempt_step=150,
                 report="docs/E2E.md"),
    # mae base lr is scaled by batch/256 inside the entry:
    # 1.6e-2 * 16/256 = 1e-3 effective
    "videomae": dict(model="VIDEOMAE_VITB16_H128", classes=16, windows=64,
                     batch=16, epochs=3, lr=1.6e-2, preempt_step=80,
                     report="docs/E2E_VIDEOMAE.md"),
    # cls lr is scaled by batch/128 inside the entry: 2e-3 * 16/128 =
    # 2.5e-4 effective; 16-frame clips make the drill decode-bound so
    # the step count stays modest
    "cls": dict(model="CLIP_VITB16_H128", classes=16, windows=32,
                batch=16, epochs=6, lr=2e-3, preempt_step=60,
                report="docs/E2E_CLS.md"),
    # mir lr mirrors the reference finetune scale (1e-5 base x larger
    # synthetic signal); 16-frame clips keep it decode-bound like cls
    "mir": dict(model="CLIP_VITB16_H128", classes=12, windows=32,
                batch=16, epochs=6, lr=1e-4, preempt_step=60,
                report="docs/E2E_MIR.md"),
    # nlq trains on pre-extracted features: classes = query concepts,
    # windows = train samples per concept (12 steps/epoch at batch 16)
    "nlq": dict(model="VSLNET", classes=8, windows=24,
                batch=16, epochs=20, lr=1e-3, preempt_step=80,
                report="docs/E2E_NLQ.md"),
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--family",
                   choices=("clip", "videomae", "cls", "mir", "nlq"),
                   default="clip")
    p.add_argument("--classes", type=int, default=None,
                   help="distinct seeded videos (clip: classes w/ "
                        "captions; videomae: videos)")
    p.add_argument("--windows", type=int, default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--model", default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--workers", type=int,
                   default=max(1, (os.cpu_count() or 1) - 1))
    p.add_argument("--preempt-step", type=int, default=None,
                   help="send SIGTERM once this step is logged; "
                        "0 disables the preemption drill")
    p.add_argument("--out", default=None)
    p.add_argument("--report", default=None)
    p.add_argument("--extra", nargs="*", default=[],
                   help="extra section.key=value overrides for the entry")
    args = p.parse_args(argv)
    for k, v in _FAMILY_DEFAULTS[args.family].items():
        if getattr(args, k) is None:
            setattr(args, k, v)
    if args.out is None:
        args.out = {"clip": "/tmp/avion_e2e",
                    "videomae": "/tmp/avion_e2e_mae",
                    "cls": "/tmp/avion_e2e_cls",
                    "mir": "/tmp/avion_e2e_mir",
                    "nlq": "/tmp/avion_e2e_nlq"}[args.family]

    t0 = time.monotonic()
    root = osp.join(args.out, "data")
    run_dir = osp.join(args.out, "run")
    os.makedirs(run_dir, exist_ok=True)
    ts = time.monotonic()
    if args.family == "clip":
        meta = make_class_dataset(root, args.classes, args.windows)
    elif args.family == "cls":
        meta = make_cls_dataset(root, args.classes, args.windows)
    elif args.family == "mir":
        meta = make_mir_dataset(root, args.classes, args.windows)
    elif args.family == "nlq":
        meta = make_nlq_dataset(root, args.classes, args.windows)
    else:
        meta = make_mae_dataset(root, args.classes, args.windows)
    print(f"[e2e] dataset ready in {time.monotonic() - ts:.0f}s",
          file=sys.stderr)

    log_path = osp.join(args.out, "train_stdout.log")
    common = dict(model=args.model, batch=args.batch, epochs=args.epochs,
                  workers=args.workers, lr=args.lr, log_path=log_path,
                  extra=tuple(args.extra), family=args.family)
    def launch_with_relaunch(phase, **kw):
        # a stalled child (wedged tunnel) is killed and relaunched;
        # orbax auto-resume continues from the last checkpoint
        for attempt in range(3):
            try:
                return launch_training(root, meta, run_dir, **common, **kw)
            except TrainingStalled as e:
                print(f"[e2e] {phase} attempt {attempt + 1} stalled "
                      f"({e}); relaunching", file=sys.stderr)
        raise RuntimeError(f"{phase} stalled on every attempt")

    resume_step = 0
    if args.preempt_step:
        # phase A: train until the preemption drill fires
        rc = launch_with_relaunch(
            "phase A", preempt_after_steps=args.preempt_step)
        print(f"[e2e] phase A (preempted) rc={rc}", file=sys.stderr)
        resume_step = _last_step(osp.join(run_dir, "log.jsonl"))
    # phase B: same command line — auto-resume to completion
    rc = launch_with_relaunch("phase B")
    if rc != 0:
        raise RuntimeError(f"phase B failed rc={rc}; see {log_path}")
    print(f"[e2e] phase B (resumed from ~step {resume_step}) rc={rc}",
          file=sys.stderr)

    rows = read_log(run_dir, acc_key=("train/acc1" if args.family == "cls"
                                      else "train/clip_acc"))
    if args.family == "clip":
        zs = zero_shot_sweep(root, run_dir, model_name=args.model,
                             batch=args.batch, n_classes=args.classes,
                             extra=tuple(args.extra))
    elif args.family == "cls":
        zs = cls_eval(root, run_dir, batch=args.batch,
                      n_classes=args.classes)
    elif args.family == "mir":
        zs = mir_eval(root, run_dir, batch=args.batch)
    elif args.family == "nlq":
        zs = nlq_eval(root, run_dir, batch=args.batch)
    else:
        zs = mae_eval(root, run_dir, batch=args.batch,
                      n_videos=args.classes)
    cfg = {"family": args.family, "model": args.model,
           "classes": args.classes, "windows_per_class": args.windows,
           "batch": args.batch, "epochs": args.epochs, "lr": args.lr,
           "workers": args.workers, "preempt_step": args.preempt_step}
    if args.extra:  # entry overrides are part of the recorded recipe
        cfg["extra"] = list(args.extra)
    report = {"clip": write_report, "videomae": write_report_mae,
              "cls": write_report_cls, "mir": write_report_mir,
              "nlq": write_report_nlq}[args.family]
    report(args.report, cfg=cfg, rows=rows, resume_step=resume_step,
           zs=zs, wall_s=time.monotonic() - t0)
    summary = {"metric": f"e2e_convergence_{args.family}", **cfg,
               "steps_logged": len(rows), "resume_step": resume_step,
               "final_loss": rows[-1]["loss"] if rows else None, **zs}
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
