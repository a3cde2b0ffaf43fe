"""End-to-end input-pipeline + train-step benchmark (duty cycle).

Measures the WHOLE training path together — native fused decode in
worker processes -> DataLoader -> device_prefetch -> jitted CLIP train
step — and reports the TPU duty cycle (model_time / batch_time), the
starvation detector the reference reads off its data_time/batch_time
meters (``scripts/main_lavila_pretrain.py:767-797``).  The BASELINE
target is >95% duty cycle on a TPU-VM host.

``live_segment`` is the measurement core (no stdout printing — bench.py
embeds its fields in the driver JSON line); this CLI adds the
per-core decode probe projection for arbitrary host core counts
(``--host-cores``; Cloud TPU v5e-8 VMs have 112+ vCPUs, the
reference's hosts had 96 threads, ``docs/INSTALL.md:11``) so a
single-core CI container still produces the analysis.

Usage::

    python -m avion_tpu.tools.bench_pipeline [--model CLIP_VITB16]
        [--batch 64] [--steps 10] [--videos 8] [--workers N]
        [--host-cores 112]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import pickle
import sys
import tempfile
import time

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr)


def make_chunked_dataset(root: str, n_videos: int = 8, chunk_len: int = 15,
                         fps: int = 30, w: int = 456, h: int = 256,
                         n_chunks: int = 2):
    """Synthetic ego4d-style chunked videos + metadata pkl.

    Chunks are x264-default H.264 (textured content, forced B-frame
    cadence — the realistic production re-encode the reference's
    dataset prep produces; see docs/DATASETS.md) when libx264 is
    available, else cv2 mp4v."""
    from avion_tpu.data.video_reader import native_available, write_test_video

    rs = np.random.RandomState(0)
    samples = []
    for v in range(n_videos):
        vid = f"vid{v}"
        d = osp.join(root, f"{vid}.mp4")
        os.makedirs(d, exist_ok=True)
        for c in range(n_chunks):
            path = osp.join(d, f"{c * chunk_len}.mp4")
            if osp.exists(path):
                continue
            try:
                if not native_available():
                    raise RuntimeError("no native encoder")
                write_test_video(path, chunk_len * fps, w=w, h=h, fps=fps,
                                 gop=250, bframes=3, codec="libx264",
                                 noise=True)
            except Exception:
                import cv2

                base = cv2.GaussianBlur(
                    rs.randint(0, 255, (h, w, 3), np.uint8), (21, 21), 0)
                vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                                     fps, (w, h))
                for i in range(chunk_len * fps):
                    vw.write(np.roll(base, (c * 450 + i) * 2, axis=1))
                vw.release()
        # several samples per video, different windows
        for st in np.linspace(0.5, n_chunks * chunk_len - 3.0, 8):
            samples.append((vid, float(st), float(st + 2.0),
                            f"moves object {v}"))
    meta = osp.join(root, "meta.pkl")
    with open(meta, "wb") as f:
        pickle.dump(samples, f)
    return meta


def make_default_dataset(root=None, videos: int = 8, clip_length: int = 4,
                         crop_size: int = 224):
    """Chunked synthetic dataset + fused-decode VideoCaptionDataset."""
    from avion_tpu.data.datasets import AugmentSpec, VideoCaptionDataset

    root = root or osp.join(tempfile.gettempdir(), "avion_bench_pipe")
    os.makedirs(root, exist_ok=True)
    t0 = time.perf_counter()
    meta = make_chunked_dataset(root, n_videos=videos)
    _log(f"[setup] dataset ready in {time.perf_counter() - t0:.1f}s")
    return VideoCaptionDataset(
        "ego4d", root, meta, is_training=True,
        clip_length=clip_length, chunk_len=15, fps=30, threads=1,
        augment=AugmentSpec(crop_size=crop_size, mode="rrc"),
    )


def live_segment(model_name: str = "CLIP_VITB16", batch: int = 64,
                 steps: int = 10, workers: int | None = None,
                 clip_length: int = 4, crop_size: int = 224,
                 ds=None, root=None, videos: int = 8,
                 replay: bool = False, probe_decode: bool = True,
                 echo: int = 1, echo_also: int = 0) -> dict:
    """One live decode-while-stepping run: worker processes decode H.264
    concurrently with the jitted train step; duty cycle is measured, not
    projected.  Returns a dict of measured fields; prints only to
    stderr (bench.py merges the fields into the driver JSON line).

    Matches the reference's operational meter
    (scripts/main_lavila_pretrain.py:767-797 data_time/batch_time).
    """
    import jax
    import jax.numpy as jnp

    from avion_tpu.core.config import OptimConfig
    from avion_tpu.core.meters import StepTimer
    from avion_tpu.core.train_state import TrainState
    from avion_tpu.data.loader import DataLoader, device_prefetch
    from avion_tpu.models import create_model
    from avion_tpu.optim import build_optimizer
    from avion_tpu.parallel import make_mesh
    from avion_tpu.train.steps import make_clip_train_step

    if workers is None:
        workers = max(1, (os.cpu_count() or 1) - 1)
    if ds is None:
        ds = make_default_dataset(root, videos, clip_length, crop_size)

    decode_cps_core = None
    if probe_decode:
        # raw single-core decode rate (the host-side bound): warm the
        # reader cache first — the first few items pay chunk opens +
        # keyframe seeks that amortize away in a real epoch, and a
        # cold-start probe under-reports steady state by ~40%
        for i in range(4):
            ds[i % len(ds)]
        t0 = time.perf_counter()
        n_probe = 16
        for i in range(n_probe):
            ds[i % len(ds)]
        dt_probe = (time.perf_counter() - t0) / n_probe
        decode_cps_core = 1.0 / dt_probe
        _log(f"[probe] fused decode: {decode_cps_core:.1f} clips/s/core "
             f"({decode_cps_core * clip_length:.0f} frames/s/core)")

    mesh = make_mesh()
    model = create_model(model_name, num_frames=clip_length,
                         use_grad_checkpointing=True, use_flash_attn=True)
    rng = jax.random.PRNGKey(0)
    video0 = jnp.zeros((2, clip_length, crop_size, crop_size, 3),
                       jnp.bfloat16)
    text0 = jnp.zeros((2, 77), jnp.int32)
    params = jax.jit(model.init)(rng, video0, text0)["params"]
    cfg = OptimConfig(optimizer="adamw", lr=4e-5, warmup_epochs=0, epochs=1,
                      grad_clip_norm=1.0)
    tx, _ = build_optimizer(cfg, params, niter_per_ep=100)
    state = TrainState.create(params, tx)
    step = jax.jit(make_clip_train_step(model, tx, crop_size=crop_size),
                   donate_argnums=(0,))

    from avion_tpu.data.loader import echo_batches

    def timed_loop(it, n_steps, state, mark_every=5):
        """The one fetch -> step -> window loop shared by the live,
        replay and echoed segments: per-step data waits, a single host
        sync per window (mark_window attribution), wall clock.
        Returns (state, stats, wall_s, last_loss)."""
        timer = StepTimer()
        n = 0
        marked = 0
        loss = float("nan")
        t0 = time.perf_counter()
        while n < n_steps:
            t_fetch = time.perf_counter()
            batch_data = next(it)
            timer.data_time.update(time.perf_counter() - t_fetch)
            state, m = step(state, batch_data, rng)
            n += 1
            if n % mark_every == 0 or n == n_steps:
                loss = float(m["loss"])  # forces the chain
                timer.mark_window(n - marked)
                marked = n
        wall = time.perf_counter() - t0
        return state, timer.stats(), wall, loss

    loader = DataLoader(ds, batch, shuffle=True, drop_last=True,
                        num_workers=workers, prefetch_depth=4,
                        infinite=True)
    # close on every exit path: live_segment is embedded in bench.py
    # (not a standalone CLI), so a raise here must not leak decode
    # worker processes into the benches that follow
    try:
        it = device_prefetch(iter(loader), mesh, depth=2)
        if echo > 1:
            # data echoing: repeats reuse the on-device batch, so a
            # decode-bound host steps echo x per decoded batch
            it = echo_batches(it, echo)

        # warmup: compile + fill prefetch queues
        with jax.set_mesh(mesh):
            for _ in range(2):
                state, m = step(state, next(it), rng)
            float(m["loss"])
            state, stats, wall, loss = timed_loop(it, steps, state)
    finally:
        loader.close()

    result = {
        "e2e_clips_per_sec": round(batch * steps / wall, 2),
        "duty_cycle": round(stats.get("duty_cycle", 0.0), 4),
        "data_stall_ms": round(stats.get("data_time", 0.0) * 1e3, 1),
        "step_time_s": round(stats.get("step_time", 0.0), 4),
        "live_batch": batch,
        "live_steps": steps,
        "host_cores": os.cpu_count(),
        "loss": round(loss, 4),
    }
    if echo > 1:
        result["echo_factor"] = echo
    if decode_cps_core is not None:
        result["decode_clips_per_sec_per_core"] = round(decode_cps_core, 2)
    _log(f"[live] {result['e2e_clips_per_sec']} clips/s e2e at duty "
         f"{result['duty_cycle']} (stall {result['data_stall_ms']} ms/step, "
         f"{workers} decode workers on {result['host_cores']} cores)")

    if replay:
        # pool of pre-decoded host batches (decoded once, reused):
        # feeding the step from the pool measures host assembly +
        # device_put + dispatch at an unbounded decode-supply rate,
        # i.e. the duty a host with enough decode cores would reach
        import itertools

        pool_loader = DataLoader(ds, batch, shuffle=True, drop_last=True,
                                 num_workers=workers, prefetch_depth=2,
                                 infinite=True)
        try:
            pool_it = iter(pool_loader)
            pool = [next(pool_it) for _ in range(4)]
        finally:
            pool_loader.close()  # pool decoded; workers no longer needed
        rit = device_prefetch(itertools.cycle(pool), mesh, depth=2)
        with jax.set_mesh(mesh):
            # warmup first: windows time the loop only
            state, m = step(state, next(rit), rng)
            float(m["loss"])
            state, rstats, rwall, _ = timed_loop(rit, steps, state)
        result["replay_pre_decoded"] = {
            "clips_per_sec": round(batch * steps / rwall, 2),
            "duty_cycle": round(rstats.get("duty_cycle", 0.0), 4),
            "data_time_s": round(rstats.get("data_time", 0.0), 4),
            "step_time_s": round(rstats.get("step_time", 0.0), 4),
        }
        _log(f"[replay] pre-decoded feed: "
             f"{result['replay_pre_decoded']['clips_per_sec']} clips/s at "
             f"duty cycle {result['replay_pre_decoded']['duty_cycle']}")

    if echo_also > 1:
        # the data-echoing lever (data.echo_factor, arXiv:1907.05550)
        # measured live: same compiled step, fresh decode workers, each
        # decoded batch stepped echo_also times on-device
        e_steps = steps * echo_also
        e_loader = DataLoader(ds, batch, shuffle=True, drop_last=True,
                              num_workers=workers, prefetch_depth=4,
                              infinite=True)
        try:
            eit = echo_batches(
                device_prefetch(iter(e_loader), mesh, depth=2), echo_also)
            with jax.set_mesh(mesh):
                state, m = step(state, next(eit), rng)
                float(m["loss"])
                state, estats, ewall, _ = timed_loop(
                    eit, e_steps, state, mark_every=5 * echo_also)
        finally:
            e_loader.close()
        result["echoed"] = {
            "echo_factor": echo_also,
            "clips_per_sec": round(batch * e_steps / ewall, 2),
            "duty_cycle": round(estats.get("duty_cycle", 0.0), 4),
            "data_time_s": round(estats.get("data_time", 0.0), 4),
            "step_time_s": round(estats.get("step_time", 0.0), 4),
        }
        _log(f"[echo x{echo_also}] {result['echoed']['clips_per_sec']} "
             f"clips/s at duty cycle {result['echoed']['duty_cycle']}")
    return result


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="CLIP_VITB16")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--videos", type=int, default=8)
    p.add_argument("--workers", type=int, default=max(1, os.cpu_count() - 1))
    p.add_argument("--clip-length", type=int, default=4)
    p.add_argument("--crop-size", type=int, default=224)
    p.add_argument("--host-cores", type=int, default=112,
                   help="core count for the projected duty cycle")
    p.add_argument("--root", default=None,
                   help="reuse an existing synthetic dataset dir")
    p.add_argument("--sharded", action="store_true",
                   help="bench the tar-sharded input path "
                        "(data/shards.py): the synthetic dataset is "
                        "packed once into shards under <root>/_shards "
                        "and read back through "
                        "ShardedVideoCaptionDataset")
    p.add_argument("--echo", type=int, default=1,
                   help="data echoing factor: step on each decoded "
                        "batch N times (on-device reuse; "
                        "data.echo_factor in training)")
    p.add_argument("--echo-also", type=int, default=0,
                   help="after the live run, re-run the step loop with "
                        "data echoing at this factor (same compiled "
                        "step) and report an 'echoed' sub-record")
    p.add_argument("--replay", action="store_true",
                   help="after the live run, re-run the step loop fed "
                        "from a pool of pre-decoded batches — measures "
                        "the duty cycle of everything EXCEPT decode CPU "
                        "(host assembly + device_put + dispatch), i.e. "
                        "the duty cycle a host with enough decode cores "
                        "would actually achieve")
    args = p.parse_args(argv)

    ds = None
    if args.sharded:
        from avion_tpu.data.datasets import AugmentSpec
        from avion_tpu.data.shards import (
            INDEX_NAME, ShardedVideoCaptionDataset, pack_shards)

        root = args.root or osp.join(tempfile.gettempdir(),
                                     "avion_bench_pipe")
        os.makedirs(root, exist_ok=True)
        meta = make_chunked_dataset(root, n_videos=args.videos)
        shard_dir = osp.join(root, "_shards")
        if not osp.exists(osp.join(shard_dir, INDEX_NAME)):
            t0 = time.perf_counter()
            pack_shards("ego4d", root, meta, shard_dir, chunk_len=15,
                        fps=30, pack_fps=30, short_side=288)
            _log(f"[setup] shards packed in {time.perf_counter() - t0:.1f}s")
        ds = ShardedVideoCaptionDataset(
            shard_dir, is_training=True, clip_length=args.clip_length,
            augment=AugmentSpec(crop_size=args.crop_size, mode="rrc"),
        )

    seg = live_segment(
        model_name=args.model, batch=args.batch, steps=args.steps,
        workers=args.workers, clip_length=args.clip_length,
        crop_size=args.crop_size, ds=ds, root=args.root,
        videos=args.videos, replay=args.replay, echo=args.echo,
        echo_also=args.echo_also)

    # projection: with C cores decoding, host supply = C * per-core rate;
    # duty cycle ~= min(1, supply / step-rate-demand)
    demand = args.batch / max(seg.get("step_time_s") or 1e-9, 1e-9)
    supply = args.host_cores * seg.get("decode_clips_per_sec_per_core", 0.0)
    projected = min(1.0, supply / max(demand, 1e-9))
    result = {
        "metric": "pipeline_clips_per_sec_e2e",
        "input_path": "sharded" if args.sharded else "chunked",
        "value": seg["e2e_clips_per_sec"],
        "unit": "clips/s/chip",
        "duty_cycle": seg["duty_cycle"],
        "data_time_s": round(seg["data_stall_ms"] / 1e3, 4),
        "step_time_s": seg["step_time_s"],
        "decode_clips_per_sec_per_core":
            seg.get("decode_clips_per_sec_per_core"),
        "host_cores": seg["host_cores"],
        "live_batch": seg.get("live_batch", args.batch),
        "projected_duty_cycle_at_cores": {
            str(args.host_cores): round(projected, 4)},
        "loss": seg["loss"],
    }
    if "echo_factor" in seg:
        result["echo_factor"] = seg["echo_factor"]
    if "echoed" in seg:
        result["echoed"] = seg["echoed"]
    if "replay_pre_decoded" in seg:
        result["replay_pre_decoded"] = seg["replay_pre_decoded"]
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
