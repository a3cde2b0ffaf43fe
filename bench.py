#!/usr/bin/env python
"""Benchmark: CLIP ViT-B/16 contrastive pretrain step throughput on TPU.

Matches the reference headline config: 4-frame clips, 224px (batch 192
is the largest that fits v5e HBM with selective remat; the reference
uses 256/GPU on 24GB A5000s)
(scripts/main_lavila_pretrain.py:78 --clip-length default 4, batch 256/GPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation: the reference trains Ego4D ViT-B for 5 epochs over
4.0M clips in ~130 GPU-hours on 8x A5000 (docs/MODEL_ZOO.md:52,
README.md:20-24) => 20M clips / 468,000 GPU-s = 42.7 clips/s/GPU.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_CLIPS_PER_SEC_PER_GPU = 42.7


def build(batch):
    from avion_tpu.core.config import OptimConfig
    from avion_tpu.core.train_state import TrainState
    from avion_tpu.models import create_model
    from avion_tpu.optim import build_optimizer
    from avion_tpu.train.steps import make_clip_train_step

    model = create_model(
        "CLIP_VITB16", num_frames=4, use_grad_checkpointing=True,
        use_flash_attn=True, project_embed_dim=512,
    )
    rng = jax.random.PRNGKey(0)
    video = jnp.zeros((batch, 4, 224, 224, 3), jnp.bfloat16)
    text = jnp.zeros((batch, 77), jnp.int32)
    params = jax.jit(model.init)(rng, video, text)["params"]
    cfg = OptimConfig(optimizer="adamw", lr=4e-5, warmup_epochs=1, epochs=5,
                      grad_clip_norm=1.0)
    tx, _ = build_optimizer(cfg, params, niter_per_ep=1000)
    state = TrainState.create(params, tx)
    step = jax.jit(make_clip_train_step(model, tx), donate_argnums=(0,))
    batch_data = {
        "video": jax.device_put(
            jax.random.normal(rng, (batch, 4, 224, 224, 3), jnp.bfloat16)),
        "text": jax.device_put(
            jax.random.randint(rng, (batch, 77), 0, 49408, jnp.int32)),
    }
    return step, state, batch_data


def bench_batch(batch, warmup=3, iters=20):
    step, state, data = build(batch)
    rng = jax.random.PRNGKey(1)
    for _ in range(warmup):
        state, metrics = step(state, data, rng)
    # host fetch forces execution (block_until_ready alone does not
    # synchronize through the remote-tunnel backend)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, data, rng)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def main():
    for batch in (192, 128, 64, 32):
        try:
            clips_per_sec = bench_batch(batch)
            result = {
                "metric": f"clips_per_sec_per_chip_vitb16_pretrain_b{batch}",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s/chip",
                "vs_baseline": round(
                    clips_per_sec / BASELINE_CLIPS_PER_SEC_PER_GPU, 3
                ),
            }
            print(json.dumps(result))
            return
        except Exception as e:  # OOM at this batch: halve and retry
            msg = str(e).lower()
            if any(t in msg for t in ("resource_exhausted", "out of memory",
                                      "hbm", "compile")):
                print(f"batch {batch} failed ({type(e).__name__}), retrying "
                      f"smaller", file=sys.stderr)
                continue
            raise
    print(json.dumps({"metric": "clips_per_sec_per_chip_vitb16_pretrain",
                      "value": 0.0, "unit": "clips/s/chip",
                      "vs_baseline": 0.0}))


if __name__ == "__main__":
    main()
