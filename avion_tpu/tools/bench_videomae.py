"""VideoMAE pretrain step throughput benchmark.

Secondary perf datapoint beside bench.py: ViT-B, 16 frames, 90% tube
masking (the reference's ``main_videomae_pretrain.py`` headline: 583
GPU-h for 800 epochs over ~240k clips on 4xA5000 => ~91 clips/s/GPU
effective (800*240000/(583*3600))).

Usage: python -m avion_tpu.tools.bench_videomae [batch]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_CLIPS_PER_SEC_PER_GPU = 91.4  # 800 * 240k / (583 * 3600)


def bench(batch: int = 128, warmup: int = 3, iters: int = 15,
          model_name: str = "VIDEOMAE_VITB16") -> float:
    from avion_tpu.core.config import OptimConfig
    from avion_tpu.core.train_state import TrainState
    from avion_tpu.data.transforms import tube_mask_batch
    from avion_tpu.models import create_model
    from avion_tpu.optim import build_optimizer
    from avion_tpu.train.steps import make_videomae_train_step

    model = create_model(model_name, num_frames=16,
                         use_grad_checkpointing=True, use_flash_attn=True)
    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    video = jax.device_put(
        jax.random.normal(rng, (batch, 16, 224, 224, 3), jnp.bfloat16))
    mask = jax.device_put(jnp.asarray(
        tube_mask_batch(rs, batch, 8, 14, 14, 0.9)))
    params = jax.jit(model.init)(rng, video[:2], mask[:2])["params"]
    cfg = OptimConfig(optimizer="adamw", lr=1.5e-4, warmup_epochs=1,
                      epochs=800, grad_clip_norm=None)
    tx, _ = build_optimizer(cfg, params, niter_per_ep=1000)
    state = TrainState.create(params, tx)
    step = jax.jit(make_videomae_train_step(model, tx), donate_argnums=(0,))
    batch_data = {"video": video, "mask": mask}
    for _ in range(warmup):
        state, m = step(state, batch_data, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch_data, rng)
    float(m["loss"])
    return batch / ((time.perf_counter() - t0) / iters)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    model_name = "VIDEOMAE_VITB16"
    if "--model" in argv:
        i = argv.index("--model")
        if i + 1 >= len(argv):
            raise SystemExit("usage: [batch] [--model NAME]")
        model_name = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    batches = [int(argv[0])] if argv else [128, 64, 32]
    tag = model_name.lower()
    for b in batches:
        try:
            r = bench(b, model_name=model_name)
            print(json.dumps({
                "metric": f"clips_per_sec_per_chip_{tag}_b{b}",
                "value": round(r, 2), "unit": "clips/s/chip",
                "vs_baseline": round(r / BASELINE_CLIPS_PER_SEC_PER_GPU, 3),
            }))
            return
        except Exception as e:
            msg = str(e).lower()
            if any(t in msg for t in ("hbm", "memory", "compile",
                                      "resource_exhausted")):
                print(f"batch {b} failed; trying smaller", file=sys.stderr)
                continue
            raise


if __name__ == "__main__":
    main()
