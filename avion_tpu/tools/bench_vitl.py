"""CLIP ViT-L/14 pretrain step throughput (secondary model-family
datapoint beside bench.py's ViT-B headline).

Reference config: ViT-L/14, 4-frame clips, batch 112/GPU on A5000s
(``docs/MODEL_ZOO.md:54``, ~680 GPU-h for the 35M-clip LLM-aug set →
~14.3 clips/s/GPU effective at 5 epochs x 35M / (680*3600)... the zoo
row does not pin epochs, so this tool reports absolute clips/s/chip and
MFU; MFU is the cross-hardware comparable number).

Usage: python -m avion_tpu.tools.bench_vitl [batch]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from avion_tpu.core.flops import V5E_PEAK_FLOPS, clip_fwd_flops


def model_fwd_flops():
    """ViT-L/14 geometry through the shared helper."""
    return clip_fwd_flops(clip_len=4, image=224, patch=14, vw=1024, vl=24,
                          tw=768, tl=12, ctx=77)


def bench(batch: int, warmup: int = 3, iters: int = 10,
          model_name: str = "CLIP_VITL14"):
    from avion_tpu.core.config import OptimConfig
    from avion_tpu.core.train_state import TrainState
    from avion_tpu.models import create_model
    from avion_tpu.optim import build_optimizer
    from avion_tpu.train.steps import make_clip_train_step

    model = create_model(model_name, num_frames=4,
                         use_grad_checkpointing=True, use_flash_attn=True,
                         project_embed_dim=768)
    rng = jax.random.PRNGKey(0)
    video = jax.device_put(
        jax.random.normal(rng, (batch, 4, 224, 224, 3), jnp.bfloat16))
    text = jax.device_put(
        jax.random.randint(rng, (batch, 77), 0, 49408, jnp.int32))
    params = jax.jit(model.init)(rng, video[:2], text[:2])["params"]
    cfg = OptimConfig(optimizer="adamw", lr=3e-5, warmup_epochs=1, epochs=5,
                      grad_clip_norm=1.0)
    tx, _ = build_optimizer(cfg, params, niter_per_ep=1000)
    state = TrainState.create(params, tx)
    step = jax.jit(make_clip_train_step(model, tx), donate_argnums=(0,))
    data = {"video": video, "text": text}
    for _ in range(warmup):
        state, m = step(state, data, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, data, rng)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    model_name = "CLIP_VITL14"
    if "--model" in argv:
        i = argv.index("--model")
        if i + 1 >= len(argv):
            raise SystemExit("usage: [batch] [--model NAME]")
        model_name = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    tag = "vitl14" if model_name == "CLIP_VITL14" else model_name.lower()
    batches = [int(argv[0])] if argv else [96, 64, 48, 32]
    for b in batches:
        try:
            r, dt = bench(b, model_name=model_name)
        except Exception as e:
            msg = str(e).lower()
            if any(t in msg for t in ("hbm", "memory", "compile",
                                      "resource_exhausted")):
                print(f"batch {b} failed; trying smaller", file=sys.stderr)
                continue
            raise
        mfu = r * 3 * model_fwd_flops() / V5E_PEAK_FLOPS
        print(json.dumps({
            "metric": f"clips_per_sec_per_chip_{tag}_pretrain_b{b}",
            "value": round(r, 2), "unit": "clips/s/chip",
            "mfu": round(mfu, 4), "step_ms": round(dt * 1e3, 1),
        }))
        return


if __name__ == "__main__":
    main()
