"""Head-split quality ablation: 12 x 64 vs 6 x 128 at fixed width.

The TPU flagship geometries (``CLIP_VITB16_H128`` and friends,
``models/registry.py``) keep the reference's widths/depths/params but
halve the head count so every attention matmul contracts over the
MXU's full 128 lanes — 1.43x faster attention on identical FLOPs
(docs/PERF.md).  Head count at fixed width is a (mild) capacity knob,
so the speed claim needs a quality measurement to stand on.

This tool runs the controlled comparison the claim needs: both arms
train from the SAME initial parameters (the fused qkv/out kernels
carry no head structure, so the trees are shape-identical) on the SAME
synthetic concept-association batches — K concepts, each a noisy video
prototype paired with a fixed caption — and are scored on held-out
retrieval (fresh noisy clips of each concept, top-1 over the K concept
captions).  The only difference between arms is the vision-tower head
split, so any quality gap is attributable to head_dim 64 -> 128.

Usage (real chip, ~2 min; defaults sized so compile+train fits)::

    python -m avion_tpu.tools.headdim_ablation \
        --steps 200 --batch 64 --concepts 32

Prints one JSON line per arm plus a combined verdict line.  Measured
result lives in docs/PERF.md ("Head-split quality" section).

Reference anchor: head count itself comes from the reference factories
(``avion/models/model_clip.py:102-177`` — 12 heads at width 768); the
reference never ablates it.
"""

from __future__ import annotations

import json
import sys
from typing import Dict, List

import numpy as np


def synth_concepts(rng: np.random.RandomState, n_concepts: int,
                   frames: int, size: int, block: int = 8,
                   overlap: float = 0.0):
    """Per-concept video prototypes: random block-constant uint8
    patterns (block-constant so the signal survives patchify at any
    patch size) + per-concept captions.

    ``overlap`` in [0, 1) mixes a SHARED base pattern into every
    prototype, shrinking the between-concept signal — the
    de-saturation knob that pulls held-out top-1 off the 1.00 ceiling
    so the A/B has discriminating power (ADVICE r3 #3)."""
    g = size // block
    blocks = rng.randint(0, 256, (n_concepts, frames, g, g, 3))
    if overlap > 0.0:
        shared = rng.randint(0, 256, (1, frames, g, g, 3))
        blocks = (overlap * shared
                  + (1.0 - overlap) * blocks).round().astype(np.int64)
    protos = blocks.astype(np.uint8).repeat(block, axis=2).repeat(block,
                                                                  axis=3)
    captions = [f"a photo of concept number {i} doing action {i}"
                for i in range(n_concepts)]
    return protos, captions


def noisy_clip(rng: np.random.RandomState, proto: np.ndarray,
               sigma: float) -> np.ndarray:
    noise = rng.normal(0.0, sigma, proto.shape)
    return np.clip(proto.astype(np.float32) + noise, 0, 255).astype(np.uint8)


def make_batches(seed: int, protos: np.ndarray, texts: np.ndarray,
                 steps: int, batch: int, sigma: float) -> List[Dict]:
    """The shared batch schedule — identical for every arm."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(steps):
        if batch <= len(protos):
            # without replacement: duplicate captions in a batch are
            # false negatives under InfoNCE and cap clip_acc
            idx = rng.choice(len(protos), batch, replace=False)
        else:
            idx = rng.randint(0, len(protos), batch)
        video = np.stack([noisy_clip(rng, protos[i], sigma) for i in idx])
        out.append({"video": video, "text": texts[idx]})
    return out


def run_arm(heads: int, *, init_params, batches, protos, texts,
            heldout_per_concept: int, sigma: float, lr: float,
            width: int, layers: int, frames: int, size: int,
            patch: int, use_flash: bool,
            eval_sigma: float | None = None) -> Dict:
    import jax
    import jax.numpy as jnp

    from avion_tpu.core.config import OptimConfig
    from avion_tpu.core.train_state import TrainState
    from avion_tpu.models.clip import CLIP
    from avion_tpu.optim import build_optimizer
    from avion_tpu.train.steps import make_clip_train_step

    steps = len(batches)
    model = CLIP(
        embed_dim=min(width, 512), image_size=size, patch_size=patch,
        num_frames=frames, vision_width=width, vision_layers=layers,
        vision_heads=heads, text_width=min(width, 512),
        text_heads=8 if width >= 512 else 2, text_layers=min(layers, 12),
        use_flash=use_flash, dtype=jnp.bfloat16,
    )
    cfg = OptimConfig(optimizer="adamw", lr=lr, lr_start=lr / 10,
                      lr_end=lr / 10, warmup_epochs=0.1, epochs=1,
                      wd=0.01, grad_clip_norm=1.0)
    # fresh device copies: the jitted step donates its state, so each
    # arm must own its buffers or arm 2 would read donated memory
    params = jax.tree_util.tree_map(lambda x: jnp.array(x), init_params)
    tx, _ = build_optimizer(cfg, params, niter_per_ep=steps)
    state = TrainState.create(params, tx)
    step = jax.jit(make_clip_train_step(model, tx), donate_argnums=(0,))

    rng = jax.random.PRNGKey(7)
    losses, accs = [], []
    for i, b in enumerate(batches):
        state, metrics = step(
            state, {"video": jnp.asarray(b["video"]),
                    "text": jnp.asarray(b["text"])}, rng)
        if i >= steps - max(1, steps // 5) or i == 0:
            losses.append(float(metrics["loss"]))
            accs.append(float(metrics["clip_acc"]))

    # held-out retrieval: fresh noisy clips per concept vs the K
    # concept caption embeddings.  eval_sigma (scalar or list) > sigma
    # probes the MARGIN of the learned representations across a noise
    # curve: the train task can sit in its fully-learnable regime while
    # held-out top-1 spans ceiling-to-floor (the de-saturation ADVICE
    # r3 #3 asked for) — matched-noise eval otherwise saturates the
    # moment training converges (sharp learnability cliff)
    k = len(protos)
    if eval_sigma is None:
        eval_sigmas = [sigma]
    elif np.isscalar(eval_sigma):
        eval_sigmas = [float(eval_sigma)]
    else:
        eval_sigmas = [float(s) for s in eval_sigma]
    labels = np.repeat(np.arange(k), heldout_per_concept)

    from avion_tpu.data.transforms import (
        OPENAI_MEAN,
        OPENAI_STD,
        normalize_video,
    )

    @jax.jit
    def encode_video(params, video):
        # same normalization the train step applies (steps.prep_video)
        return model.apply({"params": params},
                           normalize_video(jnp.asarray(video), OPENAI_MEAN,
                                           OPENAI_STD, jnp.bfloat16),
                           method=model.encode_image)

    @jax.jit
    def encode_text(params, text):
        return model.apply({"params": params}, jnp.asarray(text),
                           method=model.encode_text)

    # texts encoded ONCE; only the video side is batched over the loop
    tvecs = np.asarray(encode_text(state.params, texts), np.float32)
    bs = max(1, len(batches[0]["video"]))
    top1_by_sigma = {}
    for es in eval_sigmas:
        erng = np.random.RandomState(999)  # same clips across arms
        eval_videos = np.stack([
            noisy_clip(erng, protos[c], es)
            for c in range(k) for _ in range(heldout_per_concept)])
        vecs = []
        for i in range(0, len(eval_videos), bs):
            v = encode_video(state.params, eval_videos[i:i + bs])
            vecs.append(np.asarray(v, np.float32))
        sims = np.concatenate(vecs) @ tvecs.T
        top1_by_sigma[es] = float((sims.argmax(-1) == labels).mean())
    top1 = top1_by_sigma[eval_sigmas[0]]

    # tail-window mean; at steps=1 only the step-0 sample exists, so
    # fall back to it instead of np.mean([]) (NaN + invalid JSON)
    tail_losses = losses[1:] if len(losses) > 1 else losses[-1:]
    tail_accs = accs[1:] if len(accs) > 1 else accs[-1:]
    out = {
        "heads": heads,
        "head_dim": width // heads,
        "first_loss": round(losses[0], 4),
        "final_loss": round(float(np.mean(tail_losses)), 4),
        "final_clip_acc": round(float(np.mean(tail_accs)), 2),
        "heldout_top1": round(top1, 4),
    }
    if len(eval_sigmas) > 1:
        # %g keys: no fractional-sigma collisions ("25.2" != "25.8"),
        # integral sigmas still print as "60"
        out["top1_by_sigma"] = {f"{s:g}": round(v, 4)
                                for s, v in top1_by_sigma.items()}
    return out


def run(steps=200, batch=64, concepts=32, width=768, layers=6, frames=4,
        size=96, patch=16, sigma=25.0, lr=1e-4, heads=(12, 6),
        heldout_per_concept=4, seed=0, overlap=0.0,
        eval_sigma=None) -> Dict:
    import jax
    import jax.numpy as jnp

    from avion_tpu.data.tokenizer import tokenize
    from avion_tpu.models.clip import CLIP

    use_flash = jax.devices()[0].platform != "cpu"
    rng = np.random.RandomState(seed)
    protos, captions = synth_concepts(rng, concepts, frames, size,
                                      overlap=overlap)
    texts = np.stack([tokenize(c) for c in captions]).astype(np.int32)
    batches = make_batches(seed + 1, protos, texts, steps, batch, sigma)

    # one init shared by every arm: the param tree is head-count
    # independent (fused qkv), so the arms differ ONLY in the split
    ref = CLIP(embed_dim=min(width, 512), image_size=size,
               patch_size=patch, num_frames=frames, vision_width=width,
               vision_layers=layers, vision_heads=heads[0],
               text_width=min(width, 512),
               text_heads=8 if width >= 512 else 2,
               text_layers=min(layers, 12), use_flash=use_flash,
               dtype=jnp.bfloat16)
    init_params = ref.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((2, frames, size, size, 3), jnp.float32),
        jnp.zeros((2, 77), jnp.int32))["params"]

    arms = []
    for h in heads:
        assert width % h == 0, (width, h)
        r = run_arm(h, init_params=init_params, batches=batches,
                    protos=protos, texts=texts,
                    heldout_per_concept=heldout_per_concept, sigma=sigma,
                    lr=lr, width=width, layers=layers, frames=frames,
                    size=size, patch=patch, use_flash=use_flash,
                    eval_sigma=eval_sigma)
        print(json.dumps({"arm": r}))
        arms.append(r)

    base = arms[0]
    summary = {"metric": "headdim_ablation", "seed": seed, "arms": arms}
    if len(arms) > 1:
        summary["top1_delta_vs_first"] = [
            round(a["heldout_top1"] - base["heldout_top1"], 4)
            for a in arms[1:]]
        summary["loss_delta_vs_first"] = [
            round(a["final_loss"] - base["final_loss"], 4)
            for a in arms[1:]]
        if "top1_by_sigma" in base:
            summary["top1_delta_by_sigma_vs_first"] = [
                {s: round(a["top1_by_sigma"][s] - base["top1_by_sigma"][s],
                          4)
                 for s in base["top1_by_sigma"]}
                for a in arms[1:]]
    print(json.dumps(summary))
    return summary


def run_multi(seeds, **kw) -> Dict:
    """The A/B over several seeds (init + batch schedule + prototypes
    all re-drawn per seed): the per-seed top-1 deltas give the noise
    scale the single-run delta must be judged against."""
    runs = [run(seed=s, **kw) for s in seeds]
    summary = {"metric": "headdim_ablation_multi", "seeds": list(seeds),
               "runs": runs}
    if all("top1_delta_vs_first" in r for r in runs) and len(runs) > 1:
        deltas = np.array([r["top1_delta_vs_first"] for r in runs])
        accs = np.array([[a["heldout_top1"] for a in r["arms"]]
                         for r in runs])
        summary["top1_by_arm_mean"] = [round(v, 4)
                                       for v in accs.mean(0).tolist()]
        summary["top1_delta_mean"] = [round(v, 4)
                                      for v in deltas.mean(0).tolist()]
        summary["top1_delta_std"] = [round(v, 4)
                                     for v in deltas.std(0).tolist()]
        if all("top1_by_sigma" in a for r in runs for a in r["arms"]):
            sig = list(runs[0]["arms"][0]["top1_by_sigma"])
            # [seed, arm, sigma]
            cube = np.array([[[a["top1_by_sigma"][s] for s in sig]
                              for a in r["arms"]] for r in runs])
            m = cube.mean(0)
            summary["top1_by_sigma_arm_mean"] = [
                {s: round(float(v), 4) for s, v in zip(sig, row)}
                for row in m]
            d = cube[:, 1:] - cube[:, :1]  # per-seed deltas vs arm 0
            summary["top1_delta_by_sigma_mean"] = [
                {s: round(float(v), 4) for s, v in zip(sig, row)}
                for row in d.mean(0)]
            summary["top1_delta_by_sigma_std"] = [
                {s: round(float(v), 4) for s, v in zip(sig, row)}
                for row in d.std(0)]
    print(json.dumps(summary))
    return summary


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="12x64 vs 6x128 head-split quality ablation")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--concepts", type=int, default=32)
    p.add_argument("--width", type=int, default=768)
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--size", type=int, default=96)
    p.add_argument("--patch", type=int, default=16)
    p.add_argument("--sigma", type=float, default=25.0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--heads", type=int, nargs="+", default=[12, 6])
    p.add_argument("--heldout", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--seeds", type=int, nargs="+", default=None,
                   help="run the full A/B once per seed and report "
                        "delta mean/std across seeds")
    p.add_argument("--overlap", type=float, default=0.0,
                   help="0..1: mix a shared base into every concept "
                        "prototype (harder, de-saturated eval)")
    p.add_argument("--eval-sigma", type=float, nargs="+", default=None,
                   help="held-out clip noise sigma(s) (default: the "
                        "train sigma); a list sweeps a noise curve so "
                        "top-1 spans ceiling-to-floor and per-sigma "
                        "arm deltas are measured off the ceiling")
    a = p.parse_args(argv)
    kw = dict(steps=a.steps, batch=a.batch, concepts=a.concepts,
              width=a.width, layers=a.layers, frames=a.frames, size=a.size,
              patch=a.patch, sigma=a.sigma, lr=a.lr, heads=tuple(a.heads),
              heldout_per_concept=a.heldout, overlap=a.overlap,
              eval_sigma=a.eval_sigma)
    if a.seeds:
        run_multi(a.seeds, **kw)
    else:
        run(seed=a.seed, **kw)
    return 0


if __name__ == "__main__":
    sys.exit(main())
