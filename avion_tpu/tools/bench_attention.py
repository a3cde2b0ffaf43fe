"""Attention-kernel microbenchmark: split vs combined backward.

Times the fused-qkv flash attention fwd+bwd at ViT-B pretrain shapes
(S=785, W=768, 12 heads) on the attached TPU, comparing the two-kernel
backward (separate dq and dkv programs, each recomputing scores)
against the single-program combined backward (score recompute shared;
``flash_attention._bwd_combined_kernel``).  The result decides the
production default (VERDICT r2 #1).

Usage::

    python -m avion_tpu.tools.bench_attention [--batch 64] [--frames 4]
        [--iters 20] [--heads 12] [--width 768]
"""

from __future__ import annotations

import argparse
import importlib
import time

import jax
import jax.numpy as jnp
import numpy as np

fam = importlib.import_module("avion_tpu.ops.flash_attention")


def bench_variant(qkv, heads, s, combined: bool, iters: int) -> float:
    fam._COMBINED_BWD = combined

    def loss(qkv):
        o = fam.flash_attention_fused_qkv(qkv, heads, s)
        return jnp.sum(o.astype(jnp.float32) * 1e-3)

    g = jax.jit(jax.grad(loss))
    r = g(qkv)
    float(jnp.sum(r[:, 0, :8].astype(jnp.float32)))  # force through tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        r = g(qkv)
    float(jnp.sum(r[:, 0, :8].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--width", type=int, default=768)
    p.add_argument("--grid", type=int, default=14,
                   help="patches per side (224/16)")
    args = p.parse_args(argv)

    s = args.frames * args.grid * args.grid + 1  # CLS
    s_pad = (s + 127) // 128 * 128
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(
        rng.randn(args.batch, s_pad, 3 * args.width).astype(np.float32),
        jnp.bfloat16)
    print(f"shapes: B={args.batch} S={s} (pad {s_pad}) W={args.width} "
          f"H={args.heads}")

    # the combined backward holds [S_pad, S_pad] score tiles in VMEM;
    # past the production dispatch bound it cannot compile (and the
    # split kernels are what production runs there)
    can_combine = s_pad <= fam._COMBINED_MAX_SPAD
    if can_combine:
        # correctness cross-check on-chip first (tiny batch)
        small = qkv[:2]
        fam._COMBINED_BWD = False
        g_split = jax.jit(jax.grad(lambda q: jnp.sum(
            fam.flash_attention_fused_qkv(q, args.heads, s)
            .astype(jnp.float32) ** 2)))(small)
        fam._COMBINED_BWD = True
        g_comb = jax.jit(jax.grad(lambda q: jnp.sum(
            fam.flash_attention_fused_qkv(q, args.heads, s)
            .astype(jnp.float32) ** 2)))(small)
        err = float(jnp.max(jnp.abs(
            g_split[:, :s].astype(jnp.float32)
            - g_comb[:, :s].astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(g_split[:, :s].astype(jnp.float32))))
        print(f"on-chip |split-combined| max err {err:.3e} "
              f"(scale {scale:.3e})")
        assert err <= 2e-2 * max(scale, 1.0), "combined bwd mismatch"

    import json

    ms_split = bench_variant(qkv, args.heads, s, False, args.iters)
    if not can_combine:
        print(f"fwd+bwd per call: split {ms_split:.2f} ms   (combined "
              f"skipped: S_pad {s_pad} > {fam._COMBINED_MAX_SPAD})")
        print(json.dumps({"metric": "flash_bwd_split_ms",
                          "split_ms": round(ms_split, 2)}))
        return
    ms_comb = bench_variant(qkv, args.heads, s, True, args.iters)
    print(f"fwd+bwd per call: split {ms_split:.2f} ms   "
          f"combined {ms_comb:.2f} ms   "
          f"speedup {ms_split / ms_comb:.3f}x")
    print(json.dumps({"metric": "flash_bwd_split_vs_combined_ms",
                      "split_ms": round(ms_split, 2),
                      "combined_ms": round(ms_comb, 2),
                      "speedup": round(ms_split / ms_comb, 3)}))


if __name__ == "__main__":
    main()
