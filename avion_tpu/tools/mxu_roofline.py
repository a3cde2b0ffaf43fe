"""Attention head_dim floor measurement: 12x64 vs 6x128 at equal FLOPs.

Evidence for the parity-geometry MFU bound (docs/PERF.md "parity MFU
bound"): on the v5e MXU a matmul's cost is its OUTPUT tile count times
``ceil(K/128)`` passes — so for head_dim <= 128 every attention score
matrix costs the same S x S tile sweep regardless of d, and the PV
output lane dim 64 pads to 128.  Per layer the 12-head/64-dim split
therefore runs ~2x the attention matmul time of the 6-head/128-dim
split with IDENTICAL model FLOPs — for ANY kernel.  No packing
escapes it: interleaving two 64-dim heads into one 128-lane
contraction computes s1+s2 (inseparable), and block-diagonal
zero-padding burns exactly the lanes it fills (output-element count
is invariant).

This tool times the production flash kernel at train-step scale
(b=256, s=785, w=768) for both geometries, forward and
forward+backward, and prints one JSON line.  Functions return scalars
— fetching a [256,785,768] array through the tunneled backend costs
seconds and would swamp the measurement (block_until_ready does not
synchronize through the tunnel; a host fetch does — see bench.py).

Usage::  python -m avion_tpu.tools.mxu_roofline [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time_scalar(fn, *args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(out)  # host fetch forces execution through the tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--seq", type=int, default=785)
    args = p.parse_args(argv)

    from avion_tpu.ops.flash_attention import flash_attention

    b, seq, w = args.batch, args.seq, 768
    attn_flops = 4 * seq * seq * w * b  # QK^T + PV nominal matmul FLOPs
    res = {}
    for h, d in ((12, 64), (6, 128)):
        key = jax.random.PRNGKey(1)
        q = jax.random.normal(key, (b, seq, h, d), jnp.bfloat16)

        fwd = jax.jit(lambda q: jnp.sum(
            flash_attention(q, q, q).astype(jnp.float32)))
        t_fwd = _time_scalar(fwd, q, iters=args.iters)

        def loss(q):
            return jnp.sum(flash_attention(q, q, q).astype(jnp.float32) ** 2)

        bwd = jax.jit(lambda q: jnp.sum(
            jax.grad(loss)(q).astype(jnp.float32)))
        t_bwd = _time_scalar(bwd, q, iters=args.iters)
        res[f"{h}x{d}"] = {
            "fwd_ms": round(t_fwd * 1e3, 2),
            "fwdbwd_ms": round(t_bwd * 1e3, 2),
            "fwd_tflops": round(attn_flops / t_fwd / 1e12, 1),
        }
    out = {"metric": "flash_attention_headdim_floor",
           "shape": f"b{b} s{seq} w{w}", **res,
           "fwd_12x64_over_6x128": round(
               res["12x64"]["fwd_ms"] / res["6x128"]["fwd_ms"], 3),
           "fwdbwd_12x64_over_6x128": round(
               res["12x64"]["fwdbwd_ms"] / res["6x128"]["fwdbwd_ms"], 3)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
