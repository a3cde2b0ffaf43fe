"""MXU lane-floor microbenchmark: the head_dim-64 attention bound.

Measures what the parity-geometry MFU analysis (docs/PERF.md) rests on:
on the v5e MXU a matmul's cost is set by its OUTPUT tile count times
``ceil(K/128)`` — a contraction (or output-lane) dimension of 64 costs
the same as 128, so every d=64 attention matmul runs at half its
nominal-FLOPs rate.  Consequently a 12-head/64-dim attention layer is
intrinsically ~2x the wall time of the 6-head/128-dim layer with
IDENTICAL model FLOPs, for ANY kernel: per head the score matrix is
S x S and the PV output is S x 64(lane-padded to 128), so tile counts
double with head count while FLOPs do not.  No packing escapes it —
interleaving two 64-dim heads into one 128-lane contraction computes
s1+s2 (inseparable), and block-diagonal zero-padding burns exactly the
lanes it fills: the output-element count ceil(K/128)*M*N is invariant.

Measurement notes: single-op XLA timings through the tunneled backend
are dispatch-dominated, and XLA folds repeated/summed identical
matmuls; so the sweeps run INSIDE a Pallas kernel — operands parked in
VMEM, a long fori_loop of MXU matmuls with a loop-carried one-row
perturbation that defeats hoisting.  The end-to-end check times the
production flash kernel at train-step scale (b=256) where FLOPs dwarf
dispatch.

Three measurement groups (one JSON line each):

1. ``qk_contraction``: in-kernel [512, K] @ [K, 512] for K in
   {64, 128, 256} — prediction t(64) ~= t(128) ~= t(256)/2.
2. ``pv_lane``: in-kernel [512, 512] @ [512, N], N in {64, 128, 256}
   — same prediction.
3. ``attn_kernel``: the production flash kernel fwd+bwd at ViT-B
   pretrain scale (b=256, s=785, w=768), 12x64 vs 6x128 (equal FLOPs).

Usage::  python -m avion_tpu.tools.mxu_roofline
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _force(out):
    # host fetch forces execution: block_until_ready alone does not
    # synchronize through the remote-tunnel backend (see bench.py)
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def _time(fn, *args, iters=5, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


_NB = 8  # distinct B operands cycled per iteration (defeats LICM)


def _loop_matmul_kernel(a_ref, bs_ref, o_ref, *, reps):
    a = a_ref[:]

    def body(i, acc):
        b = bs_ref[i % _NB]  # varied VMEM load: the dot can't hoist
        return acc + jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    o_ref[:] = jax.lax.fori_loop(
        0, reps, body, jnp.zeros(o_ref.shape, jnp.float32))


def bench_inkernel_matmul(m, k, n, reps=2000, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), dtype)
    bs = jax.random.normal(key, (_NB, k, n), dtype)
    f = jax.jit(pl.pallas_call(
        functools.partial(_loop_matmul_kernel, reps=reps),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    ))
    dt = _time(f, a, bs) / reps
    flops = 2 * m * k * n
    return dt, flops / dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=2000,
                   help="in-kernel matmul repetitions")
    args = p.parse_args(argv)

    rows = {}
    for k in (64, 128, 256):
        dt, rate = bench_inkernel_matmul(512, k, 512, reps=args.reps)
        rows[str(k)] = {"us": round(dt * 1e6, 3),
                        "tflops": round(rate / 1e12, 1)}
    qk = {"metric": "mxu_qk_contraction_sweep",
          "shape": "[512,K]x[K,512] in-kernel", "by_K": rows,
          "t64_over_t128": round(rows["64"]["us"] / rows["128"]["us"], 3),
          "t256_over_t128": round(rows["256"]["us"] / rows["128"]["us"], 3)}
    print(json.dumps(qk))

    rows = {}
    for n in (64, 128, 256):
        dt, rate = bench_inkernel_matmul(512, 512, n, reps=args.reps)
        rows[str(n)] = {"us": round(dt * 1e6, 3),
                        "tflops": round(rate / 1e12, 1)}
    pv = {"metric": "mxu_pv_lane_sweep",
          "shape": "[512,512]x[512,N] in-kernel", "by_N": rows,
          "t64_over_t128": round(rows["64"]["us"] / rows["128"]["us"], 3),
          "t256_over_t128": round(rows["256"]["us"] / rows["128"]["us"], 3)}
    print(json.dumps(pv))

    # production kernel at train-step scale: 12x64 vs 6x128, identical
    # FLOPs (width 768); per-call FLOPs ~0.5 TFLOP so dispatch is noise
    from avion_tpu.ops.flash_attention import flash_attention

    b, seq, w = 256, 785, 768
    attn_flops = 4 * seq * seq * w * b  # QK^T + PV nominal matmul FLOPs
    res = {}
    for h, d in ((12, 64), (6, 128)):
        key = jax.random.PRNGKey(1)
        q = jax.random.normal(key, (b, seq, h, d), jnp.bfloat16)

        fwd = jax.jit(lambda q: flash_attention(q, q, q))
        t_fwd = _time(fwd, q, iters=10)

        def loss(q):
            return jnp.sum(flash_attention(q, q, q).astype(jnp.float32))

        bwd = jax.jit(jax.grad(loss))
        t_bwd = _time(bwd, q, iters=10)
        res[f"{h}x{d}"] = {
            "fwd_ms": round(t_fwd * 1e3, 3),
            "fwdbwd_ms": round(t_bwd * 1e3, 3),
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
