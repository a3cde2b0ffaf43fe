"""Narrator (dataset-factory) generation throughput benchmark.

Measures clips/s for LaViLa-narrator-style caption generation — the
offline stage that produces pseudo-narration training pkls
(``second_party/lavilla_narrator/main.py``; the reference gives no
throughput number, its narrator ran as vLLM-era batch jobs).  Reports
KV-cached vs full-prefix decode so the cached-path win (docs/PERF.md)
is reproducible.

Default model is GPT-2-medium scale (1024w/24L decoder + 256 visual
tokens) so the bench fits one chip quickly; pass ``--xl`` for the
GPT-2-XL narrator geometry (1600w/48L — slow first compile).

Usage: python -m avion_tpu.tools.bench_narrator [--batch 16]
    [--max-len 77] [--samples 3] [--no-cache] [--xl]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(batch: int, max_len: int, use_cache: bool, xl: bool,
          iters: int = 3):
    from avion_tpu.models.gpt2_gated import GatedGPT2LMHead, make_decode_cache

    if xl:
        w, layers, heads = 1600, 48, 25
    else:
        w, layers, heads = 1024, 24, 16
    dec = GatedGPT2LMHead(vocab_size=50257, max_positions=128, width=w,
                          layers=layers, heads=heads, cross_freq=3,
                          dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    enc = jax.random.normal(rng, (batch, 256, w), jnp.bfloat16)
    params = jax.jit(dec.init)(rng, jnp.zeros((batch, 4), jnp.int32),
                               enc)["params"]
    # production captioners store kernels in bf16 (token-exact; see
    # docs/SERVING.md) — bench the same weight dtype
    from avion_tpu.eval.runners import cast_inference_params

    params = cast_inference_params(params, dec)

    def gen_cached(params, enc):
        cross = dec.apply({"params": params}, enc,
                          method=dec.precompute_cross)
        kv = make_decode_cache(layers, batch, max_len, w, jnp.bfloat16)
        toks = jnp.zeros((batch, max_len), jnp.int32).at[:, 0].set(11)

        def step(carry, i):
            toks, kv = carry
            tok = jax.lax.dynamic_slice(toks, (0, i - 1), (batch, 1))
            logit, kv = dec.apply({"params": params}, tok, i - 1, kv,
                                  cross, method=dec.decode_one)
            nxt = jnp.argmax(logit, -1).astype(jnp.int32)
            return (toks.at[:, i].set(nxt), kv), None

        (toks, _), _ = jax.lax.scan(step, (toks, kv),
                                    jnp.arange(1, max_len))
        return toks

    def gen_full(params, enc):
        toks = jnp.zeros((batch, max_len), jnp.int32).at[:, 0].set(11)

        def step(toks, i):
            logits = dec.apply({"params": params}, toks, enc)
            nxt = jnp.argmax(logits[:, i - 1], -1).astype(jnp.int32)
            return toks.at[:, i].set(nxt), None

        toks, _ = jax.lax.scan(step, toks, jnp.arange(1, max_len))
        return toks

    f = jax.jit(gen_cached if use_cache else gen_full)
    out = f(params, enc)
    _ = np.asarray(out)  # host fetch forces execution through the tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(params, enc)
    _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, batch * max_len / dt, dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-len", type=int, default=77)
    ap.add_argument("--samples", type=int, default=3,
                    help="nucleus samples per clip (scales reported clips/s)")
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--xl", action="store_true")
    args = ap.parse_args(argv)
    cps, tps, dt = bench(args.batch, args.max_len, not args.no_cache,
                         args.xl)
    tag = "xl" if args.xl else "med"
    print(json.dumps({
        "metric": f"narrator_clips_per_sec_{tag}"
                  f"{'' if not args.no_cache else '_nocache'}",
        "value": round(cps / args.samples, 2), "unit": "clips/s/chip",
        "tokens_per_sec": round(tps, 1),
        "batch_s": round(dt, 3), "samples_per_clip": args.samples,
        "kv_cache": not args.no_cache,
    }))


if __name__ == "__main__":
    main()
