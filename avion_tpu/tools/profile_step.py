"""Device-op profiler for the train step (TPU).

Beyond the reference's wall-clock meters (SURVEY §5.1 — the reference
has no profiler integration at all): captures a ``jax.profiler`` trace
of N train steps and prints a per-step device-op breakdown aggregated
from the xplane/chrome-trace output — the tool that located the
slice/pad data-movement tax fixed in round 2 (docs/PERF.md item 6).

Usage::

    python -m avion_tpu.tools.profile_step [--batch 224] [--steps 2]
        [--model CLIP_VITB16] [--remat save_attn] [--out /tmp/steptrace]
        [--top 25]

Works through the remote-tunnel backend (the trace contains a
``/device:TPU`` process with per-fusion events, source lines, and
``tf_op`` scope paths).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import re
from collections import Counter, defaultdict


def analyze_trace(trace_dir: str, top: int = 25, steps: int = 1):
    """Parse the newest chrome trace under ``trace_dir``; returns
    (rows, total_ms) with rows = [(ms_per_step, count, kind, region,
    phase)] sorted by cost."""
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    d = json.load(gzip.open(paths[-1]))
    evs = d["traceEvents"]
    pids = {e["pid"]: e["args"].get("name") for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if n and ("TPU" in n or "GPU" in n)}
    agg = defaultdict(float)
    cnt = Counter()
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        n = e["name"]
        if n.startswith("jit_") or re.fullmatch(r"\d+", n):
            continue  # envelope events double-count their children
        a = e.get("args") or {}
        tf = a.get("tf_op", "")
        phase = "bwd" if "transpose(jvp" in tf else "fwd"
        if "encode_image" in tf or "visual" in tf:
            region = "vision"
        elif "encode_text" in tf or "textual" in tf:
            region = "text"
        else:
            region = "other"
        kind = re.sub(r"\.\d+.*$", "", n)
        key = (kind, region, phase)
        agg[key] += e.get("dur", 0) / 1e3 / steps
        cnt[key] += 1
    rows = [(ms, cnt[k] // steps, *k) for k, ms in agg.items()]
    rows.sort(reverse=True)
    return rows[:top], sum(agg.values())


def main(argv=None):
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=224)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--out", default="/tmp/avion_steptrace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace-only", default=None,
                    help="skip capture; analyze this existing trace dir")
    ap.add_argument("--model", default="CLIP_VITB16")
    ap.add_argument("--remat", default=None,
                    help="remat policy (default: save_attn; b256 needs "
                         "save_attn_k10)")
    args = ap.parse_args(argv)

    if args.trace_only is None:
        import importlib.util
        import os.path as osp

        spec = importlib.util.spec_from_file_location(
            "benchmod", osp.join(osp.dirname(osp.dirname(
                osp.dirname(osp.abspath(__file__)))), "bench.py"))
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        remat = args.remat or ("save_attn_k10" if args.batch >= 256
                               else "save_attn")
        step, state, data = m.build(args.batch, remat, args.model)
        rng = jax.random.PRNGKey(1)
        for _ in range(3):  # warm up + compile outside the trace
            state, metrics = step(state, data, rng)
        float(metrics["loss"])
        with jax.profiler.trace(args.out):
            for _ in range(args.steps):
                state, metrics = step(state, data, rng)
            float(metrics["loss"])
        trace_dir = args.out
    else:
        trace_dir = args.trace_only

    rows, total = analyze_trace(trace_dir, args.top, args.steps)
    print(f"device op time: {total:.1f} ms/step "
          f"(trace: {trace_dir})")
    print(f"{'ms/step':>9}  {'n':>4}  {'kind':<28} {'region':<8} phase")
    for ms, n, kind, region, phase in rows:
        print(f"{ms:9.1f}  {n:>4}  {kind[:28]:<28} {region:<8} {phase}")


if __name__ == "__main__":
    main()
