#!/usr/bin/env python
"""Benchmark: CLIP ViT-B/16 contrastive pretrain step throughput on TPU.

Matches the reference headline config: 4-frame clips, 224px, batch 256
(scripts/main_lavila_pretrain.py:78 --clip-length default 4, batch
256/GPU on 24GB A5000s).  Batch 256 fits one v5e chip via bf16
optimizer state, uint8 in-stem normalization, and remat_policy
save_attn_k10 (attention residuals saved for 10/12 layers; the other
two re-run their forward kernel in the backward) — XLA memory
analysis: temp 14.34 GB + args 1.35 GB of 16 GB HBM.

Output contract: the driver parses the LAST JSON line on stdout.  The
flagship result line is printed (and flushed) IMMEDIATELY after the
first successful ladder run, then re-printed progressively enriched
(live duty fields, parity geometry) as later segments complete — so a
driver timeout at ANY point after the first ladder still captures a
parseable record.  A global deadline (AVION_BENCH_DEADLINE_S, default
1800 s) gates every segment, including the chip-health wait.

Baseline derivation: the reference trains Ego4D ViT-B for 5 epochs over
4.0M clips in ~130 GPU-hours on 8x A5000 (docs/MODEL_ZOO.md:52,
README.md:20-24) => 20M clips / 468,000 GPU-s = 42.7 clips/s/GPU.

MFU: model FLOPs (3x forward matmul FLOPs, remat recompute excluded by
convention) / v5e bf16 peak (197 TFLOP/s).
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_CLIPS_PER_SEC_PER_GPU = 42.7

from avion_tpu.core.flops import V5E_PEAK_FLOPS, clip_fwd_flops


def model_fwd_flops():
    """ViT-B/16 forward matmul FLOPs per clip (shared helper)."""
    return clip_fwd_flops()


def build(batch, remat_policy="save_attn", model_name="CLIP_VITB16",
          accum=1, loss_type="clip"):
    from avion_tpu.core.config import OptimConfig
    from avion_tpu.core.train_state import TrainState
    from avion_tpu.models import create_model
    from avion_tpu.optim import build_optimizer
    from avion_tpu.train.steps import (
        make_clip_accum_train_step,
        make_clip_train_step,
    )

    model = create_model(
        model_name, num_frames=4, use_grad_checkpointing=True,
        use_flash_attn=True, project_embed_dim=512,
        input_norm="openai", remat_policy=remat_policy,
        use_logit_bias=(loss_type == "siglip"),
        temperature_init=0.1 if loss_type == "siglip" else 0.07,
    )
    rng = jax.random.PRNGKey(0)
    # uint8 batches, like the real pipeline feeds (normalization runs
    # inside the rematerialized stem)
    video = jnp.zeros((batch, 4, 224, 224, 3), jnp.uint8)
    text = jnp.zeros((batch, 77), jnp.int32)
    params = jax.jit(model.init)(rng, video, text)["params"]
    cfg = OptimConfig(optimizer="adamw", lr=4e-5, warmup_epochs=1, epochs=5,
                      grad_clip_norm=1.0, state_dtype="bfloat16")
    tx, _ = build_optimizer(cfg, params, niter_per_ep=1000)
    state = TrainState.create(params, tx)
    if accum > 1:
        # cached-feature accumulation: `batch` is the FULL contrastive
        # batch, scanned as `accum` microbatches (exact global-batch
        # loss at 1/accum activation memory — steps.py)
        step = jax.jit(
            make_clip_accum_train_step(model, tx, update_freq=accum,
                                       loss_type=loss_type),
            donate_argnums=(0,))
    else:
        step = jax.jit(make_clip_train_step(model, tx, loss_type=loss_type),
                       donate_argnums=(0,))
    batch_data = {
        "video": jax.device_put(
            jax.random.randint(rng, (batch, 4, 224, 224, 3), 0, 256,
                               jnp.uint8)),
        "text": jax.device_put(
            jax.random.randint(rng, (batch, 77), 0, 49408, jnp.int32)),
    }
    if accum > 1:
        batch_data = jax.tree_util.tree_map(
            lambda x: x.reshape(accum, x.shape[0] // accum, *x.shape[1:]),
            batch_data)
    return step, state, batch_data


def bench_batch(batch, warmup=3, iters=20, remat_policy="save_attn",
                model_name="CLIP_VITB16", accum=1, loss_type="clip"):
    step, state, data = build(batch, remat_policy, model_name, accum,
                              loss_type)
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
    return batch / dt, dt


def selfcheck():
    """On-TPU kernel numerics: flash attention (fwd + grads) vs the XLA
    reference at model shapes — closes the gap left by interpret-mode
    CPU tests (kernel behavior can differ on real Mosaic lowering)."""
    import numpy as np

    from avion_tpu.ops.attention import xla_attention
    from avion_tpu.ops.flash_attention import flash_attention

    # Production dtype is bf16; on real TPUs the MXU multiplies in bf16
    # at DEFAULT precision, so the comparison floor is bf16 rounding
    # (~4e-3 on O(1) values) regardless of kernel correctness.  Compare
    # bf16 kernels against an f32 XLA reference at bf16 tolerances.
    rng = jax.random.PRNGKey(7)
    ks = jax.random.split(rng, 3)
    for (b, s, h, d, causal) in ((4, 785, 12, 64, False),
                                 (8, 77, 8, 64, True)):
        q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)
        qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))

        def loss_f(q, k, v):
            o = flash_attention(q, k, v, causal=causal)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def loss_r(q, k, v):
            o = xla_attention(q, k, v, causal=causal)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        out = jax.jit(lambda q, k, v: flash_attention(q, k, v,
                                                      causal=causal))(q, k, v)
        ref = jax.jit(lambda q, k, v: xla_attention(q, k, v,
                                                    causal=causal))(qf, kf, vf)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref), atol=3e-2, rtol=3e-2)
        g1 = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))(q, k, v)
        g2 = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(qf, kf, vf)
        for a, bb in zip(g1, g2):
            a = np.asarray(a, np.float32)
            bb = np.asarray(bb)
            # grads accumulate S-length sums; compare with a scale-aware
            # tolerance
            tol = 3e-2 * max(1.0, float(np.abs(bb).max()))
            assert np.abs(a - bb).max() < tol, (
                f"grad mismatch {np.abs(a - bb).max()} vs tol {tol}")
        print(f"selfcheck ok: b={b} s={s} h={h} causal={causal}",
              file=sys.stderr)

    # fused-qkv entry (the train step's actual path): on-chip parity
    # vs the packed entry, fwd + grads, including pad-row zeroing
    from avion_tpu.ops.flash_attention import flash_attention_fused_qkv

    b, s, h, d = 4, 785, 12, 64
    w = h * d
    s_pad = (s + 127) // 128 * 128
    qkv = jax.random.normal(ks[0], (b, s_pad, 3 * w), jnp.bfloat16)

    def loss_f(qkv):
        o = flash_attention_fused_qkv(qkv, h, s)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_r(qkv):
        unpack = lambda t: t.reshape(b, s, h, d)
        o = xla_attention(unpack(qkv[:, :s, :w].astype(jnp.float32)),
                          unpack(qkv[:, :s, w : 2 * w].astype(jnp.float32)),
                          unpack(qkv[:, :s, 2 * w :].astype(jnp.float32)))
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g1 = jax.jit(jax.grad(loss_f))(qkv)
    g2 = jax.jit(jax.grad(loss_r))(qkv)
    tol = 3e-2 * max(1.0, float(np.abs(np.asarray(g2[:, :s])).max()))
    assert np.abs(np.asarray(g1[:, :s], np.float32)
                  - np.asarray(g2[:, :s])).max() < tol
    assert float(np.abs(np.asarray(g1[:, s:], np.float32)).max()) == 0.0
    print("selfcheck ok: fused-qkv entry", file=sys.stderr)


def wait_for_chip(max_wait_s=2100.0, probe_timeout_s=120.0,
                  interval_s=150.0):
    """Wait out a wedged TPU tunnel before touching the backend.

    A failed kernel can wedge the tunneled chip for ~30 min, during
    which backend init hangs rather than erroring.  Probe with a tiny
    jitted matmul in a SUBPROCESS (backend init is once-per-process, so
    the parent must not touch jax devices until a probe succeeds) and
    retry within a bounded window.  Returns True when healthy, False
    when the window expires — callers must NOT touch the backend
    in-process after a False return (blocked RPCs defer signals and
    hang unkillably); main() retries within its budget and otherwise
    records the sentinel and exits.  Skipped on CPU backends (tests).
    The caller passes the window; AVION_BENCH_MAX_WAIT_S is applied
    once at main()'s initial wait, not here.
    """
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        return True
    probe = ("import jax, jax.numpy as jnp; "
             "x = jnp.ones((128, 128)); "
             "print(float((x @ x).sum()))")
    deadline = time.monotonic() + max_wait_s
    first = True
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               timeout=probe_timeout_s, capture_output=True)
            if r.returncode == 0:
                if not first:
                    print("chip probe ok; proceeding", file=sys.stderr)
                return True
            detail = r.stderr.decode(errors="replace").strip()[-200:]
        except subprocess.TimeoutExpired:
            detail = f"probe timed out after {probe_timeout_s:.0f}s"
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            print(f"chip probe never succeeded ({detail}); proceeding "
                  "anyway", file=sys.stderr)
            return False
        print(f"chip unhealthy ({detail}); retrying for up to "
              f"{remaining:.0f}s more", file=sys.stderr)
        first = False
        time.sleep(min(interval_s, remaining))


def main():
    # Global deadline: r4 lost its entire perf record to a driver
    # timeout because the single JSON line printed only at the very
    # end.  Every segment below is budget-gated against this deadline
    # and the driver line is (re-)printed after each completed segment.
    t_start = time.monotonic()
    deadline_s = float(os.environ.get("AVION_BENCH_DEADLINE_S", 1800.0))

    def remaining():
        return deadline_s - (time.monotonic() - t_start)

    # chip-health wait is charged to the same budget, capped to half of
    # it: long enough to outlast most tunnel wedges (~10-30 min), while
    # guaranteeing the flagship ladder (~4 min) still fits — and the
    # startup sentinel is on the wire either way.  If the chip is still
    # wedged, keep retrying with what's left rather than entering the
    # ladder (whose blocked RPCs would hang unkillably until the
    # driver's timeout): a wedge that clears late still gets a
    # flagship number, and one that never clears exits cleanly with
    # the sentinel as the round's record.  AVION_BENCH_MAX_WAIT_S is a
    # TOTAL-wait operator override (either direction): when set, one
    # bounded wait replaces the retry loop entirely.
    env_wait = os.environ.get("AVION_BENCH_MAX_WAIT_S")
    if env_wait is not None:
        healthy = wait_for_chip(
            max_wait_s=max(0.0, min(float(env_wait), remaining())))
    else:
        healthy = wait_for_chip(max_wait_s=min(2100.0, remaining() / 2.0))
        while not healthy and remaining() > 240:
            healthy = wait_for_chip(
                max_wait_s=min(600.0, remaining() - 240))
    do_selfcheck = "--selfcheck" in sys.argv
    if do_selfcheck:
        sys.argv.remove("--selfcheck")
    # The default benches CLIP_VITB16_H128, the flagship TPU geometry
    # (6 heads of dim 128 — same width/params/FLOPs as the reference's
    # 12x64 ViT-B, but every attention matmul contracts over the MXU's
    # full 128 lanes; the projection-level head packing that breaks the
    # depth-64 attention floor, docs/PERF.md).  The reference's 12-head
    # parity geometry (required for released-weight import) is measured
    # too and embedded in the same JSON line as parity_* fields so the
    # apples-to-apples comparison stays on record.
    model_name = "CLIP_VITB16_H128"
    usage = ("usage: bench.py [--model NAME] [--batch N] [--accum M] "
             "[--loss clip|siglip] [--selfcheck]")

    def _flag(name, default, conv):
        if name not in sys.argv:
            return default
        i = sys.argv.index(name)
        if i + 1 >= len(sys.argv):
            raise SystemExit(usage)
        return conv(sys.argv[i + 1])

    explicit_model = "--model" in sys.argv
    model_name = _flag("--model", model_name, str)
    # opt-in variant knobs (measurement runs, not the driver metric):
    # --accum M scans M cached-feature microbatches (exact global-batch
    # loss at 1/M activation memory; lets e.g. batch 512 fit one chip);
    # --loss siglip benches the sigmoid ring objective; --batch N pins
    # a single batch size instead of the fallback ladder
    accum = _flag("--accum", 1, int)
    loss_type = _flag("--loss", "clip", str)
    only_batch = _flag("--batch", 0, int)
    tag = "vitb16" if model_name == "CLIP_VITB16" else model_name.lower()
    if loss_type != "clip":
        tag += f"_{loss_type}"
    if accum > 1:
        tag += f"_accum{accum}"
    # batch 256 (the reference-named config) runs with save_attn_k10
    # (memory-probed: k10 compiles to the same 14.34 GB temp as k9 —
    # one less recomputed layer for free; k11 needs 15.14 GB and OOMs);
    # smaller batches keep all attention residuals.  H128 geometries
    # halve the lse residual (one head-group per head), which frees
    # enough HBM that b256 keeps ALL attention residuals (measured:
    # 210.93 clips/s with save_attn vs 208.95 with k10).
    b256_policy = ("save_attn" if model_name.endswith("_H128")
                   else "save_attn_k10")
    ladder = ((256, b256_policy), (224, "save_attn"),
              (192, "save_attn"), (128, "save_attn"),
              (64, "save_attn"), (32, "save_attn"))
    if only_batch:
        ladder = ((only_batch, "save_attn" if only_batch < 256 or accum > 1
                   else b256_policy),)
    def run_ladder(ladder, model_name, tag, fwd_flops=None):
        for batch, policy in ladder:
            try:
                clips_per_sec, dt = bench_batch(
                    batch, remat_policy=policy, model_name=model_name,
                    accum=accum, loss_type=loss_type)
                mfu = (clips_per_sec * 3 * (fwd_flops or model_fwd_flops())
                       / V5E_PEAK_FLOPS)
                return {
                    "metric":
                        f"clips_per_sec_per_chip_{tag}_pretrain_b{batch}",
                    "value": round(clips_per_sec, 2),
                    "unit": "clips/s/chip",
                    "vs_baseline": round(
                        clips_per_sec / BASELINE_CLIPS_PER_SEC_PER_GPU, 3),
                    "mfu": round(mfu, 4),
                    "step_ms": round(dt * 1e3, 1),
                }
            except Exception as e:  # OOM at this batch: halve and retry
                msg = str(e).lower()
                if any(t in msg for t in ("resource_exhausted",
                                          "out of memory", "hbm", "compile")):
                    print(f"batch {batch} failed ({type(e).__name__}), "
                          "retrying smaller", file=sys.stderr)
                    continue
                raise
        return None

    # sentinel first: a wedged tunnel can hang the in-process ladder
    # with no way to interrupt it (blocked RPCs defer signal handlers),
    # so the minimum parseable record must already be on the wire; every
    # later print supersedes it
    print(json.dumps({
        "metric": f"clips_per_sec_per_chip_{tag}_pretrain",
        "value": 0.0, "unit": "clips/s/chip", "vs_baseline": 0.0,
        "status": "startup_sentinel" if healthy else "chip_unreachable"}),
        flush=True)
    if not healthy:
        print("chip never became healthy within the budget; recording "
              "the sentinel only", file=sys.stderr)
        return
    if do_selfcheck:
        # in-process chip touch like the ladder: must sit behind the
        # health gate and the sentinel
        selfcheck()
    result = run_ladder(ladder, model_name, tag)
    if result is None:
        print(json.dumps({"metric": "clips_per_sec_per_chip_vitb16_pretrain",
                          "value": 0.0, "unit": "clips/s/chip",
                          "vs_baseline": 0.0}), flush=True)
        return
    # flagship line on the wire FIRST — the driver parses the last JSON
    # line, so any kill from here on still records this round
    print(json.dumps(result), flush=True)
    default_run = not explicit_model and accum == 1 and loss_type == "clip"
    if default_run and os.environ.get("AVION_BENCH_SKIP_LIVE") != "1" \
            and remaining() > 180:
        # MEASURED end-to-end duty cycle: H.264 decode in worker
        # processes concurrent with jitted stepping, one live run — the
        # reference's data_time/batch_time starvation meter
        # (main_lavila_pretrain.py:767-797); replaces the projection
        # arithmetic of earlier rounds.  replay_duty_cycle is the same
        # loop fed from pre-decoded batches (decode CPU excluded): the
        # duty a host with enough decode cores reaches — its residual
        # is the tunnel H2D floor on this CI host (docs/PERF.md).
        #
        # Runs as a SUBPROCESS with retries: the tunnel occasionally
        # drops a remote_compile mid-flight, and a wedged backend from
        # a failed attempt must not poison this process's chip handle
        # (or cost the round its duty fields).  Retries are capped by
        # the remaining budget, not a fixed count x 1500 s.
        import tempfile

        live = None
        live_root = os.path.join(tempfile.gettempdir(), "avion_bench_pipe")
        cmd = [sys.executable, "-m", "avion_tpu.tools.bench_pipeline",
               "--model", model_name, "--batch", "64", "--steps", "10",
               "--replay", "--echo-also", "8", "--root", live_root]
        for attempt in range(3):
            if remaining() < 180:
                print("live duty: budget exhausted, skipping further "
                      "attempts", file=sys.stderr)
                break
            if attempt:
                wait_for_chip(max_wait_s=min(600.0, remaining() / 3.0))
            try:
                r = subprocess.run(cmd, capture_output=True,
                                   timeout=max(60.0, min(900.0,
                                                         remaining() - 60.0)))
            except subprocess.TimeoutExpired:
                print(f"live duty attempt {attempt + 1} timed out",
                      file=sys.stderr)
                continue
            sys.stderr.write(r.stderr.decode(errors="replace")[-2000:])
            if r.returncode == 0:
                try:
                    line = [l for l in r.stdout.decode().splitlines()
                            if l.strip().startswith("{")][-1]
                    live = json.loads(line)
                    break
                except (IndexError, ValueError) as e:
                    print(f"live duty attempt {attempt + 1}: unparseable "
                          f"output ({e})", file=sys.stderr)
            else:
                print(f"live duty attempt {attempt + 1} failed "
                      f"rc={r.returncode}", file=sys.stderr)
        if live is not None:
            result["duty_cycle"] = live["duty_cycle"]
            result["e2e_clips_per_sec"] = live["value"]
            result["data_stall_ms"] = round(live["data_time_s"] * 1e3, 1)
            result["decode_clips_per_sec_per_core"] = live.get(
                "decode_clips_per_sec_per_core")
            result["host_cores"] = live["host_cores"]
            result["live_batch"] = live.get("live_batch", 64)
            if "replay_pre_decoded" in live:
                result["replay_duty_cycle"] = (
                    live["replay_pre_decoded"]["duty_cycle"])
            if "echoed" in live:
                # data-echoing lever measured live (data.echo_factor)
                result["echo_duty_cycle"] = live["echoed"]["duty_cycle"]
                result["echo_clips_per_sec"] = (
                    live["echoed"]["clips_per_sec"])
                result["echo_factor"] = live["echoed"]["echo_factor"]
            # enriched line supersedes the flagship-only one
            print(json.dumps(result), flush=True)
        else:
            print("live duty segment did not complete", file=sys.stderr)
    if default_run and remaining() > 150:
        # the reference's 12-head parity geometry (the weight-import
        # architecture), embedded in the same line; best-effort — the
        # flagship number stands even if this fails
        try:
            parity = run_ladder(
                ((256, "save_attn_k10"), (224, "save_attn")),
                "CLIP_VITB16", "vitb16")
            if parity is not None:
                result["parity_metric"] = parity["metric"]
                result["parity_value"] = parity["value"]
                result["parity_mfu"] = parity["mfu"]
                result["parity_vs_baseline"] = parity["vs_baseline"]
                print(json.dumps(result), flush=True)
        except Exception as e:
            print(f"parity-geometry bench failed: {e}", file=sys.stderr)
    elif default_run:
        print("parity segment skipped: budget exhausted", file=sys.stderr)
    if default_run and os.environ.get("AVION_BENCH_SKIP_EXTRA") != "1":
        # secondary rows off the CLIP flagship path (regression canary
        # for VideoMAE + ViT-L), recorded to BENCH_EXTRA.json — kept
        # out of stdout so the driver still sees exactly one JSON line.
        # Each row is budget-gated and WRITTEN AS IT COMPLETES, so a
        # timeout can't erase earlier canaries.
        out = os.environ.get(
            "AVION_BENCH_EXTRA_PATH",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_EXTRA.json"))
        extras = []

        def flush_extras():
            # merge by metric with whatever a previous run recorded: a
            # budget-degraded run updates the rows it measured and
            # leaves the rest standing instead of erasing them
            rows = {}
            try:
                with open(out) as f:
                    lines = f.readlines()
            except OSError:
                lines = []
            for line in lines:
                try:  # per-line: one foreign/corrupt row must neither
                    r = json.loads(line)  # kill recording nor drop the
                    rows[str(r["metric"])] = r  # valid rows after it
                except (ValueError, KeyError, TypeError):
                    continue
            for r in extras:
                rows[r["metric"]] = r
            with open(out, "w") as f:
                f.write("\n".join(json.dumps(r) for r in rows.values())
                        + "\n")
            print(f"wrote {len(extras)} extra rows to {out} "
                  f"({len(rows)} total)", file=sys.stderr)

        if remaining() > 120:
            try:
                from avion_tpu.tools import bench_videomae

                b = 128
                r = bench_videomae.bench(b, model_name="VIDEOMAE_VITB16_H128")
                extras.append({
                    "metric":
                        f"clips_per_sec_per_chip_videomae_vitb16_h128_b{b}",
                    "value": round(r, 2), "unit": "clips/s/chip",
                    "vs_baseline": round(
                        r / bench_videomae.BASELINE_CLIPS_PER_SEC_PER_GPU,
                        3)})
                flush_extras()
            except Exception as e:
                print(f"videomae extra bench failed: {e}", file=sys.stderr)
        else:
            print("videomae extra skipped: budget exhausted",
                  file=sys.stderr)
        if remaining() > 120:
            try:
                vitl_flops = clip_fwd_flops(patch=14, vw=1024, vl=24,
                                            tw=768, tl=12)
                row = run_ladder(((64, "save_attn"), (32, "save_attn")),
                                 "CLIP_VITL14_H128", "vitl14_h128",
                                 fwd_flops=vitl_flops)
                if row is not None:
                    # ViT-L baseline: same data/epochs cost the reference
                    # 680 GPU-h vs ViT-B's 260 (docs/MODEL_ZOO.md:53-54)
                    # => 42.7 * 260/680 = 16.3 clips/s/GPU
                    vitl_base = BASELINE_CLIPS_PER_SEC_PER_GPU * 260.0 / 680.0
                    row["vs_baseline"] = round(row["value"] / vitl_base, 3)
                    extras.append(row)
                    flush_extras()
            except Exception as e:
                print(f"vitl extra bench failed: {e}", file=sys.stderr)
        else:
            print("vitl extra skipped: budget exhausted", file=sys.stderr)


if __name__ == "__main__":
    main()
