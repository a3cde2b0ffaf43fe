"""Serving throughput benchmark: end-to-end HTTP -> micro-batcher ->
jitted encoders on the attached device.

Floods the server with concurrent single-item requests (the serving
worst case — coalescing is what keeps the MXU busy) and reports
embeds/s + latency percentiles straight from the server's own
/metrics, plus client-side wall numbers.

Usage: python -m avion_tpu.tools.bench_serve [--model CLIP_VITB16]
    [--batch 32] [--texts 512] [--videos 64] [--threads 16]
"""

from __future__ import annotations

import argparse
import base64
import concurrent.futures as cf
import json
import time
import urllib.request

import numpy as np


def _post(url, path, obj, timeout=300):
    req = urllib.request.Request(
        url + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from avion_tpu.models import create_model
    from avion_tpu.serve.server import (ClipService, make_server,
                                        serve_forever_in_thread)

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="CLIP_VITB16")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--texts", type=int, default=512)
    ap.add_argument("--videos", type=int, default=64)
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--weights", default="bf16",
                    help="encoder weight storage: bf16 (exact) | int8 "
                         "(weight-only quantized) | f32")
    args = ap.parse_args(argv)

    model = create_model(args.model, num_frames=args.frames,
                         use_flash_attn=True)
    rng = jax.random.PRNGKey(0)
    video0 = jnp.zeros((2, args.frames, model.image_size, model.image_size,
                        3), jnp.bfloat16)
    text0 = jnp.zeros((2, model.context_length), jnp.int32)
    params = jax.jit(model.init)(rng, video0, text0)["params"]
    service = ClipService(model, params, batch=args.batch, max_wait_ms=3.0,
                          weight_dtype=args.weights)
    server = make_server(service, port=0)
    th = serve_forever_in_thread(server)
    url = f"http://127.0.0.1:{server.server_address[1]}"

    # warm both towers (compile; generous timeout for first compiles)
    _post(url, "/v1/embed/text", {"texts": ["warmup"]}, timeout=600)
    rs = np.random.RandomState(0)
    frame = rs.randint(0, 255, (1, args.frames, model.image_size,
                                model.image_size, 3), np.uint8)
    payload = {"frames_b64": base64.b64encode(frame.tobytes()).decode(),
               "shape": list(frame.shape)}
    _post(url, "/v1/embed/video", payload, timeout=600)

    # text flood: 1-item concurrent requests
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(args.threads) as pool:
        list(pool.map(
            lambda i: _post(url, "/v1/embed/text",
                            {"texts": [f"a person does action {i}"]}),
            range(args.texts)))
    text_dt = time.perf_counter() - t0

    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(args.threads) as pool:
        list(pool.map(lambda i: _post(url, "/v1/embed/video", payload),
                      range(args.videos)))
    video_dt = time.perf_counter() - t0

    m = service.metrics()
    print(json.dumps({
        "metric": "serving_throughput",
        "text_embeds_per_sec": round(args.texts / text_dt, 1),
        "video_embeds_per_sec": round(args.videos / video_dt, 1),
        "unit": "requests/s (1-item requests)",
        "text_mean_batch": round(m["text"]["mean_batch"], 2),
        "video_mean_batch": round(m["video"]["mean_batch"], 2),
        "text_p95_ms": m["text"]["latency_p95_ms"],
        "video_p95_ms": m["video"]["latency_p95_ms"],
        "device": str(jax.devices()[0]),
    }))
    server.shutdown()
    server.server_close()
    th.join(timeout=5)
    service.close()
    time.sleep(0.5)  # let handler threads drain before teardown


if __name__ == "__main__":
    main()
