"""Serving subsystem: micro-batcher semantics + HTTP server end-to-end.

Beyond-parity production component (the reference has no serving path);
tests run the full stack — tiny CLIP, jitted encoders, batcher threads,
stdlib HTTP server on an ephemeral port — on the CPU backend.
"""

import base64
import concurrent.futures as cf
import json
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avion_tpu.serve.batcher import MicroBatcher


# ---------------------------------------------------------------------------
# MicroBatcher unit tests
# ---------------------------------------------------------------------------


def test_batcher_returns_results_in_order():
    mb = MicroBatcher(lambda xs: [x * 2 for x in xs], max_batch=8,
                      max_wait_ms=5)
    try:
        futs = [mb.submit(i) for i in range(20)]
        assert [f.result(timeout=10) for f in futs] == [i * 2
                                                        for i in range(20)]
    finally:
        mb.close()


def test_batcher_coalesces_concurrent_requests():
    seen_sizes = []

    def fn(xs):
        seen_sizes.append(len(xs))
        time.sleep(0.01)  # hold the device so the queue can fill
        return xs

    mb = MicroBatcher(fn, max_batch=16, max_wait_ms=20)
    try:
        with cf.ThreadPoolExecutor(32) as pool:
            list(pool.map(lambda i: mb(i, timeout=30), range(64)))
        assert max(seen_sizes) > 1, seen_sizes  # batching actually happened
        m = mb.metrics()
        assert m["requests"] == 64
        assert m["batches"] == len(seen_sizes)
        assert m["mean_batch"] > 1.0
    finally:
        mb.close()


def test_batcher_propagates_exceptions_per_batch():
    def fn(xs):
        if any(x < 0 for x in xs):
            raise ValueError("negative")
        return xs

    mb = MicroBatcher(fn, max_batch=1, max_wait_ms=0)
    try:
        assert mb(3, timeout=10) == 3
        with pytest.raises(ValueError):
            mb(-1, timeout=10)
        # batcher survives the failed batch
        assert mb(5, timeout=10) == 5
    finally:
        mb.close()


def test_batcher_respects_max_batch():
    sizes = []

    def fn(xs):
        sizes.append(len(xs))
        time.sleep(0.005)
        return xs

    mb = MicroBatcher(fn, max_batch=4, max_wait_ms=50)
    try:
        with cf.ThreadPoolExecutor(16) as pool:
            list(pool.map(lambda i: mb(i, timeout=30), range(32)))
        assert max(sizes) <= 4
    finally:
        mb.close()


# ---------------------------------------------------------------------------
# HTTP server end-to-end
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def served():
    from avion_tpu.models.clip import CLIP
    from avion_tpu.serve.server import (ClipService, make_server,
                                        serve_forever_in_thread)

    model = CLIP(
        embed_dim=32, image_size=32, patch_size=16, num_frames=4,
        vision_width=64, vision_layers=2, vision_heads=2,
        context_length=13, vocab_size=49408, text_width=32, text_heads=2,
        text_layers=2, use_flash=False, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    video = jnp.zeros((2, 4, 32, 32, 3))
    text = jnp.zeros((2, 13), jnp.int32)
    params = model.init(rng, video, text)["params"]
    service = ClipService(model, params, batch=8, max_wait_ms=1.0)
    server = make_server(service, port=0)
    serve_forever_in_thread(server)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, service, model, params
    server.shutdown()
    service.close()


def _post(url, path, obj):
    req = urllib.request.Request(
        url + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def _get(url, path):
    with urllib.request.urlopen(url + path, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_health(served):
    url = served[0]
    code, body = _get(url, "/health")
    assert code == 200 and body["status"] == "ok"
    assert body["platform"] == "cpu"


def test_embed_text_matches_direct_encode(served):
    url, service, model, params = served
    code, body = _post(url, "/v1/embed/text",
                       {"texts": ["a person cuts an onion", "#C C opens"]})
    assert code == 200
    emb = np.asarray(body["embeddings"], np.float32)
    assert emb.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-4)

    from avion_tpu.data.tokenizer import tokenize

    toks = tokenize(["a person cuts an onion", "#C C opens"],
                    context_length=13)
    direct = np.asarray(model.apply({"params": params}, jnp.asarray(toks),
                                    method=model.encode_text), np.float32)
    direct = direct / np.linalg.norm(direct, axis=-1, keepdims=True)
    np.testing.assert_allclose(emb, direct, atol=2e-3)


def test_embed_video_frames_b64(served):
    url, service, model, params = served
    rs = np.random.RandomState(0)
    frames = rs.randint(0, 255, (3, 4, 32, 32, 3), np.uint8)
    code, body = _post(url, "/v1/embed/video", {
        "frames_b64": base64.b64encode(frames.tobytes()).decode(),
        "shape": list(frames.shape)})
    assert code == 200
    emb = np.asarray(body["embeddings"], np.float32)
    assert emb.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-4)

    from avion_tpu.data.transforms import normalize_video

    v = normalize_video(jnp.asarray(frames), dtype=jnp.float32)
    direct = np.asarray(model.apply({"params": params}, v,
                                    method=model.encode_image), np.float32)
    direct = direct / np.linalg.norm(direct, axis=-1, keepdims=True)
    np.testing.assert_allclose(emb, direct, atol=2e-3)


def test_similarity_endpoint(served):
    url = served[0]
    rs = np.random.RandomState(1)
    frames = rs.randint(0, 255, (2, 4, 32, 32, 3), np.uint8)
    code, body = _post(url, "/v1/similarity", {
        "texts": ["opens a drawer", "slices bread", "pets the dog"],
        "frames_b64": base64.b64encode(frames.tobytes()).decode(),
        "shape": list(frames.shape)})
    assert code == 200
    logits = np.asarray(body["logits"])
    assert logits.shape == (2, 3)
    assert np.isfinite(logits).all()


def test_embed_video_from_path(served, tmp_path):
    url, service, model, _ = served
    from avion_tpu.data.video_reader import native_available, write_test_video

    if not native_available():
        pytest.skip("native decode library unavailable")
    p = str(tmp_path / "clip.mp4")
    write_test_video(p, n_frames=30, w=48, h=40)
    code, body = _post(url, "/v1/embed/video", {"paths": [p]})
    assert code == 200
    emb = np.asarray(body["embeddings"], np.float32)
    assert emb.shape == (1, 32)
    # decode helper honors model geometry
    clip = service.decode_clip(p)
    assert clip.shape == (4, 32, 32, 3) and clip.dtype == np.uint8


def test_bad_requests_get_400_not_500(served):
    url = served[0]
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, "/v1/embed/video", {"shape": [1, 4, 32, 32, 3]})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, "/v1/embed/video", {
            "frames_b64": "", "shape": [1, 2, 32, 32, 3]})  # wrong T
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, "/v1/nope", {})
    assert e.value.code == 404


def test_metrics_endpoint_reports_batching(served):
    url = served[0]

    def one(i):
        return _post(url, "/v1/embed/text", {"texts": [f"caption {i}"]})

    with cf.ThreadPoolExecutor(8) as pool:
        list(pool.map(one, range(16)))
    code, body = _get(url, "/metrics")
    assert code == 200
    assert body["text"]["requests"] >= 16
    assert body["text"]["batches"] >= 1


def test_narrate_endpoint(served):
    """/v1/narrate over a tiny LaViLa narrator with cached decoding."""
    from avion_tpu.models.lavila import LavilaNarrator
    from avion_tpu.serve.server import NarrateService, make_server, \
        serve_forever_in_thread
    from avion_tpu.tools.narrator import lavila_captioner

    narr = LavilaNarrator(
        image_size=16, patch_size=8, num_frames=2, vision_width=32,
        vision_layers=1, vision_heads=2, vocab_size=64, text_width=32,
        text_layers=2, text_heads=2, cross_freq=2, num_img_queries=4,
        max_positions=32, pool_heads=2, pool_dim_head=8,
        dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = narr.init(rng, jnp.zeros((1, 2, 16, 16, 3)),
                       jnp.zeros((1, 4), jnp.int32))["params"]

    class FakeTok:
        eos_token_id = 1

        def decode(self, ids):
            return " ".join(f"w{i}" for i in ids)

    cap = lavila_captioner(model=narr, params=params, tokenizer=FakeTok(),
                           num_samples=2, max_len=6)
    ns = NarrateService(cap, clip_length=2, image_size=16)
    server = make_server(served[1], port=0, narrate=ns)
    serve_forever_in_thread(server)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        frames = np.random.RandomState(0).randint(
            0, 255, (2, 2, 16, 16, 3), np.uint8)
        code, body = _post(url, "/v1/narrate", {
            "frames_b64": base64.b64encode(frames.tobytes()).decode(),
            "shape": list(frames.shape)})
        assert code == 200
        caps = body["narrations"]
        assert len(caps) == 2 and len(caps[0]) == 2
        assert all(isinstance(c, str) for c in caps[0])
        code, m = _get(url, "/metrics")
        assert m["narrate"]["requests"] == 2
    finally:
        server.shutdown()
        ns.close()


def test_mesh_sharded_service(served):
    """ClipService over the 8-device CPU mesh: encoders shard eval
    batches over the data axes; results match the unmeshed service."""
    from avion_tpu.parallel import make_mesh
    from avion_tpu.serve.server import ClipService

    _, plain, model, params = served
    mesh = make_mesh(data=4, fsdp=2, tensor=1)
    svc = ClipService(model, params, batch=8, max_wait_ms=0.5, mesh=mesh)
    try:
        texts = [f"caption number {i}" for i in range(5)]
        a = np.stack([svc.text_batcher.submit(t).result(60)
                      for t in texts])
        b = np.stack([plain.text_batcher.submit(t).result(60)
                      for t in texts])
        np.testing.assert_allclose(a, b, atol=2e-3)
    finally:
        svc.close()


def test_classify_endpoint(served):
    """Zero-shot classification: template-ensemble classifier over the
    clip embedding; classifier cached per label set."""
    url, service, model, params = served
    rs = np.random.RandomState(3)
    frames = rs.randint(0, 255, (2, 4, 32, 32, 3), np.uint8)
    body_req = {
        "labels": ["open door", "cut onion", "wash hands"],
        "frames_b64": base64.b64encode(frames.tobytes()).decode(),
        "shape": list(frames.shape)}
    code, body = _post(url, "/v1/classify", body_req)
    assert code == 200
    probs = np.asarray(body["probs"])
    assert probs.shape == (2, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    assert body["top"][0]["label"] in body_req["labels"]
    # cache hit path (same labels again)
    code, body2 = _post(url, "/v1/classify", body_req)
    assert code == 200
    np.testing.assert_allclose(np.asarray(body2["probs"]), probs,
                               atol=1e-5)
    assert len(service._clf_cache) == 1
    # bad request: empty labels
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, "/v1/classify", {"labels": [],
                                    "frames_b64": body_req["frames_b64"],
                                    "shape": body_req["shape"]})
    assert e.value.code == 400


def test_resolve_media_path_confines_to_root(tmp_path):
    from avion_tpu.serve.server import resolve_media_path

    root = tmp_path / "media"
    (root / "sub").mkdir(parents=True)
    (root / "sub" / "a.mp4").write_bytes(b"x")
    # no root configured: pass-through (loopback-only trust model)
    assert resolve_media_path("/etc/hostname", None) == "/etc/hostname"
    # relative and absolute-style paths resolve under the root
    got = resolve_media_path("sub/a.mp4", str(root))
    assert got == str(root / "sub" / "a.mp4")
    assert resolve_media_path("/sub/a.mp4", str(root)) == got
    # escapes are rejected
    for bad in ("../outside", "sub/../../x", "/../etc/passwd"):
        with pytest.raises(ValueError):
            resolve_media_path(bad, str(root))


def test_resolve_media_path_rejects_symlink_escape(tmp_path):
    from avion_tpu.serve.server import resolve_media_path

    root = tmp_path / "media"
    root.mkdir()
    (tmp_path / "secret").mkdir()
    (root / "link").symlink_to(tmp_path / "secret")
    with pytest.raises(ValueError):
        resolve_media_path("link/x.mp4", str(root))


def test_int8_weight_service_serves_close_embeddings():
    """ClipService(weight_dtype='int8') serves /v1/embed/text with
    embeddings close to the exact service (weight-only PTQ bound)."""
    from avion_tpu.models.clip import CLIP
    from avion_tpu.serve.server import ClipService

    model = CLIP(
        embed_dim=32, image_size=32, patch_size=16, num_frames=4,
        vision_width=64, vision_layers=2, vision_heads=2,
        context_length=13, vocab_size=49408, text_width=32, text_heads=2,
        text_layers=2, use_flash=False, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    video = jnp.zeros((2, 4, 32, 32, 3))
    text = jnp.zeros((2, 13), jnp.int32)
    params = model.init(rng, video, text)["params"]
    exact = ClipService(model, params, batch=4, max_wait_ms=0.5)
    quant = ClipService(model, params, batch=4, max_wait_ms=0.5,
                        weight_dtype="int8")
    try:
        req = {"texts": ["a person chops vegetables"]}
        a = np.asarray(exact.embed_text(req)["embeddings"])
        b = np.asarray(quant.embed_text(req)["embeddings"])
        cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.98, cos
    finally:
        exact.close()
        quant.close()
