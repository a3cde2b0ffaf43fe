"""HTTP inference server over a CLIP dual encoder.

Beyond-parity production subsystem (the reference ships offline eval
scripts only).  stdlib-only: ``ThreadingHTTPServer`` front end, one
``MicroBatcher`` per modality feeding jit-compiled, fixed-shape encode
functions (``CLIPEncoders`` pads every device batch to its static batch
size, so each tower compiles exactly once).

Endpoints (JSON in/out):

- ``GET  /health``        → liveness + device/platform info
- ``GET  /metrics``       → request counts, batch histogram, latency pXX
- ``POST /v1/embed/text`` ``{"texts": [...]}`` → unit-norm embeddings
- ``POST /v1/embed/video`` ``{"paths": [...]}`` (server-side decode,
  uniform temporal sampling + center crop) or ``{"frames_b64": ...,
  "shape": [N,T,H,W,3]}`` (raw uint8 little-endian bytes, base64)
- ``POST /v1/similarity`` ``{"texts": [...], "paths"|"frames_b64": ...}``
  → temperature-scaled logits [n_videos, n_texts]
- ``POST /v1/classify`` ``{"labels": [...], "paths"|"frames_b64"}`` →
  zero-shot class probabilities (template-ensemble classifier, cached
  per label set)
- ``POST /v1/narrate`` ``{"paths"|"frames_b64": ...}`` → generated
  narrations per clip (with ``--narrator-checkpoint``; KV-cached LaViLa
  decoding)

Start::

    python -m avion_tpu.serve model.name=CLIP_VITB16 \
        pretrain_model=<ckpt.pt|orbax_dir> --port 8080 \
        [--host 0.0.0.0 --media-root /data/videos] \
        [--weights bf16|int8|f32] \
        [--mesh mesh.data=-1] [--narrator-checkpoint ckpt.pt]

Binds loopback by default; pass ``--host 0.0.0.0`` to expose it and
``--media-root`` to confine server-side 'paths' decoding to a directory.

``--mesh`` shards encode batches over the device mesh (multi-chip
serving); see docs/SERVING.md.
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

from avion_tpu.serve.batcher import MicroBatcher


def decode_clip(path: str, clip_length: int, size: int,
                start: Optional[float] = None,
                end: Optional[float] = None) -> np.ndarray:
    """Uniform temporal sampling + center crop-resize to a square
    input; returns [T, S, S, 3] uint8."""
    import cv2

    from avion_tpu.data.video_reader import VideoReader

    vr = VideoReader(path)
    try:
        fps = vr.get_avg_fps() or 30.0
        lo = int((start or 0.0) * fps)
        hi = int(end * fps) if end is not None else len(vr)
        hi = max(lo + 1, min(hi, len(vr)))
        ids = np.linspace(lo, hi - 1, clip_length).astype(int)
        frames = vr.get_batch(list(ids))
    finally:
        vr.close()
    t, h, w = frames.shape[:3]
    scale = size / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    out = np.empty((t, nh, nw, 3), np.uint8)
    for i in range(t):
        out[i] = cv2.resize(frames[i], (nw, nh),
                            interpolation=cv2.INTER_LINEAR)
    y0, x0 = (nh - size) // 2, (nw - size) // 2
    return out[:, y0 : y0 + size, x0 : x0 + size]


def resolve_media_path(path: str, media_root: Optional[str]) -> str:
    """Resolve a client-supplied path against the configured media root.

    With no root configured the server trusts its caller (loopback-only
    by default); with one, any path escaping the root is rejected so a
    network client cannot probe arbitrary server-side files."""
    if media_root is None:
        return path
    import os

    root = os.path.realpath(media_root)
    full = os.path.realpath(os.path.join(root, path.lstrip("/")))
    if full != root and not full.startswith(root + os.sep):
        raise ValueError(f"path escapes media root: {path!r}")
    return full


def clips_from_request(req: dict, clip_length: int, size: int,
                       media_root: Optional[str] = None) -> List[np.ndarray]:
    if "frames_b64" in req:
        shape = tuple(req["shape"])
        if len(shape) != 5 or shape[1] != clip_length or shape[4] != 3:
            raise ValueError(
                f"shape must be [N, {clip_length}, H, W, 3], "
                f"got {list(shape)}")
        raw = base64.b64decode(req["frames_b64"])
        arr = np.frombuffer(raw, np.uint8).reshape(shape)
        if shape[2] != size or shape[3] != size:
            raise ValueError(
                f"frames must be {size}px square (pre-resized); "
                "use 'paths' for server-side resize")
        return list(arr)
    if "paths" in req:
        return [decode_clip(resolve_media_path(p, media_root), clip_length,
                            size, req.get("start"), req.get("end"))
                for p in req["paths"]]
    raise ValueError("request needs 'paths' or 'frames_b64'")


class NarrateService:
    """Narration endpoint over any ``caption_fn(frames) -> [str]``
    (``tools/narrator.py`` captioners: native VCLM, imported LaViLa
    with KV-cached decoding, HF pipeline).  The batcher serializes
    device access against concurrent requests; generation itself
    batches internally via ``num_samples``."""

    def __init__(self, caption_fn, *, clip_length: int, image_size: int,
                 media_root: Optional[str] = None):
        self.clip_length = clip_length
        self.image_size = image_size
        self.media_root = media_root
        self.batcher = MicroBatcher(
            lambda clips: [caption_fn(c) for c in clips],
            max_batch=1, max_wait_ms=0.0, name="narrate")

    def narrate(self, req: dict) -> dict:
        clips = clips_from_request(req, self.clip_length, self.image_size,
                                   self.media_root)
        futs = [self.batcher.submit(c) for c in clips]
        return {"narrations": [f.result(timeout=600) for f in futs]}

    def metrics(self) -> dict:
        return self.batcher.metrics()

    def close(self):
        self.batcher.close()


class ClipService:
    """Model-side of the server: decode / tokenize / encode, batched."""

    def __init__(self, model, params, *, batch: int = 32,
                 max_wait_ms: float = 2.0, clip_length: Optional[int] = None,
                 mesh=None, media_root: Optional[str] = None,
                 weight_dtype: str = "bf16"):
        from avion_tpu.eval.runners import CLIPEncoders

        self.model = model
        self.media_root = media_root
        self.clip_length = clip_length or model.num_frames
        self.encoders = CLIPEncoders(model, params, batch=batch, mesh=mesh,
                                     weight_dtype=weight_dtype)
        self.text_batcher = MicroBatcher(self._encode_texts,
                                         max_batch=batch,
                                         max_wait_ms=max_wait_ms,
                                         name="text")
        self.video_batcher = MicroBatcher(self._encode_videos,
                                          max_batch=batch,
                                          max_wait_ms=max_wait_ms,
                                          name="video")
        self._clf_cache: dict = {}

    # -- device-thread callbacks (run inside the batchers) --------------

    def _encode_texts(self, items: List) -> List[np.ndarray]:
        from avion_tpu.data.tokenizer import tokenize

        # classifier-build requests ride the same device thread (the
        # encoders are driven from exactly one thread per modality)
        out: List = [None] * len(items)
        texts, idxs = [], []
        for i, it in enumerate(items):
            if isinstance(it, tuple) and it and it[0] == "__build_clf__":
                from avion_tpu.eval.runners import build_text_classifier

                out[i] = build_text_classifier(
                    self.encoders, it[1],
                    context_length=self.model.context_length)
            else:
                texts.append(it)
                idxs.append(i)
        if texts:
            toks = np.atleast_2d(tokenize(
                texts, context_length=self.model.context_length))
            emb = self.encoders.encode_texts(toks)
            emb /= np.clip(np.linalg.norm(emb, axis=-1, keepdims=True),
                           1e-9, None)
            for i, e in zip(idxs, emb):
                out[i] = e
        return out

    def _encode_videos(self, clips: List[np.ndarray]) -> List[np.ndarray]:
        # uint8 0-255 scale: CLIPEncoders normalizes on device
        arr = np.stack(clips)
        emb = self.encoders.encode_images(arr)
        emb /= np.clip(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-9,
                       None)
        return list(emb)

    # -- request-thread helpers -----------------------------------------

    def decode_clip(self, path: str, start: Optional[float] = None,
                    end: Optional[float] = None) -> np.ndarray:
        return decode_clip(resolve_media_path(path, self.media_root),
                           self.clip_length, self.model.image_size,
                           start, end)

    def clips_from_request(self, req: dict) -> List[np.ndarray]:
        return clips_from_request(req, self.clip_length,
                                  self.model.image_size, self.media_root)

    # -- endpoint handlers ----------------------------------------------

    def embed_text(self, req: dict) -> dict:
        texts = req["texts"]
        futs = [self.text_batcher.submit(t) for t in texts]
        return {"embeddings": [f.result(timeout=120).tolist()
                               for f in futs]}

    def embed_video(self, req: dict) -> dict:
        clips = self.clips_from_request(req)
        futs = [self.video_batcher.submit(c) for c in clips]
        return {"embeddings": [f.result(timeout=300).tolist()
                               for f in futs]}

    def classify(self, req: dict) -> dict:
        """Zero-shot action classification: template-ensemble text
        classifier (the eval suites' construction,
        ``eval/runners.py:build_text_classifier``) against clip
        embeddings.  Classifier weights are cached per label set."""
        labels = req["labels"]
        if not isinstance(labels, list) or not labels:
            raise ValueError("'labels' must be a non-empty list")
        key = tuple(labels)
        clf = self._clf_cache.get(key)
        if clf is None:
            from avion_tpu.eval.runners import build_text_classifier

            # serialize classifier builds through the text batcher's
            # device thread (encoders are not re-entrant across threads)
            fut = self.text_batcher.submit(("__build_clf__", labels))
            clf = fut.result(timeout=600)
            if len(self._clf_cache) > 32:  # bound memory
                self._clf_cache.clear()
            self._clf_cache[key] = clf
        clips = self.clips_from_request(req)
        vfuts = [self.video_batcher.submit(c) for c in clips]
        v = np.stack([f.result(timeout=300) for f in vfuts])
        scale = float(np.exp(
            np.asarray(self.params_logit_scale(), np.float32)))
        logits = scale * v @ clf.T
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        top = probs.argmax(-1)
        return {"probs": probs.tolist(),
                "top": [{"label": labels[i], "prob": float(probs[n, i])}
                        for n, i in enumerate(top)]}

    def similarity(self, req: dict) -> dict:
        clips = self.clips_from_request(req)
        vfuts = [self.video_batcher.submit(c) for c in clips]
        tfuts = [self.text_batcher.submit(t) for t in req["texts"]]
        v = np.stack([f.result(timeout=300) for f in vfuts])
        t = np.stack([f.result(timeout=120) for f in tfuts])
        scale = float(np.exp(
            np.asarray(self.params_logit_scale(), np.float32)))
        return {"logits": (scale * v @ t.T).tolist()}

    def params_logit_scale(self):
        p = self.encoders.params
        p = p.get("params", p)
        return np.asarray(p["logit_scale"]) if "logit_scale" in p else 0.0

    def metrics(self) -> dict:
        return {"text": self.text_batcher.metrics(),
                "video": self.video_batcher.metrics()}

    def close(self):
        self.text_batcher.close()
        self.video_batcher.close()


def make_server(service: ClipService, port: int = 0,
                host: str = "127.0.0.1",
                narrate: Optional[NarrateService] = None
                ) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``server.server_address[1]``
    is the bound port (ephemeral when ``port=0``)."""
    import jax

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                d = jax.devices()[0]
                self._json(200, {"status": "ok",
                                 "platform": d.platform,
                                 "device": str(d),
                                 "model": type(service.model).__name__})
            elif self.path == "/metrics":
                m = service.metrics()
                if narrate is not None:
                    m["narrate"] = narrate.metrics()
                self._json(200, m)
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/v1/embed/text":
                    self._json(200, service.embed_text(req))
                elif self.path == "/v1/embed/video":
                    self._json(200, service.embed_video(req))
                elif self.path == "/v1/similarity":
                    self._json(200, service.similarity(req))
                elif self.path == "/v1/classify":
                    self._json(200, service.classify(req))
                elif self.path == "/v1/narrate" and narrate is not None:
                    self._json(200, narrate.narrate(req))
                else:
                    self._json(404, {"error": f"no route {self.path}"})
            except (KeyError, ValueError, TypeError) as e:
                self._json(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — server must not die
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever_in_thread(server) -> threading.Thread:
    th = threading.Thread(target=server.serve_forever, daemon=True,
                          name="http-serve")
    th.start()
    return th


def main(argv=None):
    import sys

    import jax
    import jax.numpy as jnp

    from avion_tpu.core.config import TrainConfig, load_dotenv
    from avion_tpu.models import create_model
    from avion_tpu.train.common import load_pretrained_params

    load_dotenv()
    argv = list(argv if argv is not None else sys.argv[1:])

    def _flag(name, default=None):
        if name in argv:
            i = argv.index(name)
            if i + 1 >= len(argv):
                raise SystemExit(f"usage: {name} <value> (missing value)")
            val = argv[i + 1]
            del argv[i : i + 2]
            return val
        return default

    port = int(_flag("--port", "8080"))
    # loopback by default: /v1/embed/video etc. accept server-side file
    # paths, so external binding is opt-in (pair with --media-root)
    host = _flag("--host", "127.0.0.1")
    media_root = _flag("--media-root")
    use_mesh = "--mesh" in argv
    if use_mesh:
        argv.remove("--mesh")
    # --weights int8: weight-only per-channel quantized encoders
    # (~0.4%/weight error, opt-in; bf16 is exact — docs/SERVING.md)
    weight_dtype = _flag("--weights", "bf16")
    narrator_ckpt = _flag("--narrator-checkpoint")
    narrator_name = _flag("--narrator-model",
                          "VCLM_OPENAI_TIMESFORMER_LARGE_336PX_GPT2_XL")
    cfg = TrainConfig().apply_overrides(argv)
    m = cfg.model
    model = create_model(
        m.name, num_frames=cfg.data.clip_length,
        project_embed_dim=m.project_embed_dim,
        use_quick_gelu=m.use_quick_gelu, use_flash_attn=m.use_flash_attn,
        pooling=m.pooling, temperature_init=m.temperature_init,
    )
    if not cfg.pretrain_model:
        raise SystemExit("pretrain_model=<ckpt.pt|orbax_dir> is required")
    video = jnp.zeros((2, cfg.data.clip_length, model.image_size,
                       model.image_size, 3), jnp.bfloat16)
    text = jnp.zeros((2, model.context_length), jnp.int32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), video,
                                   text)["params"]
    params = load_pretrained_params(
        cfg.pretrain_model, template, num_frames=cfg.data.clip_length,
        context_length=model.context_length, vocab_size=model.vocab_size)
    mesh = None
    if use_mesh:
        from avion_tpu.parallel.mesh import mesh_from_config

        mesh = mesh_from_config(cfg.mesh)
        print(f"serving over mesh {dict(mesh.shape)}")
    service = ClipService(model, params, batch=cfg.data.val_batch_size,
                          mesh=mesh, media_root=media_root,
                          weight_dtype=weight_dtype)
    narrate = None
    if narrator_ckpt:
        from avion_tpu.models import create_model as _cm
        from avion_tpu.tools.narrator import lavila_captioner

        nmodel = _cm(narrator_name, num_frames=cfg.data.clip_length)
        narrate = NarrateService(
            lavila_captioner(narrator_ckpt, model=nmodel,
                             num_frames=cfg.data.clip_length),
            clip_length=cfg.data.clip_length,
            image_size=nmodel.image_size, media_root=media_root)
    server = make_server(service, port=port, host=host,
                         narrate=narrate)
    print(f"serving {m.name} on :{server.server_address[1]}")
    server.serve_forever()


if __name__ == "__main__":
    main()
