"""EgoVLP legacy extractor (egonlq/egovlp.py): checkpoint import +
feature parity against an independent torch transcription of the
reference semantics (egonlq/model/model.py FrozenInTime,
model/video_transformer.py SpaceTimeTransformer, RoBERTa text tower).
"""

import os.path as osp

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from avion_tpu.egonlq.egovlp import (  # noqa: E402
    FrozenInTime,
    import_egovlp_state,
)

# small-but-structured config
W, HEADS, LAYERS = 32, 2, 2
TEXT_LAYERS = 2
FRAMES, IMG, PATCH = 2, 32, 16
N = (IMG // PATCH) ** 2  # patches per frame
VOCAB, MAXPOS, PROJ = 64, 24, 16


def _make_state(rs):
    def r(*shape, scale=0.08):
        return torch.tensor(rs.randn(*shape).astype(np.float32) * scale)

    sd = {}
    sd["video_model.cls_token"] = r(1, 1, W)
    sd["video_model.pos_embed"] = r(1, N + 1, W)
    sd["video_model.temporal_embed"] = r(1, FRAMES, W)
    sd["video_model.patch_embed.proj.weight"] = r(W, 3, PATCH, PATCH)
    sd["video_model.patch_embed.proj.bias"] = r(W)
    for i in range(LAYERS):
        p = f"video_model.blocks.{i}."
        for ln in ("norm1", "norm2", "norm3"):
            sd[p + ln + ".weight"] = 1.0 + r(W, scale=0.02)
            sd[p + ln + ".bias"] = r(W, scale=0.02)
        for a in ("attn", "timeattn"):
            sd[p + a + ".qkv.weight"] = r(3 * W, W)
            sd[p + a + ".qkv.bias"] = r(3 * W)
            sd[p + a + ".proj.weight"] = r(W, W)
            sd[p + a + ".proj.bias"] = r(W)
        sd[p + "mlp.fc1.weight"] = r(4 * W, W)
        sd[p + "mlp.fc1.bias"] = r(4 * W)
        sd[p + "mlp.fc2.weight"] = r(W, 4 * W)
        sd[p + "mlp.fc2.bias"] = r(W)
        # FIBER fusion params present in real checkpoints (blocks >= 6):
        # must be ignored by the importer
        sd[p + "attn.qkv_text_i2t.weight"] = r(2 * W, W)
        sd[p + "attn.alpha_i2t"] = r(1)
    sd["video_model.norm.weight"] = 1.0 + r(W, scale=0.02)
    sd["video_model.norm.bias"] = r(W, scale=0.02)

    te = "text_model.embeddings."
    sd[te + "word_embeddings.weight"] = r(VOCAB, W)
    sd[te + "position_embeddings.weight"] = r(MAXPOS, W)
    sd[te + "token_type_embeddings.weight"] = r(1, W)
    sd[te + "LayerNorm.weight"] = 1.0 + r(W, scale=0.02)
    sd[te + "LayerNorm.bias"] = r(W, scale=0.02)
    for i in range(TEXT_LAYERS):
        p = f"text_model.encoder.layer.{i}."
        for qkv in ("query", "key", "value"):
            sd[p + f"attention.self.{qkv}.weight"] = r(W, W)
            sd[p + f"attention.self.{qkv}.bias"] = r(W)
        sd[p + "attention.output.dense.weight"] = r(W, W)
        sd[p + "attention.output.dense.bias"] = r(W)
        sd[p + "attention.output.LayerNorm.weight"] = 1.0 + r(W, scale=0.02)
        sd[p + "attention.output.LayerNorm.bias"] = r(W, scale=0.02)
        sd[p + "intermediate.dense.weight"] = r(4 * W, W)
        sd[p + "intermediate.dense.bias"] = r(4 * W)
        sd[p + "output.dense.weight"] = r(W, 4 * W)
        sd[p + "output.dense.bias"] = r(W)
        sd[p + "output.LayerNorm.weight"] = 1.0 + r(W, scale=0.02)
        sd[p + "output.LayerNorm.bias"] = r(W, scale=0.02)
    # pooler exists in checkpoints but is unused by compute_text
    sd["text_model.pooler.dense.weight"] = r(W, W)

    for proj in ("vid_proj", "txt_proj"):
        sd[proj + ".0.weight"] = r(PROJ, W)
        sd[proj + ".2.weight"] = r(PROJ, PROJ)
        sd[proj + ".2.bias"] = r(PROJ)
        sd[proj + ".4.weight"] = r(PROJ, PROJ)
        sd[proj + ".4.bias"] = r(PROJ)
    # training-time heads that the importer must skip
    sd["mlm_score.bias"] = r(VOCAB)
    sd["itm_score.fc.weight"] = r(2, 2 * W)
    sd["cross_modal_text_transform.weight"] = r(W, W)
    return sd


# ---------------------------------------------------------------------------
# independent torch transcription of the reference forward semantics
# ---------------------------------------------------------------------------

def _t_ln(x, w, b, eps=1e-5):
    return torch.nn.functional.layer_norm(x, (x.shape[-1],), w, b, eps)


def _t_divided_attn(x, sd, p, mode, f, n):
    b, s, w = x.shape
    h = HEADS
    d = w // h
    qkv = x @ sd[p + ".qkv.weight"].t() + sd[p + ".qkv.bias"]
    q, k, v = qkv.chunk(3, -1)
    q, k, v = (t.reshape(b, s, h, d).permute(0, 2, 1, 3) for t in (q, k, v))

    def attn(q, k, v):
        pmat = torch.softmax(
            (q * d ** -0.5) @ k.transpose(-2, -1), -1)
        return pmat @ v

    cls_out = attn(q[:, :, :1], k, v)
    q_, k_, v_ = q[:, :, 1:], k[:, :, 1:], v[:, :, 1:]

    def group(t):
        t = t.reshape(b, h, f, n, d)
        return t if mode == "space" else t.transpose(2, 3)

    qg, kg, vg = group(q_), group(k_), group(v_)
    g = qg.shape[2]
    clsk = k[:, :, :1].unsqueeze(2).expand(b, h, g, 1, d)
    clsv = v[:, :, :1].unsqueeze(2).expand(b, h, g, 1, d)
    out = attn(qg, torch.cat([clsk, kg], 3), torch.cat([clsv, vg], 3))
    if mode == "time":
        out = out.transpose(2, 3)
    out = out.reshape(b, h, f * n, d)
    out = torch.cat([cls_out, out], 2).permute(0, 2, 1, 3).reshape(b, s, w)
    return out @ sd[p + ".proj.weight"].t() + sd[p + ".proj.bias"]


def _t_video(video, sd):
    # video: [B, T, H, W, C] torch float (pre-normalized)
    b, t = video.shape[:2]
    x = video.permute(0, 1, 4, 2, 3).reshape(b * t, 3, IMG, IMG)
    x = torch.nn.functional.conv2d(
        x, sd["video_model.patch_embed.proj.weight"],
        sd["video_model.patch_embed.proj.bias"], stride=PATCH)
    x = x.flatten(2).transpose(2, 1).reshape(b, t * N, W)
    cls = sd["video_model.cls_token"].expand(b, -1, -1)
    x = torch.cat([cls, x], 1)
    pos = sd["video_model.pos_embed"]
    cls_embed = pos[:, 0:1]
    tile_pos = pos[:, 1:].repeat(1, t, 1)
    tile_temp = sd["video_model.temporal_embed"][:, :t].repeat_interleave(
        N, 1)
    x = x + torch.cat([cls_embed, tile_pos + tile_temp], 1)
    for i in range(LAYERS):
        p = f"video_model.blocks.{i}"

        def ln(y, name):
            return _t_ln(y, sd[f"{p}.{name}.weight"], sd[f"{p}.{name}.bias"])

        tout = _t_divided_attn(ln(x, "norm3"), sd, p + ".timeattn",
                               "time", t, N)
        time_res = x + tout
        sout = _t_divided_attn(ln(time_res, "norm1"), sd, p + ".attn",
                               "space", t, N)
        space_res = x + sout  # frozen-in-time: residual from x
        y = ln(space_res, "norm2")
        y = torch.nn.functional.gelu(
            y @ sd[p + ".mlp.fc1.weight"].t() + sd[p + ".mlp.fc1.bias"])
        y = y @ sd[p + ".mlp.fc2.weight"].t() + sd[p + ".mlp.fc2.bias"]
        x = space_res + y
    x = _t_ln(x, sd["video_model.norm.weight"], sd["video_model.norm.bias"])
    return x[:, 0]


def _t_roberta(ids, mask, sd):
    pad = 1
    nonpad = (ids != pad).long()
    pos = torch.cumsum(nonpad, 1) * nonpad + pad
    te = "text_model.embeddings."
    x = sd[te + "word_embeddings.weight"][ids]
    x = x + sd[te + "position_embeddings.weight"][pos]
    x = x + sd[te + "token_type_embeddings.weight"][
        torch.zeros_like(ids)]
    x = _t_ln(x, sd[te + "LayerNorm.weight"], sd[te + "LayerNorm.bias"])
    ext = ((1 - mask).float() * -1e9)[:, None, None, :]
    b, s, w = x.shape
    h = HEADS
    d = w // h
    for i in range(TEXT_LAYERS):
        p = f"text_model.encoder.layer.{i}."

        def lin(y, name):
            return y @ sd[p + name + ".weight"].t() + sd[p + name + ".bias"]

        q = lin(x, "attention.self.query").reshape(b, s, h, d)
        k = lin(x, "attention.self.key").reshape(b, s, h, d)
        v = lin(x, "attention.self.value").reshape(b, s, h, d)
        logits = torch.einsum("bqhd,bkhd->bhqk", q, k) / d ** 0.5
        pmat = torch.softmax(logits + ext, -1)
        ctx = torch.einsum("bhqk,bkhd->bqhd", pmat, v).reshape(b, s, w)
        x = _t_ln(x + lin(ctx, "attention.output.dense"),
                  sd[p + "attention.output.LayerNorm.weight"],
                  sd[p + "attention.output.LayerNorm.bias"])
        y = torch.nn.functional.gelu(lin(x, "intermediate.dense"))
        x = _t_ln(x + lin(y, "output.dense"),
                  sd[p + "output.LayerNorm.weight"],
                  sd[p + "output.LayerNorm.bias"])
    return x


def _t_proj(x, sd, name):
    x = torch.relu(x @ sd[name + ".0.weight"].t())
    x = torch.relu(x @ sd[name + ".2.weight"].t() + sd[name + ".2.bias"])
    return x @ sd[name + ".4.weight"].t() + sd[name + ".4.bias"]


def _model():
    return FrozenInTime(num_frames=FRAMES, image_size=IMG,
                        patch_size=PATCH, width=W, layers=LAYERS,
                        heads=HEADS, projection_dim=PROJ,
                        text_layers=TEXT_LAYERS, vocab_size=VOCAB,
                        max_positions=MAXPOS)


def test_egovlp_import_and_video_parity():
    rs = np.random.RandomState(0)
    sd = _make_state(rs)
    params = import_egovlp_state(sd, num_frames=FRAMES, layers=LAYERS,
                                 text_layers=TEXT_LAYERS)
    model = _model()

    video = rs.randn(2, FRAMES, IMG, IMG, 3).astype(np.float32)
    ours = np.asarray(model.apply(
        {"params": params}, video, method=model.compute_video))
    with torch.no_grad():
        ref = _t_proj(_t_video(torch.tensor(video), sd), sd, "vid_proj")
    np.testing.assert_allclose(ours, ref.numpy(), atol=2e-4, rtol=2e-3)


def test_egovlp_text_parity_with_padding():
    rs = np.random.RandomState(1)
    sd = _make_state(rs)
    params = import_egovlp_state(sd, num_frames=FRAMES, layers=LAYERS,
                                 text_layers=TEXT_LAYERS)
    model = _model()

    ids = rs.randint(2, VOCAB, (3, 10)).astype(np.int32)
    ids[0, 6:] = 1  # pad
    ids[2, 3:] = 1
    mask = (ids != 1).astype(np.int32)
    ours = np.asarray(model.apply(
        {"params": params}, ids, mask, method=model.compute_text))
    with torch.no_grad():
        h = _t_roberta(torch.tensor(ids, dtype=torch.long),
                       torch.tensor(mask), sd)
        ref = _t_proj(h[:, 0], sd, "txt_proj")
    np.testing.assert_allclose(ours, ref.numpy(), atol=2e-4, rtol=2e-3)


def test_egovlp_temporal_inflation():
    """Checkpoint with fewer frames than the model: zeros fill
    (model.py:297-339, load_temporal_fix='zeros'); more frames:
    truncate."""
    rs = np.random.RandomState(2)
    sd = _make_state(rs)
    p4 = import_egovlp_state(sd, num_frames=4, layers=LAYERS,
                             text_layers=TEXT_LAYERS)
    te = p4["video_model"]["temporal_embed"]
    assert te.shape == (4, W)
    np.testing.assert_array_equal(
        te[:FRAMES], np.asarray(sd["video_model.temporal_embed"])[0])
    assert (te[FRAMES:] == 0).all()
    p1 = import_egovlp_state(sd, num_frames=1, layers=LAYERS,
                             text_layers=TEXT_LAYERS)
    assert p1["video_model"]["temporal_embed"].shape == (1, W)


def test_egovlp_extractor_text_from_ids():
    rs = np.random.RandomState(3)
    sd = _make_state(rs)
    params = import_egovlp_state(sd, num_frames=FRAMES, layers=LAYERS,
                                 text_layers=TEXT_LAYERS)
    from avion_tpu.egonlq.egovlp import EgoVLPFeatureExtractor

    ex = EgoVLPFeatureExtractor(_model(), params, clip_length=FRAMES,
                                crop_size=IMG, batch=4)
    ids = rs.randint(2, VOCAB, (2, 8)).astype(np.int32)
    feats = ex.text_features_from_ids(ids)
    assert feats.shape == (2, PROJ)
    assert np.isfinite(feats).all()


def test_egovlp_extractor_to_dir(tmp_path):
    """The shipped extraction path (scripts/examples/
    extract_nlq_features_egovlp.sh): windowed video sweep +
    extract_to_dir inherited from features.FeatureExtractor."""
    cv2 = pytest.importorskip("cv2")

    rs = np.random.RandomState(4)
    sd = _make_state(rs)
    params = import_egovlp_state(sd, num_frames=FRAMES, layers=LAYERS,
                                 text_layers=TEXT_LAYERS)
    from avion_tpu.egonlq.egovlp import EgoVLPFeatureExtractor

    vw = cv2.VideoWriter(str(tmp_path / "uidY.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 48))
    for i in range(30):
        vw.write(rs.randint(0, 255, (48, 48, 3), np.uint8))
    vw.release()

    class _Tok:  # minimal HF-tokenizer stand-in
        def __call__(self, texts, padding=True, return_tensors="np"):
            ids = np.full((len(texts), 6), 1, np.int32)
            for r, t in enumerate(texts):
                n = min(4, 2 + len(t) % 3)
                ids[r, :n] = 2 + (np.arange(n) + len(t)) % (VOCAB - 2)
            return {"input_ids": ids,
                    "attention_mask": (ids != 1).astype(np.int32)}

    ex = EgoVLPFeatureExtractor(_model(), params, tokenizer=_Tok(),
                                clip_length=FRAMES, crop_size=IMG,
                                batch=4, window_sec=1.0)
    samples = [{"video_uid": "uidY", "query": "where is the cup"},
               {"video_uid": "uidY", "query": "what did I pour"}]
    ex.extract_to_dir(samples, str(tmp_path), str(tmp_path / "feats"))
    for i in range(2):
        z = np.load(str(tmp_path / "feats" / f"feat_{i}.npz"))
        assert z["video"].ndim == 2 and z["video"].shape[1] == PROJ
        assert z["text"].shape == (PROJ,)
        assert np.isfinite(z["video"]).all() and np.isfinite(z["text"]).all()


def test_extract_features_cli_legacy(tmp_path):
    """`extract_features --legacy` end-to-end from RAW TEXT: released
    .pth layout -> inferred-architecture load -> in-repo RoBERTa BPE
    (--tokenizer-dir) -> windowed sweep -> .npz features (reference:
    egonlq/extract_features.py + model.py:263-296)."""
    import json as _json

    cv2 = pytest.importorskip("cv2")

    rs = np.random.RandomState(5)
    sd = _make_state(rs)
    ckpt = str(tmp_path / "egovlp.pth")
    torch.save({"state_dict": sd}, ckpt)

    # tiny tokenizer dir: ids stay < VOCAB (the fabricated text tower's
    # embedding table); uncovered bytes fall to <unk>
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4}
    for ch in "abcdefghilmnoprstuwĠ":
        vocab[ch] = len(vocab)
    assert len(vocab) <= VOCAB
    with open(tok_dir / "vocab.json", "w", encoding="utf-8") as f:
        _json.dump(vocab, f, ensure_ascii=False)
    (tok_dir / "merges.txt").write_text("#version: 0.2\n")

    vw = cv2.VideoWriter(str(tmp_path / "uidZ.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 48))
    for i in range(30):
        vw.write(rs.randint(0, 255, (48, 48, 3), np.uint8))
    vw.release()

    ann = {"videos": [{"video_uid": "uidZ", "clips": [{
        "clip_uid": "c0", "video_start_sec": 0.0, "video_end_sec": 3.0,
        "annotations": [{"language_queries": [
            {"query": "where is the cup", "clip_start_sec": 0.5,
             "clip_end_sec": 1.5},
            {"query": "what did i pour", "clip_start_sec": 1.0,
             "clip_end_sec": 2.0}]}]}]}]}
    ann_path = str(tmp_path / "nlq.json")
    with open(ann_path, "w") as f:
        _json.dump(ann, f)

    from avion_tpu.egonlq.extract_features import main

    out = str(tmp_path / "feats")
    main(["--legacy", "--ckpt", ckpt, "--tokenizer-dir", str(tok_dir),
          "--annotations", ann_path, "--video-root", str(tmp_path),
          "--out", out, "--clip-length", str(FRAMES),
          "--window-sec", "1.0", "--batch", "4"])
    for i in range(2):
        z = np.load(osp.join(out, f"feat_{i}.npz"))
        assert z["video"].ndim == 2 and z["video"].shape[1] == PROJ
        assert z["text"].shape == (PROJ,)
        assert np.isfinite(z["video"]).all() and np.isfinite(z["text"]).all()
