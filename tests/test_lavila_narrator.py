"""LaViLa narrator interop: a checkpoint in the released VCLM layout
(TimeSformer + gated GPT-2, ``second_party/lavilla_narrator``) imports
into the flax ``LavilaNarrator`` and computes the same logits as an
independent torch execution of the original weights."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from avion_tpu.models.lavila import LavilaNarrator  # noqa: E402
from avion_tpu.models.lavila_import import import_lavila_narrator_pt  # noqa: E402
from avion_tpu.models.pt_import import merge_into_params  # noqa: E402

pytestmark = pytest.mark.slow  # excluded from the quick CI tier

# tiny narrator dims
VW, VL, VH = 48, 2, 2        # vision width/layers/heads
TW, TL, TH = 32, 3, 2        # decoder width/layers/heads
IMG, PATCH, FRAMES = 32, 16, 2
VOCAB, NQ, POOL_H, POOL_D = 96, 8, 2, 16
CROSS_FREQ = 3


def _mk_state(rs):
    """Fabricate a torch state dict in the released narrator layout."""
    t = lambda *s: torch.from_numpy(rs.randn(*s).astype(np.float32) * 0.05)
    sd = {
        "visual.patch_embed.proj.weight": t(VW, 3, PATCH, PATCH),
        "visual.cls_token": t(1, 1, VW),
        "visual.pos_embed": t(1, (IMG // PATCH) ** 2 + 1, VW),
        "visual.temporal_embed": t(1, FRAMES, VW),
        "visual.ln_pre.weight": 1 + t(VW), "visual.ln_pre.bias": t(VW),
        "visual.norm.weight": 1 + t(VW), "visual.norm.bias": t(VW),
        "img_queries": t(NQ, TW),
        "img_attn_pool.norm.gamma": 1 + t(TW),
        "img_attn_pool.context_norm.gamma": 1 + t(VW),
        "img_attn_pool.to_q.weight": t(POOL_H * POOL_D, TW),
        "img_attn_pool.to_kv.weight": t(2 * POOL_D, VW),
        "img_attn_pool.to_out.weight": t(TW, POOL_H * POOL_D),
        "img_attn_pool_norm.gamma": 1 + t(TW),
        "text_decoder.transformer.wte.weight": t(VOCAB, TW),
        "text_decoder.transformer.wpe.weight": t(64, TW),
        "text_decoder.transformer.ln_f.weight": 1 + t(TW),
        "text_decoder.transformer.ln_f.bias": t(TW),
    }
    for i in range(VL):
        p = f"visual.blocks.{i}"
        for nrm in ("norm1", "norm2", "norm3"):
            sd[f"{p}.{nrm}.weight"] = 1 + t(VW)
            sd[f"{p}.{nrm}.bias"] = t(VW)
        for attn in ("attn", "timeattn"):
            sd[f"{p}.{attn}.qkv.weight"] = t(3 * VW, VW)
            sd[f"{p}.{attn}.qkv.bias"] = t(3 * VW)
            sd[f"{p}.{attn}.proj.weight"] = t(VW, VW)
            sd[f"{p}.{attn}.proj.bias"] = t(VW)
        sd[f"{p}.mlp.fc1.weight"] = t(4 * VW, VW)
        sd[f"{p}.mlp.fc1.bias"] = t(4 * VW)
        sd[f"{p}.mlp.fc2.weight"] = t(VW, 4 * VW)
        sd[f"{p}.mlp.fc2.bias"] = t(VW)
    for i in range(TL):
        p = f"text_decoder.transformer.h.{i}"
        for nrm in ("ln_1", "ln_2"):
            sd[f"{p}.{nrm}.weight"] = 1 + t(TW)
            sd[f"{p}.{nrm}.bias"] = t(TW)
        # HF Conv1D layout: [in, out]
        sd[f"{p}.attn.c_attn.weight"] = t(TW, 3 * TW)
        sd[f"{p}.attn.c_attn.bias"] = t(3 * TW)
        sd[f"{p}.attn.c_proj.weight"] = t(TW, TW)
        sd[f"{p}.attn.c_proj.bias"] = t(TW)
        sd[f"{p}.mlp.c_fc.weight"] = t(TW, 4 * TW)
        sd[f"{p}.mlp.c_fc.bias"] = t(4 * TW)
        sd[f"{p}.mlp.c_proj.weight"] = t(4 * TW, TW)
        sd[f"{p}.mlp.c_proj.bias"] = t(TW)
        if i % CROSS_FREQ == 0:
            sd[f"{p}.crossattention.q_attn.weight"] = t(TW, TW)
            sd[f"{p}.crossattention.q_attn.bias"] = t(TW)
            sd[f"{p}.crossattention.c_attn.weight"] = t(TW, 2 * TW)
            sd[f"{p}.crossattention.c_attn.bias"] = t(2 * TW)
            sd[f"{p}.crossattention.c_proj.weight"] = t(TW, TW)
            sd[f"{p}.crossattention.c_proj.bias"] = t(TW)
            sd[f"{p}.ln_cross_attn.weight"] = 1 + t(TW)
            sd[f"{p}.ln_cross_attn.bias"] = t(TW)
            sd[f"{p}.ln_2_crossattention.weight"] = 1 + t(TW)
            sd[f"{p}.ln_2_crossattention.bias"] = t(TW)
            sd[f"{p}.mlp_crossattention.c_fc.weight"] = t(TW, 4 * TW)
            sd[f"{p}.mlp_crossattention.c_fc.bias"] = t(4 * TW)
            sd[f"{p}.mlp_crossattention.c_proj.weight"] = t(4 * TW, TW)
            sd[f"{p}.mlp_crossattention.c_proj.bias"] = t(TW)
            sd[f"{p}.alpha_cattn"] = torch.tensor(0.3)
            sd[f"{p}.alpha_dense"] = torch.tensor(0.2)
    return sd


# --------------------------- independent torch forward --------------------


def _attn(q, k, v):
    d = q.shape[-1]
    p = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), dim=-1)
    return p @ v


def _divided_attention(x, sd, p, mode, f, n):
    b, s, w = x.shape
    h = VH
    d = w // h
    qkv = x @ sd[f"{p}.qkv.weight"].T + sd[f"{p}.qkv.bias"]
    q, k, v = qkv.chunk(3, dim=-1)
    split = lambda t: t.view(b, s, h, d).permute(0, 2, 1, 3)
    q, k, v = split(q), split(k), split(v)
    cls_out = _attn(q[:, :, :1], k, v)
    q_, k_, v_ = q[:, :, 1:], k[:, :, 1:], v[:, :, 1:]

    def group(t):
        t = t.reshape(b, h, f, n, d)
        return t if mode == "space" else t.permute(0, 1, 3, 2, 4)

    qg, kg, vg = group(q_), group(k_), group(v_)
    g = qg.shape[2]
    ck = k[:, :, :1].unsqueeze(2).expand(b, h, g, 1, d)
    cv = v[:, :, :1].unsqueeze(2).expand(b, h, g, 1, d)
    out = _attn(qg, torch.cat([ck, kg], dim=3), torch.cat([cv, vg], dim=3))
    if mode == "time":
        out = out.permute(0, 1, 3, 2, 4)
    out = out.reshape(b, h, f * n, d)
    out = torch.cat([cls_out, out], dim=2)
    out = out.permute(0, 2, 1, 3).reshape(b, s, w)
    return out @ sd[f"{p}.proj.weight"].T + sd[f"{p}.proj.bias"]


def _torch_visual(video, sd, f, n):
    # video [B, T, H, W, C] -> channel-first patch vectors
    b, t, hh, ww, c = video.shape
    gh = hh // PATCH
    x = video.reshape(b, t, gh, PATCH, gh, PATCH, c)
    x = x.permute(0, 1, 2, 4, 6, 3, 5).reshape(b, t * n, c * PATCH * PATCH)
    x = x @ sd["visual.patch_embed.proj.weight"].reshape(VW, -1).T
    pos = sd["visual.pos_embed"][0]
    tpos = sd["visual.temporal_embed"][0]
    x = x.view(b, t, n, VW) + pos[1:] + tpos[:t].unsqueeze(1)
    x = x.reshape(b, t * n, VW)
    cls = (sd["visual.cls_token"].reshape(-1) + pos[0]).expand(b, 1, VW)
    x = torch.cat([cls, x], dim=1)
    ln = lambda x, nme: F.layer_norm(
        x, (x.shape[-1],), sd[f"{nme}.weight"], sd[f"{nme}.bias"], eps=1e-6)
    x = ln(x, "visual.ln_pre")
    for i in range(VL):
        p = f"visual.blocks.{i}"
        tt = _divided_attention(ln(x, f"{p}.norm3"), sd, f"{p}.timeattn",
                                "time", f, n)
        time_residual = x + tt
        ss = _divided_attention(ln(time_residual, f"{p}.norm1"), sd,
                                f"{p}.attn", "space", f, n)
        space_residual = x + ss
        y = ln(space_residual, f"{p}.norm2")
        y = y @ sd[f"{p}.mlp.fc1.weight"].T + sd[f"{p}.mlp.fc1.bias"]
        y = y * torch.sigmoid(1.702 * y)  # QuickGELU
        y = y @ sd[f"{p}.mlp.fc2.weight"].T + sd[f"{p}.mlp.fc2.bias"]
        x = space_residual + y
    return ln(x, "visual.norm")


def _torch_pool(tokens, sd):
    lnp = lambda x, nme: F.layer_norm(
        x, (x.shape[-1],), sd[f"{nme}.gamma"],
        torch.zeros_like(sd[f"{nme}.gamma"]))
    q_in = lnp(sd["img_queries"].unsqueeze(0).expand(tokens.shape[0], -1, -1),
               "img_attn_pool.norm")
    ctx = lnp(tokens, "img_attn_pool.context_norm")
    q = q_in @ sd["img_attn_pool.to_q.weight"].T
    b, nq, _ = q.shape
    q = q.view(b, nq, POOL_H, POOL_D).permute(0, 2, 1, 3) / math.sqrt(POOL_D)
    kv = ctx @ sd["img_attn_pool.to_kv.weight"].T
    k, v = kv[..., :POOL_D], kv[..., POOL_D:]
    sim = torch.einsum("bhid,bjd->bhij", q, k)
    p = torch.softmax(sim, dim=-1)
    out = torch.einsum("bhij,bjd->bhid", p, v)
    out = out.permute(0, 2, 1, 3).reshape(b, nq, POOL_H * POOL_D)
    out = out @ sd["img_attn_pool.to_out.weight"].T
    return lnp(out, "img_attn_pool_norm")


def _torch_decoder(tokens, enc, sd):
    td = "text_decoder.transformer"
    x = sd[f"{td}.wte.weight"][tokens] + sd[f"{td}.wpe.weight"][: tokens.shape[1]]
    ln = lambda x, nme: F.layer_norm(
        x, (x.shape[-1],), sd[f"{nme}.weight"], sd[f"{nme}.bias"], eps=1e-5)
    s = tokens.shape[1]
    mask = torch.triu(torch.full((s, s), float("-inf")), diagonal=1)
    for i in range(TL):
        p = f"{td}.h.{i}"
        if i % CROSS_FREQ == 0:
            r = x
            h = ln(x, f"{p}.ln_cross_attn")
            q = h @ sd[f"{p}.crossattention.q_attn.weight"] + \
                sd[f"{p}.crossattention.q_attn.bias"]
            kv = enc @ sd[f"{p}.crossattention.c_attn.weight"] + \
                sd[f"{p}.crossattention.c_attn.bias"]
            k, v = kv.chunk(2, dim=-1)
            b, m, _ = k.shape
            d = TW // TH
            sp = lambda t, L: t.view(b, L, TH, d).permute(0, 2, 1, 3)
            o = _attn(sp(q, s), sp(k, m), sp(v, m))
            o = o.permute(0, 2, 1, 3).reshape(b, s, TW)
            o = o @ sd[f"{p}.crossattention.c_proj.weight"] + \
                sd[f"{p}.crossattention.c_proj.bias"]
            x = r + torch.tanh(sd[f"{p}.alpha_cattn"]) * o
            r = x
            h = ln(x, f"{p}.ln_2_crossattention")
            h = h @ sd[f"{p}.mlp_crossattention.c_fc.weight"] + \
                sd[f"{p}.mlp_crossattention.c_fc.bias"]
            h = F.relu(h) ** 2
            h = h @ sd[f"{p}.mlp_crossattention.c_proj.weight"] + \
                sd[f"{p}.mlp_crossattention.c_proj.bias"]
            x = r + torch.tanh(sd[f"{p}.alpha_dense"]) * h
        h = ln(x, f"{p}.ln_1")
        qkv = h @ sd[f"{p}.attn.c_attn.weight"] + sd[f"{p}.attn.c_attn.bias"]
        q, k, v = qkv.chunk(3, dim=-1)
        b = q.shape[0]
        d = TW // TH
        sp = lambda t: t.view(b, s, TH, d).permute(0, 2, 1, 3)
        logits = sp(q) @ sp(k).transpose(-1, -2) / math.sqrt(d) + mask
        o = torch.softmax(logits, dim=-1) @ sp(v)
        o = o.permute(0, 2, 1, 3).reshape(b, s, TW)
        o = o @ sd[f"{p}.attn.c_proj.weight"] + sd[f"{p}.attn.c_proj.bias"]
        x = x + o
        h = ln(x, f"{p}.ln_2")
        h = h @ sd[f"{p}.mlp.c_fc.weight"] + sd[f"{p}.mlp.c_fc.bias"]
        h = 0.5 * h * (1.0 + torch.tanh(
            math.sqrt(2.0 / math.pi) * (h + 0.044715 * h ** 3)))
        h = h @ sd[f"{p}.mlp.c_proj.weight"] + sd[f"{p}.mlp.c_proj.bias"]
        x = x + h
    x = ln(x, f"{td}.ln_f")
    return x @ sd[f"{td}.wte.weight"].T


def _model():
    return LavilaNarrator(
        image_size=IMG, patch_size=PATCH, num_frames=FRAMES,
        vision_width=VW, vision_layers=VL, vision_heads=VH,
        vocab_size=VOCAB, text_width=TW, text_layers=TL, text_heads=TH,
        cross_freq=CROSS_FREQ, gated_xattn=True, num_img_queries=NQ,
        max_positions=64,
        pool_heads=POOL_H, pool_dim_head=POOL_D, dtype=jnp.float32)


def test_lavila_narrator_import_matches_torch(tmp_path):
    rs = np.random.RandomState(5)
    sd = _mk_state(rs)
    pt = str(tmp_path / "narrator.pt")
    torch.save({"state_dict": {f"module.{k}": v for k, v in sd.items()}}, pt)

    model = _model()
    rng = jax.random.PRNGKey(0)
    video = np.asarray(
        jax.random.normal(rng, (2, FRAMES, IMG, IMG, 3), jnp.float32))
    tokens = np.array([[1, 4, 7, 2, 0, 0], [1, 9, 2, 0, 0, 0]], np.int64)
    params = model.init(rng, jnp.asarray(video),
                        jnp.asarray(tokens, jnp.int32))["params"]
    imported = import_lavila_narrator_pt(pt)
    params = merge_into_params(params, imported, strict=True)

    out = model.apply({"params": params}, jnp.asarray(video),
                      jnp.asarray(tokens, jnp.int32))

    with torch.no_grad():
        vis = _torch_visual(torch.from_numpy(video.copy()), sd,
                            FRAMES, (IMG // PATCH) ** 2)
        enc = _torch_pool(vis, sd)
        ref = _torch_decoder(torch.from_numpy(tokens[:, :-1]), enc, sd)

    np.testing.assert_allclose(np.asarray(out["logits"]), ref.numpy(),
                               atol=2e-4, rtol=2e-4)


def test_lavila_narrator_generate(tmp_path):
    """Generation runs with imported weights and respects the prompt."""
    rs = np.random.RandomState(6)
    sd = _mk_state(rs)
    model = _model()
    rng = jax.random.PRNGKey(0)
    video = jax.random.normal(rng, (1, FRAMES, IMG, IMG, 3), jnp.float32)
    prompt = jnp.asarray([[3, 5]], jnp.int32)
    params = model.init(rng, video, jnp.zeros((1, 6), jnp.int32))["params"]
    params = merge_into_params(params, import_lavila_narrator_pt(
        {k: v.numpy() for k, v in sd.items()}), strict=True)
    ids = model.apply({"params": params}, video, prompt,
                      method=model.generate, max_len=8)
    ids = np.asarray(ids)
    assert ids.shape == (1, 8)
    assert ids[0, :2].tolist() == [3, 5]
    assert (ids[0, 2:] < VOCAB).all()


def test_lavila_narrations_through_pipeline(tmp_path):
    """End-to-end dataset factory: tiny LavilaNarrator + the real
    windowing/dedup pipeline produce a training pkl for a clip set
    (the reference's lavilla_narrator/main.py role)."""
    import pickle

    cv2 = pytest.importorskip("cv2")

    from avion_tpu.tools.narrator import lavila_captioner, narrate_dataset

    # two tiny videos
    paths = []
    for v in range(2):
        p = str(tmp_path / f"clip{v}.mp4")
        vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                             (48, 48))
        for i in range(60):
            vw.write(np.random.RandomState(i + v).randint(
                0, 255, (48, 48, 3), np.uint8))
        vw.release()
        paths.append(p)

    model = _model()
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, FRAMES, IMG, IMG, 3)),
                        jnp.zeros((1, 6), jnp.int32))["params"]

    class FakeTok:
        eos_token_id = 1

        def decode(self, ids):
            return " ".join(f"w{i}" for i in ids)

    cap = lavila_captioner(model=model, params=params, tokenizer=FakeTok(),
                           num_samples=2, max_len=6)
    out = str(tmp_path / "narrations.pkl")
    n = narrate_dataset(paths, cap, out, window_sec=3.0, stride_sec=2.0,
                        clip_length=FRAMES, crop_size=IMG)
    rows = pickle.load(open(out, "rb"))
    assert n == len(rows) >= 2
    vid, start, end, caps = rows[0]
    assert vid == "clip0" and end > start
    assert isinstance(caps, list) and len(caps) == 2
    assert all(isinstance(c, str) for c in caps)


def test_cached_decode_matches_full_decode():
    """decode_one (KV-cache path) reproduces the teacher-forced logits
    of the full __call__ at every position."""
    from avion_tpu.models.gpt2_gated import (GatedGPT2LMHead,
                                             make_decode_cache)

    dec = GatedGPT2LMHead(vocab_size=VOCAB, max_positions=32, width=TW,
                          layers=TL, heads=TH, cross_freq=CROSS_FREQ)
    rng = jax.random.PRNGKey(3)
    b, s, m = 2, 9, NQ
    enc = jax.random.normal(rng, (b, m, TW), jnp.float32)
    tokens = jax.random.randint(rng, (b, s), 0, VOCAB, jnp.int32)
    params = dec.init(rng, tokens, enc)["params"]

    full = dec.apply({"params": params}, tokens, enc)  # [B, S, V]

    cross = dec.apply({"params": params}, enc,
                      method=dec.precompute_cross)
    kv = make_decode_cache(TL, b, s, TW)
    outs = []
    for i in range(s):
        logit, kv = dec.apply({"params": params}, tokens[:, i : i + 1],
                              i, kv, cross, method=dec.decode_one)
        outs.append(np.asarray(logit))
    cached = np.stack(outs, axis=1)
    np.testing.assert_allclose(cached, np.asarray(full), atol=2e-4,
                               rtol=2e-4)


def test_cached_generate_matches_uncached_greedy():
    rs = np.random.RandomState(7)
    sd = _mk_state(rs)
    model = _model()
    rng = jax.random.PRNGKey(1)
    video = jax.random.normal(rng, (2, FRAMES, IMG, IMG, 3), jnp.float32)
    prompt = jnp.asarray([[3, 5], [1, 2]], jnp.int32)
    params = model.init(rng, video, jnp.zeros((2, 6), jnp.int32))["params"]
    params = merge_into_params(params, import_lavila_narrator_pt(
        {k: v.numpy() for k, v in sd.items()}), strict=True)
    fast = model.apply({"params": params}, video, prompt,
                       method=model.generate, max_len=10, rng=None,
                       use_cache=True)
    slow = model.apply({"params": params}, video, prompt,
                       method=model.generate, max_len=10, rng=None,
                       use_cache=False)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_inference_param_cast_greedy_identical():
    """bf16 weight storage (cast_inference_params) must not change a
    single generated token: weights are cast to the compute dtype at
    use anyway, and the f32-consumed tables (wte/wpe, pos embeds) are
    excluded from the cast."""
    from avion_tpu.eval.runners import cast_inference_params

    rs = np.random.RandomState(7)
    sd = _mk_state(rs)
    model = LavilaNarrator(
        image_size=IMG, patch_size=PATCH, num_frames=FRAMES,
        vision_width=VW, vision_layers=VL, vision_heads=VH,
        vocab_size=VOCAB, text_width=TW, text_layers=TL, text_heads=TH,
        cross_freq=CROSS_FREQ, gated_xattn=True, num_img_queries=NQ,
        max_positions=64,
        pool_heads=POOL_H, pool_dim_head=POOL_D, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(1)
    video = jax.random.normal(rng, (2, FRAMES, IMG, IMG, 3), jnp.float32)
    prompt = jnp.asarray([[3, 5], [1, 2]], jnp.int32)
    params = model.init(rng, video, jnp.zeros((2, 6), jnp.int32))["params"]
    params = merge_into_params(params, import_lavila_narrator_pt(
        {k: v.numpy() for k, v in sd.items()}), strict=True)
    cast = cast_inference_params(params, model)
    assert any(l.dtype == jnp.bfloat16
               for l in jax.tree_util.tree_leaves(cast))

    for use_cache in (True, False):
        a = model.apply({"params": params}, video, prompt,
                        method=model.generate, max_len=10, rng=None,
                        use_cache=use_cache)
        b = model.apply({"params": cast}, video, prompt,
                        method=model.generate, max_len=10, rng=None,
                        use_cache=use_cache)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
