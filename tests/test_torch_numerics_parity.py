"""Cross-framework numerics: our flax CLIP against an independent torch
implementation of the same architecture (standard pre-LN CLIP block
semantics), sharing one exported weight set.

This is the strongest checkpoint-interop check we can run without
reference weights on disk: if the two forward passes agree, a .pt
checkpoint imported through ``pt_import`` computes the same embeddings
it did under the reference's torch code.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from avion_tpu.models.clip import CLIP
from avion_tpu.tools.convert_checkpoint import export_clip_to_pt
from avion_tpu.models.pt_import import load_pt_state_dict

VW, VL, VH = 32, 2, 2
TW, TL, TH = 16, 1, 2
EMB, CTX, VOCAB = 16, 8, 64
IMG, PATCH, FRAMES = 32, 16, 2


def _torch_block(x, sd, prefix, heads, quick_gelu):
    import torch.nn.functional as F

    def ln(x, name):
        return F.layer_norm(x, (x.shape[-1],), sd[f"{prefix}.{name}.weight"],
                            sd[f"{prefix}.{name}.bias"], eps=1e-5)

    width = x.shape[-1]
    h = ln(x, "ln_1")
    qkv = h @ sd[f"{prefix}.attn.Wqkv.weight"].T + sd[f"{prefix}.attn.Wqkv.bias"]
    q, k, v = qkv.chunk(3, dim=-1)
    b, s, _ = q.shape
    d = width // heads

    def split(t):
        return t.view(b, s, heads, d).transpose(1, 2)

    q, k, v = split(q), split(k), split(v)
    attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), dim=-1)
    o = (attn @ v).transpose(1, 2).reshape(b, s, width)
    o = o @ sd[f"{prefix}.attn.out_proj.weight"].T + sd[f"{prefix}.attn.out_proj.bias"]
    x = x + o
    h = ln(x, "ln_2")
    h = h @ sd[f"{prefix}.mlp.fc1.weight"].T + sd[f"{prefix}.mlp.fc1.bias"]
    h = h * torch.sigmoid(1.702 * h) if quick_gelu else torch.nn.functional.gelu(h)
    h = h @ sd[f"{prefix}.mlp.fc2.weight"].T + sd[f"{prefix}.mlp.fc2.bias"]
    return x + h


def _torch_visual(video, sd, quick_gelu=True):
    """video: [B, T, H, W, 3] float; standard CLIP video ViT forward
    with factorized temporal embedding (fast-conv1 formulation)."""
    import torch.nn.functional as F

    b, t, hh, ww, c = video.shape
    p = PATCH
    gh, gw = hh // p, ww // p
    # (c, sh, sw) patch vector ordering to match the torch conv layout
    x = video.permute(0, 1, 4, 2, 3)  # B,T,C,H,W
    x = x.reshape(b, t, c, gh, p, gw, p)
    x = x.permute(0, 1, 3, 5, 2, 4, 6).reshape(b, t * gh * gw, c * p * p)
    w = sd["visual.conv1.weight"].reshape(VW, -1)  # [width, C*p*p]
    x = x @ w.T
    pos = sd["visual.positional_embedding"]
    tpos = sd["visual.temporal_embedding"]
    n = gh * gw
    x = x.view(b, t, n, VW) + pos[1:].unsqueeze(0).unsqueeze(0) \
        + tpos[:t].unsqueeze(0).unsqueeze(2)
    x = x.reshape(b, t * n, VW)
    cls = (sd["visual.class_embedding"] + pos[0]).expand(b, 1, VW)
    x = torch.cat([cls, x], dim=1)
    x = F.layer_norm(x, (VW,), sd["visual.ln_pre.weight"],
                     sd["visual.ln_pre.bias"], eps=1e-5)
    for i in range(VL):
        x = _torch_block(x, sd, f"visual.transformer.resblocks.{i}", VH,
                         quick_gelu)
    pooled = F.layer_norm(x[:, 0], (VW,), sd["visual.ln_post.weight"],
                          sd["visual.ln_post.bias"], eps=1e-5)
    return pooled @ sd["image_projection"]


def _torch_text(tokens, sd, quick_gelu=True):
    import torch.nn.functional as F

    x = sd["textual.token_embedding.weight"][tokens]
    x = x + sd["textual.positional_embedding"][: x.shape[1]].unsqueeze(0)
    s = x.shape[1]
    mask = torch.triu(torch.full((s, s), float("-inf")), diagonal=1)
    for i in range(TL):
        # causal: reimplement block with mask
        prefix = f"textual.transformer.resblocks.{i}"
        h = F.layer_norm(x, (TW,), sd[f"{prefix}.ln_1.weight"],
                         sd[f"{prefix}.ln_1.bias"], eps=1e-5)
        qkv = h @ sd[f"{prefix}.attn.Wqkv.weight"].T + sd[f"{prefix}.attn.Wqkv.bias"]
        q, k, v = qkv.chunk(3, dim=-1)
        b = q.shape[0]
        d = TW // TH
        split = lambda t: t.view(b, s, TH, d).transpose(1, 2)
        q, k, v = split(q), split(k), split(v)
        attn = torch.softmax(
            q @ k.transpose(-1, -2) / math.sqrt(d) + mask, dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(b, s, TW)
        o = o @ sd[f"{prefix}.attn.out_proj.weight"].T + sd[f"{prefix}.attn.out_proj.bias"]
        x = x + o
        h = F.layer_norm(x, (TW,), sd[f"{prefix}.ln_2.weight"],
                         sd[f"{prefix}.ln_2.bias"], eps=1e-5)
        h = h @ sd[f"{prefix}.mlp.fc1.weight"].T + sd[f"{prefix}.mlp.fc1.bias"]
        h = h * torch.sigmoid(1.702 * h)
        h = h @ sd[f"{prefix}.mlp.fc2.weight"].T + sd[f"{prefix}.mlp.fc2.bias"]
        x = x + h
    x = F.layer_norm(x, (TW,), sd["textual.ln_final.weight"],
                     sd["textual.ln_final.bias"], eps=1e-5)
    eot = tokens.argmax(dim=-1)
    pooled = x[torch.arange(x.shape[0]), eot]
    return pooled @ sd["text_projection"]


def test_flax_vs_torch_forward(tmp_path):
    model = CLIP(
        embed_dim=EMB, image_size=IMG, patch_size=PATCH, num_frames=FRAMES,
        vision_width=VW, vision_layers=VL, vision_heads=VH,
        context_length=CTX, vocab_size=VOCAB, text_width=TW, text_heads=TH,
        text_layers=TL, use_quick_gelu=True, use_flash=False,
        dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(7)
    video = jax.random.normal(rng, (2, FRAMES, IMG, IMG, 3))
    tokens_np = np.array([[1, 5, 9, 63, 0, 0, 0, 0],
                          [1, 7, 63, 0, 0, 0, 0, 0]], np.int64)
    params = jax.tree_util.tree_map(
        np.asarray,
        model.init(rng, video, jnp.asarray(tokens_np, jnp.int32))["params"],
    )

    pt_path = str(tmp_path / "w.pt")
    export_clip_to_pt(params, pt_path)
    sd = {k: torch.from_numpy(np.asarray(v, np.float32))
          for k, v in load_pt_state_dict(pt_path).items()}

    ours = model.apply({"params": params}, video,
                       jnp.asarray(tokens_np, jnp.int32))
    with torch.no_grad():
        timg = _torch_visual(torch.from_numpy(np.asarray(video)), sd)
        ttxt = _torch_text(torch.from_numpy(tokens_np), sd)
        timg = torch.nn.functional.normalize(timg, dim=-1)
        ttxt = torch.nn.functional.normalize(ttxt, dim=-1)

    np.testing.assert_allclose(
        np.asarray(ours["image_embed"]), timg.numpy(), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(ours["text_embed"]), ttxt.numpy(), atol=2e-5, rtol=2e-5)
