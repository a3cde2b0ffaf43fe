"""Checkpoint import tests: synthetic torch-layout state dicts → flax tree.

Uses torch (CPU) to build golden tensors, mirroring the layouts the
reference writes (avion/models/utils.py remap output and OpenAI CLIP).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from avion_tpu.models.clip import CLIP
from avion_tpu.models.pt_import import (
    _conv1_to_kernel,
    import_clip_pt,
    merge_into_params,
)


def test_conv1_ordering_matches_torch_conv():
    """Dense(kernel) on our (p,p,c) patch vector == torch Conv2d."""
    rs = np.random.RandomState(0)
    width, c, p = 8, 3, 4
    w = rs.randn(width, c, p, p).astype(np.float32)
    patch = rs.randn(p, p, c).astype(np.float32)  # HWC
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(patch.transpose(2, 0, 1))[None],
        torch.from_numpy(w),
    ).numpy().reshape(width)
    kernel = _conv1_to_kernel(w)  # [(p p c), width]
    ours = patch.reshape(-1) @ kernel
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def _synthetic_avion_state(vw=32, vl=1, vh=2, tw=16, tl=1, p=16, img=32,
                           frames=2, ctx=8, vocab=64, embed=16):
    rs = np.random.RandomState(1)
    t = lambda *s: torch.from_numpy(rs.randn(*s).astype(np.float32) * 0.02)
    n = (img // p) ** 2
    sd = {}
    sd["visual.class_embedding"] = t(vw)
    sd["visual.positional_embedding"] = t(n + 1, vw)
    sd["visual.temporal_embedding"] = t(frames, vw)
    sd["visual.conv1.weight"] = t(vw, 3, p, p)
    sd["visual.ln_pre.weight"] = torch.ones(vw)
    sd["visual.ln_pre.bias"] = torch.zeros(vw)
    for i in range(vl):
        pre = f"visual.transformer.resblocks.{i}"
        sd[f"{pre}.ln_1.weight"] = torch.ones(vw)
        sd[f"{pre}.ln_1.bias"] = torch.zeros(vw)
        sd[f"{pre}.ln_2.weight"] = torch.ones(vw)
        sd[f"{pre}.ln_2.bias"] = torch.zeros(vw)
        sd[f"{pre}.attn.Wqkv.weight"] = t(3 * vw, vw)
        sd[f"{pre}.attn.Wqkv.bias"] = t(3 * vw)
        sd[f"{pre}.attn.out_proj.weight"] = t(vw, vw)
        sd[f"{pre}.attn.out_proj.bias"] = t(vw)
        sd[f"{pre}.mlp.fc1.weight"] = t(4 * vw, vw)
        sd[f"{pre}.mlp.fc1.bias"] = t(4 * vw)
        sd[f"{pre}.mlp.fc2.weight"] = t(vw, 4 * vw)
        sd[f"{pre}.mlp.fc2.bias"] = t(vw)
    sd["visual.ln_post.weight"] = torch.ones(vw)
    sd["visual.ln_post.bias"] = torch.zeros(vw)
    sd["image_projection"] = t(vw, embed)
    sd["textual.token_embedding.weight"] = t(vocab, tw)
    sd["textual.positional_embedding"] = t(ctx, tw)
    for i in range(tl):
        pre = f"textual.transformer.resblocks.{i}"
        sd[f"{pre}.ln_1.weight"] = torch.ones(tw)
        sd[f"{pre}.ln_1.bias"] = torch.zeros(tw)
        sd[f"{pre}.ln_2.weight"] = torch.ones(tw)
        sd[f"{pre}.ln_2.bias"] = torch.zeros(tw)
        sd[f"{pre}.attn.in_proj_weight"] = t(3 * tw, tw)
        sd[f"{pre}.attn.in_proj_bias"] = t(3 * tw)
        sd[f"{pre}.attn.out_proj.weight"] = t(tw, tw)
        sd[f"{pre}.attn.out_proj.bias"] = t(tw)
        sd[f"{pre}.mlp.c_fc.weight"] = t(4 * tw, tw)
        sd[f"{pre}.mlp.c_fc.bias"] = t(4 * tw)
        sd[f"{pre}.mlp.c_proj.weight"] = t(tw, 4 * tw)
        sd[f"{pre}.mlp.c_proj.bias"] = t(tw)
    sd["textual.ln_final.weight"] = torch.ones(tw)
    sd["textual.ln_final.bias"] = torch.zeros(tw)
    sd["textual.text_projection"] = t(tw, embed)
    sd["logit_scale"] = torch.tensor(2.66)
    return sd


def test_import_avion_checkpoint_roundtrip(tmp_path):
    sd = _synthetic_avion_state()
    path = str(tmp_path / "ckpt.pt")
    torch.save({"epoch": 3, "state_dict": {f"module.{k}": v for k, v in sd.items()}}, path)

    model = CLIP(
        embed_dim=16, image_size=32, patch_size=16, num_frames=2,
        vision_width=32, vision_layers=1, vision_heads=2, context_length=8,
        vocab_size=64, text_width=16, text_heads=2, text_layers=1,
        use_flash=False, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(0)
    video = jnp.zeros((1, 2, 32, 32, 3))
    text = jnp.zeros((1, 8), jnp.int32)
    init = model.init(rng, video, text)["params"]

    imported = import_clip_pt(path, num_frames=2, context_length=8, vocab_size=64)
    params = merge_into_params(init, imported)

    out = model.apply({"params": params}, video, text)
    assert np.isfinite(np.asarray(out["image_embed"])).all()
    np.testing.assert_allclose(float(out["logit_scale"]), np.exp(2.66), rtol=1e-5)
    # weights actually landed (conv1 kernel is not the random init)
    got = params["visual"]["conv1"]["kernel"]
    want = _conv1_to_kernel(sd["visual.conv1.weight"].numpy())
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_temporal_inflation():
    sd = _synthetic_avion_state(frames=2)
    imported = import_clip_pt(
        {k: v.numpy() for k, v in sd.items()}, num_frames=4,
        context_length=8, vocab_size=64,
    )
    assert imported["visual"]["temporal_embedding"].shape[0] == 4
    old = sd["visual.temporal_embedding"].numpy()
    new = imported["visual"]["temporal_embedding"]
    np.testing.assert_allclose(new[0], old[0], rtol=1e-6)
    np.testing.assert_allclose(new[-1], old[-1], rtol=1e-6)
