"""Round-trip: our params -> reference .pt layout -> re-import == identity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from avion_tpu.models.clip import CLIP
from avion_tpu.models.pt_import import import_clip_pt, merge_into_params
from avion_tpu.tools.convert_checkpoint import export_clip_to_pt


def test_export_reimport_roundtrip(tmp_path):
    model = CLIP(
        embed_dim=16, image_size=32, patch_size=16, num_frames=2,
        vision_width=32, vision_layers=1, vision_heads=2, context_length=8,
        vocab_size=64, text_width=16, text_heads=2, text_layers=1,
        use_flash=False, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(42)
    video = jnp.zeros((1, 2, 32, 32, 3))
    text = jnp.zeros((1, 8), jnp.int32)
    params = jax.tree_util.tree_map(
        np.asarray, model.init(rng, video, text)["params"])

    path = str(tmp_path / "export.pt")
    n = export_clip_to_pt(params, path)
    assert n > 20

    imported = import_clip_pt(path, num_frames=2, context_length=8,
                              vocab_size=64)
    merged = merge_into_params(
        jax.tree_util.tree_map(np.copy, params), imported)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = {tuple(str(k) for k in p): v
              for p, v in jax.tree_util.tree_flatten_with_path(merged)[0]}
    for p, va in flat_a:
        key = tuple(str(k) for k in p)
        np.testing.assert_allclose(
            va, flat_b[key], rtol=1e-6,
            err_msg=f"mismatch at {key}",
        )

    # and the forward passes agree
    rs = np.random.RandomState(0)
    v = jnp.asarray(rs.rand(2, 2, 32, 32, 3), jnp.float32)
    t = jnp.asarray(rs.randint(0, 64, (2, 8)), jnp.int32)
    out_a = model.apply({"params": params}, v, t)
    out_b = model.apply({"params": merged}, v, t)
    np.testing.assert_allclose(np.asarray(out_a["image_embed"]),
                               np.asarray(out_b["image_embed"]), rtol=1e-5)
