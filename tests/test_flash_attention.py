import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avion_tpu.ops.attention import xla_attention
from avion_tpu.ops.flash_attention import flash_attention


def _mk(rng, b=2, s=200, h=3, d=64, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (b, s, h, d), dtype)
    k = jax.random.normal(k2, (b, s, h, d), dtype)
    v = jax.random.normal(k3, (b, s, h, d), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seq", [77, 128, 200, 785])
def test_forward_matches_xla(rng, causal, seq):
    q, k, v = _mk(rng, s=seq)
    ref = xla_attention(q, k, v, causal=causal)
    out = flash_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_grads_match_xla(rng, causal):
    q, k, v = _mk(rng, b=1, s=150, h=2, d=64)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=causal, interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v):
        o = xla_attention(q, k, v, causal=causal)
        return jnp.sum(o * jnp.cos(o))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4,
            err_msg=f"d{name} mismatch",
        )


def test_bf16_forward_close(rng):
    q, k, v = _mk(rng, s=260, dtype=jnp.bfloat16)
    ref = xla_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    out = flash_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


@pytest.mark.parametrize("causal", [False, True])
def test_grads_multiblock_path(rng, causal):
    """Force block_q < seq so the two-kernel backward runs (the fused
    single-block kernel handles the default ViT/text regime)."""
    q, k, v = _mk(rng, b=1, s=300, h=2, d=64)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=causal, block_q=128,
                            interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v):
        o = xla_attention(q, k, v, causal=causal)
        return jnp.sum(o * jnp.cos(o))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4,
            err_msg=f"d{name} mismatch",
        )


def test_heads_per_program_packing():
    """Head-group striping: hpp*d should hit 128 lanes when possible and
    always divide the head count."""
    from avion_tpu.ops.flash_attention import _heads_per_program

    assert _heads_per_program(12, 64) == 2   # ViT-B
    assert _heads_per_program(16, 64) == 2   # ViT-L
    assert _heads_per_program(8, 64) == 2    # text tower
    assert _heads_per_program(3, 64) == 1    # odd head count
    assert _heads_per_program(2, 32) == 2    # tiny models (d=32)
    assert _heads_per_program(1, 128) == 1


def test_odd_heads_and_small_head_dim(rng):
    """Exercise the hpp=1 (odd heads) and d=32 stripe paths."""
    for h, d in ((3, 64), (2, 32)):
        q, k, v = _mk(rng, b=2, s=130, h=h, d=d)
        ref = xla_attention(q, k, v)
        out = flash_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
