import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avion_tpu.ops.attention import xla_attention
from avion_tpu.ops.flash_attention import flash_attention

pytestmark = pytest.mark.slow  # excluded from the quick CI tier


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


def test_head_dim_128_geometry(rng):
    """The H128 model variants (CLIP_VITB16_H128 etc.) run hpp=1 with a
    full 128-lane stripe per head: forward + grads vs XLA."""
    q, k, v = _mk(rng, b=2, s=130, h=2, d=128)
    ref = xla_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v):
        o = xla_attention(q, k, v)
        return jnp.sum(o * jnp.cos(o))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=f"d{name} mismatch")

    # fused-qkv entry at d=128 (the H128 model path)
    from avion_tpu.ops.flash_attention import flash_attention_fused_qkv

    qkv_p, q_, k_, v_ = _mk_fused(rng, b=2, s=130, h=2, d=128,
                                  pad_mode="garbage")
    ref = xla_attention(q_, k_, v_)
    out = flash_attention_fused_qkv(qkv_p, 2, 130, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out[:, :130].reshape(2, 130, 2, 128)), np.asarray(ref),
        atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# fused-qkv (zero-copy views) entry
# ---------------------------------------------------------------------------


def _mk_fused(rng, b=2, s=200, h=2, d=64, dtype=jnp.float32, pad_mode="zero"):
    """Build a fused [B, S_pad, 3W] array + the unpacked reference
    views.  pad_mode="garbage" fills pad rows with large finite values
    (the bias-row case the kernels must mask)."""
    k1 = jax.random.split(rng, 1)[0]
    w = h * d
    s_pad = (s + 127) // 128 * 128
    qkv = jax.random.normal(k1, (b, s, 3 * w), dtype)
    if pad_mode == "zero":
        pad = jnp.zeros((b, s_pad - s, 3 * w), dtype)
    else:
        pad = jnp.full((b, s_pad - s, 3 * w), 37.5, dtype)
    qkv_p = jnp.concatenate([qkv, pad], axis=1) if s_pad != s else qkv
    unpack = lambda t: t.reshape(b, s, h, d)
    q, k, v = (unpack(qkv[..., i * w : (i + 1) * w]) for i in range(3))
    return qkv_p, q, k, v


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seq,pad_mode", [(77, "zero"), (200, "garbage"),
                                          (256, "zero"), (785, "garbage")])
def test_fused_qkv_forward_matches_xla(rng, causal, seq, pad_mode):
    from avion_tpu.ops.flash_attention import flash_attention_fused_qkv

    qkv_p, q, k, v = _mk_fused(rng, s=seq, pad_mode=pad_mode)
    ref = xla_attention(q, k, v, causal=causal)
    out = flash_attention_fused_qkv(qkv_p, 2, seq, causal=causal,
                                    interpret=True)
    b, s, h, d = q.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref).reshape(
        b, s, h * d), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("pad_mode", ["zero", "garbage"])
def test_fused_qkv_grads_match_xla(rng, causal, pad_mode):
    """d(qkv_p) through the fused kernels == autodiff through XLA
    attention on the sliced sections; pad-row grads are exactly what
    slicing implies (dq section zero; dk/dv sections may be nonzero
    garbage that the zero rows of the projection input annihilate in
    the dense VJP — here we compare only the real rows)."""
    from avion_tpu.ops.flash_attention import flash_attention_fused_qkv

    s, h, d = 150, 2, 64
    qkv_p, *_ = _mk_fused(rng, b=1, s=s, h=h, d=d, pad_mode=pad_mode)
    w = h * d

    def loss_fused(qkv_p):
        o = flash_attention_fused_qkv(qkv_p, h, s, causal=causal,
                                      interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(qkv_p):
        b = qkv_p.shape[0]
        unpack = lambda t: t.reshape(b, s, h, d)
        q = unpack(qkv_p[:, :s, :w])
        k = unpack(qkv_p[:, :s, w : 2 * w])
        v = unpack(qkv_p[:, :s, 2 * w :])
        o = xla_attention(q, k, v, causal=causal)
        return jnp.sum(o * jnp.cos(o))

    g1 = jax.grad(loss_fused)(qkv_p)
    g2 = jax.grad(loss_ref)(qkv_p)
    np.testing.assert_allclose(np.asarray(g1[:, :s]),
                               np.asarray(g2[:, :s]),
                               atol=5e-4, rtol=5e-4)
    # pad rows must be exactly zero (they feed the dense VJP, where
    # inf/NaN times the zero input rows would poison dW)
    np.testing.assert_array_equal(np.asarray(g1[:, s:]),
                                  np.zeros_like(np.asarray(g1[:, s:])))
    assert np.isfinite(np.asarray(g1)).all()


def test_fused_qkv_videomae_decoder_shape(rng):
    """s=1570 -> s_pad=1664=13*128 (prime block factor): exercises the
    divisor-constrained multi-block path (block_q=128)."""
    from avion_tpu.ops.flash_attention import (_fused_block_q,
                                               flash_attention_fused_qkv)

    assert _fused_block_q(1664, 2) == 128
    s, h, d = 1570, 2, 64
    qkv_p, q, k, v = _mk_fused(rng, b=1, s=s, h=h, d=d, pad_mode="garbage")
    ref = xla_attention(q, k, v)
    out = flash_attention_fused_qkv(qkv_p, h, s, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref).reshape(1, s, h * d),
                               atol=2e-5, rtol=2e-5)

    def loss_fused(qkv_p):
        o = flash_attention_fused_qkv(qkv_p, h, s, interpret=True)
        return jnp.sum(o ** 2)

    g = jax.grad(loss_fused)(qkv_p)
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_array_equal(np.asarray(g[:, s:]),
                                  np.zeros_like(np.asarray(g[:, s:])))


def test_selfattention_fused_model_path_matches_reference(rng, monkeypatch):
    """The model-level TPU fast path (pad once -> fused-qkv views) is
    numerically identical to the plain packed path — exercised on CPU
    by forcing the dispatch and running the kernels in interpret mode."""
    import functools
    import importlib

    # package re-export shadows the submodule; resolve explicitly
    A = importlib.import_module("avion_tpu.ops.attention")
    from avion_tpu.models.layers import SelfAttention
    from avion_tpu.ops.flash_attention import flash_attention_fused_qkv

    monkeypatch.setattr(A, "_on_tpu", lambda: True)
    monkeypatch.setattr(
        A, "flash_attention_fused_qkv",
        functools.partial(flash_attention_fused_qkv, interpret=True))

    for s, causal in ((50, False), (77, True)):
        x = jax.random.normal(rng, (2, s, 64), jnp.float32)
        sa_fast = SelfAttention(64, 2, jnp.float32, use_flash=True,
                                causal=causal)
        sa_ref = SelfAttention(64, 2, jnp.float32, use_flash=False,
                               causal=causal)
        params = sa_ref.init(rng, x)["params"]
        y_ref = sa_ref.apply({"params": params}, x)
        y_fast = sa_fast.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                                   atol=2e-5, rtol=2e-5)

        # grads through the fused path match too
        g_ref = jax.grad(lambda p: jnp.sum(
            sa_ref.apply({"params": p}, x) ** 2))(params)
        g_fast = jax.grad(lambda p: jnp.sum(
            sa_fast.apply({"params": p}, x) ** 2))(params)
        for va, vb in zip(jax.tree_util.tree_leaves(g_ref),
                          jax.tree_util.tree_leaves(g_fast)):
            np.testing.assert_allclose(np.asarray(vb), np.asarray(va),
                                       atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("pad_mode", ["zero", "bias"])
def test_fused_qkv_combined_bwd_matches_split(rng, causal, pad_mode):
    """The single-program combined backward (shared score recompute,
    VERDICT r2 #1) produces the same dqkv as the split dq/dkv kernels
    and as XLA autodiff."""
    import importlib

    # (plain `import ... as` would bind the identically-named function
    # re-exported by the ops package, not the module)
    fam = importlib.import_module("avion_tpu.ops.flash_attention")

    s, h, d = 150, 2, 64
    qkv_p, *_ = _mk_fused(rng, b=1, s=s, h=h, d=d, pad_mode=pad_mode)
    w = h * d

    def loss_fused(qkv_p):
        o = fam.flash_attention_fused_qkv(qkv_p, h, s, causal=causal,
                                         interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(qkv_p):
        b = qkv_p.shape[0]
        unpack = lambda t: t.reshape(b, s, h, d)
        o = xla_attention(unpack(qkv_p[:, :s, :w]),
                          unpack(qkv_p[:, :s, w : 2 * w]),
                          unpack(qkv_p[:, :s, 2 * w :]), causal=causal)
        return jnp.sum(o * jnp.cos(o))

    old = fam._COMBINED_BWD
    try:
        fam._COMBINED_BWD = False
        g_split = jax.grad(loss_fused)(qkv_p)
        fam._COMBINED_BWD = True
        g_comb = jax.grad(loss_fused)(qkv_p)
    finally:
        fam._COMBINED_BWD = old
    g_ref = jax.grad(loss_ref)(qkv_p)
    np.testing.assert_allclose(np.asarray(g_comb[:, :s]),
                               np.asarray(g_split[:, :s]),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(np.asarray(g_comb[:, :s]),
                               np.asarray(g_ref[:, :s]),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_array_equal(np.asarray(g_comb[:, s:]),
                                  np.zeros_like(np.asarray(g_comb[:, s:])))
