"""Pipeline parallelism (GPipe over the ``pp`` mesh axis).

Correctness contract: the pipelined stack must match a sequential
``Transformer`` forward and backward exactly (same params, same math),
for any microbatch count, on a multi-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avion_tpu.models.layers import Transformer
from avion_tpu.parallel import make_mesh, shard_params
from avion_tpu.parallel.pipeline import (PipelinedTransformer,
                                         stack_block_params,
                                         unstack_block_params)

pytestmark = pytest.mark.slow  # excluded from the quick CI tier

WIDTH, LAYERS, HEADS = 64, 4, 2


def _seq_model():
    return Transformer(width=WIDTH, layers=LAYERS, heads=HEADS,
                       use_flash=False, dtype=jnp.float32)


def _pipe_model(mesh, m=2, causal=False):
    return PipelinedTransformer(width=WIDTH, layers=LAYERS, heads=HEADS,
                                use_flash=False, dtype=jnp.float32,
                                num_microbatches=m, mesh=mesh, causal=causal)


def _data(b=4, s=16):
    rng = jax.random.PRNGKey(3)
    return jax.random.normal(rng, (b, s, WIDTH), jnp.float32)


def test_pipeline_matches_sequential_forward():
    mesh = make_mesh(data=2, pp=4)
    seq = _seq_model()
    x = _data()
    seq_params = seq.init(jax.random.PRNGKey(0), x)["params"]
    ref = seq.apply({"params": seq_params}, x)

    pipe = _pipe_model(mesh)
    stacked = stack_block_params(seq_params, LAYERS)
    out = jax.jit(lambda p, x: pipe.apply({"params": p}, x))(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("m", [1, 2, 4])
def test_pipeline_microbatch_counts(m):
    mesh = make_mesh(data=4, pp=2)
    seq = _seq_model()
    x = _data(b=4)
    seq_params = seq.init(jax.random.PRNGKey(0), x)["params"]
    ref = seq.apply({"params": seq_params}, x)
    pipe = _pipe_model(mesh, m=m)
    stacked = stack_block_params(seq_params, LAYERS)
    out = jax.jit(lambda p, x: pipe.apply({"params": p}, x))(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_gradients_match_sequential():
    mesh = make_mesh(data=2, pp=4)
    seq = _seq_model()
    x = _data()
    seq_params = seq.init(jax.random.PRNGKey(0), x)["params"]
    pipe = _pipe_model(mesh)
    stacked = stack_block_params(seq_params, LAYERS)

    def loss_seq(p):
        return jnp.sum(seq.apply({"params": p}, x) ** 2)

    def loss_pipe(p):
        return jnp.sum(pipe.apply({"params": p}, x) ** 2)

    g_seq = stack_block_params(jax.grad(loss_seq)(seq_params), LAYERS)
    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    for name in g_seq:
        np.testing.assert_allclose(
            np.asarray(g_pipe[name]), np.asarray(g_seq[name]),
            atol=1e-4, rtol=1e-4, err_msg=name)


def test_pipeline_init_and_param_roundtrip():
    mesh = make_mesh(data=2, pp=4)
    pipe = _pipe_model(mesh)
    x = _data()
    with jax.set_mesh(mesh):
        params = pipe.init(jax.random.PRNGKey(0), x)["params"]
    assert params["qkv_kernel"].shape == (LAYERS, WIDTH, 3 * WIDTH)
    # stacked <-> sequential roundtrip is exact
    seq_tree = unstack_block_params(params)
    back = stack_block_params(seq_tree, LAYERS)
    for name in params:
        np.testing.assert_array_equal(np.asarray(back[name]),
                                      np.asarray(params[name]))
    # the restacked params drive the sequential Transformer (interop)
    seq = _seq_model()
    ref = seq.apply({"params": seq_tree}, x)
    with jax.set_mesh(mesh):
        out = pipe.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_params_shard_over_pp():
    mesh = make_mesh(data=1, fsdp=2, pp=4)
    pipe = _pipe_model(mesh)
    x = _data()
    with jax.set_mesh(mesh):
        params = pipe.init(jax.random.PRNGKey(0), x)["params"]
        params = shard_params(params, mesh)
    spec = params["qkv_kernel"].sharding.spec
    assert spec[0] == "pp", spec


def test_pipeline_causal_stack():
    # causal variant (the narrator's decoder is the pp target)
    mesh = make_mesh(data=2, pp=4)
    seq = Transformer(width=WIDTH, layers=LAYERS, heads=HEADS,
                      use_flash=False, dtype=jnp.float32, causal=True)
    x = _data()
    seq_params = seq.init(jax.random.PRNGKey(0), x)["params"]
    ref = seq.apply({"params": seq_params}, x)
    pipe = _pipe_model(mesh, causal=True)
    stacked = stack_block_params(seq_params, LAYERS)
    out = jax.jit(lambda p, x: pipe.apply({"params": p}, x))(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_remat_matches_exact():
    """remat=True (per-block save_attn checkpointing inside each stage)
    is a memory knob, not a math change: forward and gradients must
    match the non-remat pipeline bit-for-bit-ish."""
    mesh = make_mesh(data=2, pp=4)
    seq = _seq_model()
    x = _data()
    seq_params = seq.init(jax.random.PRNGKey(0), x)["params"]
    stacked = stack_block_params(seq_params, LAYERS)

    def loss(pipe):
        def f(p, x):
            return jnp.sum(pipe.apply({"params": p}, x) ** 2)
        return f

    plain = _pipe_model(mesh)
    remat = PipelinedTransformer(width=WIDTH, layers=LAYERS, heads=HEADS,
                                 use_flash=False, dtype=jnp.float32,
                                 num_microbatches=2, mesh=mesh, remat=True)
    l0, g0 = jax.jit(jax.value_and_grad(loss(plain)))(stacked, x)
    l1, g1 = jax.jit(jax.value_and_grad(loss(remat)))(stacked, x)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g0[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)
