import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avion_tpu.parallel import (
    make_mesh,
    batch_sharding,
    infer_param_sharding,
    shard_params,
)
from avion_tpu.parallel.sharding import make_global_batch
from jax.sharding import PartitionSpec as P


def test_mesh_shape(mesh8):
    assert mesh8.shape["data"] == 4
    assert mesh8.shape["fsdp"] == 2
    assert mesh8.shape["tensor"] == 1


def test_batch_sharding_spans_dp_axes(mesh8):
    x = np.zeros((16, 3), np.float32)
    gx = make_global_batch(mesh8, x)
    assert gx.shape == (16, 3)
    # 8 shards of 2 rows each
    assert len(gx.addressable_shards) == 8
    assert gx.addressable_shards[0].data.shape == (2, 3)


def test_param_sharding_fsdp(mesh8):
    params = {
        "blocks_0": {"mlp": {"fc1": {"kernel": np.zeros((768, 3072), np.float32),
                                     "bias": np.zeros((3072,), np.float32)}}},
        "logit_scale": np.zeros((), np.float32),
    }
    sh = infer_param_sharding(params, mesh8)
    kernel_spec = sh["blocks_0"]["mlp"]["fc1"]["kernel"].spec
    assert "fsdp" in tuple(kernel_spec)
    assert sh["blocks_0"]["mlp"]["fc1"]["bias"].spec == P()
    assert sh["logit_scale"].spec == P()
    sharded = shard_params(params, mesh8)
    np.testing.assert_array_equal(
        np.asarray(sharded["blocks_0"]["mlp"]["fc1"]["kernel"]),
        params["blocks_0"]["mlp"]["fc1"]["kernel"],
    )


def test_tensor_axis_sharding():
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    params = {"attn": {"qkv": {"kernel": np.zeros((768, 2304), np.float32)}},
              "out_proj": {"kernel": np.zeros((768, 768), np.float32)}}
    sh = infer_param_sharding(params, mesh)
    assert sh["attn"]["qkv"]["kernel"].spec[-1] == "tensor"
    assert sh["out_proj"]["kernel"].spec[0] == "tensor"
