"""Multi-slice (DCN) hybrid mesh layout.

``make_mesh(dcn_data=N)`` must place whole slices as the OUTER blocks
of the data axis so model-axis collectives (fsdp/tensor/pp/sp/ep) stay
on intra-slice ICI and only the gradient all-reduce crosses DCN —
the pod-scale recipe the reference's single NCCL world never reaches
(avion/utils/distributed.py:75-97).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from avion_tpu.core.config import MeshConfig
from avion_tpu.parallel import group_devices_by_slice, make_mesh
from avion_tpu.parallel.mesh import hybrid_device_array, mesh_from_config


class FakeDev:
    """Stand-in device carrying the TPU runtime topology attributes."""

    def __init__(self, i, slice_index=None, process_index=0):
        self.id = i
        if slice_index is not None:
            self.slice_index = slice_index
        self.process_index = process_index

    def __repr__(self):
        return f"dev{self.id}"


def test_grouping_by_slice_index():
    # 16 devices, 4 slices, interleaved enumeration order
    devs = [FakeDev(i, slice_index=i % 4) for i in range(16)]
    groups = group_devices_by_slice(devs, 4)
    assert len(groups) == 4 and all(len(g) == 4 for g in groups)
    for s, g in enumerate(groups):
        assert all(d.slice_index == s for d in g)


def test_grouping_by_process_blocks():
    # no slice_index (CPU/emulated): 8 devices over 4 processes,
    # 2 slices -> 2 processes per slice, consecutive processes packed
    devs = [FakeDev(i, process_index=i // 2) for i in range(8)]
    groups = group_devices_by_slice(devs, 2)
    assert [d.id for d in groups[0]] == [0, 1, 2, 3]
    assert [d.id for d in groups[1]] == [4, 5, 6, 7]


def test_grouping_contiguous_fallback():
    devs = [FakeDev(i) for i in range(8)]
    groups = group_devices_by_slice(devs, 4)
    assert [[d.id for d in g] for g in groups] == [
        [0, 1], [2, 3], [4, 5], [6, 7]]


def test_unbalanced_slices_rejected():
    devs = [FakeDev(i, slice_index=0 if i < 3 else 1) for i in range(8)]
    # 3/5 split cannot satisfy slice grouping; falls back to contiguous
    groups = group_devices_by_slice(devs, 2)
    assert all(len(g) == 4 for g in groups)


def test_hybrid_layout_slices_are_outer_data_blocks():
    """With data=4, fsdp=2, dcn_data=2 over 2 fake slices, each slice
    must own a contiguous half of the data axis and ALL of fsdp."""
    devs = [FakeDev(i, slice_index=i // 8) for i in range(16)]
    arr = hybrid_device_array(devs, 4, 2, 1, 1, 1, 2, dcn_data=2)
    assert arr.shape == (4, 2, 1, 1, 1, 2)
    for di in range(4):
        want_slice = di // 2
        for d in arr[di].flat:
            assert d.slice_index == want_slice, (di, d.id)


def test_hybrid_requires_divisible_data():
    devs = [FakeDev(i, slice_index=i // 4) for i in range(8)]
    with pytest.raises(AssertionError):
        hybrid_device_array(devs, 1, 8, 1, 1, 1, 1, dcn_data=2)


def test_mesh_config_dcn_roundtrip():
    cfg = MeshConfig(data=4, fsdp=2, dcn_data=2)
    mesh = mesh_from_config(cfg)  # real 8-CPU devices, contiguous split
    assert mesh.shape["data"] == 4 and mesh.shape["fsdp"] == 2
    ids = [d.id for d in mesh.devices[:2].flat]
    assert ids == [0, 1, 2, 3]  # slice 0 = first contiguous block


def test_hybrid_mesh_trains_a_step():
    """End-to-end: gradient psum over ('data','fsdp') + fsdp parameter
    sharding execute on a dcn_data=2 hybrid CPU mesh."""
    mesh = make_mesh(data=4, fsdp=2, dcn_data=2)
    w = jnp.ones((16, 16), jnp.float32)
    x = jnp.arange(8 * 16, dtype=jnp.float32).reshape(8, 16) / 100.0
    wsh = jax.device_put(w, NamedSharding(mesh, P("fsdp", None)))
    xsh = jax.device_put(x, NamedSharding(mesh, P(("data", "fsdp"), None)))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g = jax.jit(jax.grad(loss))(wsh, xsh)
    ref = jax.grad(loss)(w, x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-5)
