"""Device mesh construction.

TPU-native replacement for the reference's process-per-GPU NCCL world
(``avion/utils/distributed.py:75-97``).  There is no DDP analogue: a
single pjit-compiled step function is partitioned over the mesh and XLA
inserts the collectives (gradient psum over ``data``/``fsdp``, gathers
over ``tensor``) on ICI.

Axes:
  data   — pure data parallelism (batch sharding; grad all-reduce)
  fsdp   — data parallelism + parameter/optimizer-state sharding
           (subsumes ZeRO-1, scripts/main_lavila_pretrain.py:322-332)
  tensor — tensor/model parallelism for large towers (beyond parity)

Multi-slice (DCN) topologies: ``dcn_data > 1`` builds a hybrid mesh
where the OUTER blocks of the ``data`` axis are whole TPU slices, so
the only collective that crosses the (slow) data-center network is the
gradient all-reduce's inter-slice hop; every model-axis collective
(fsdp gathers, tensor gathers, pp/sp ppermutes, ep all_to_alls) stays
on intra-slice ICI.  This is the standard pod-scale recipe (hybrid
device meshes, cf. jax.experimental.mesh_utils) — the reference never
scales past one NCCL world (avion/utils/distributed.py:75-97).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
PP_AXIS = "pp"  # pipeline parallelism (GPipe over stages) — beyond parity
SP_AXIS = "sp"  # sequence parallelism (ring attention) — beyond parity
EP_AXIS = "ep"  # expert parallelism (MoE all_to_all) — beyond parity
TENSOR_AXIS = "tensor"
# batch dims shard over both DP-like axes so global batch = data*fsdp*per_shard
BATCH_AXES = (DATA_AXIS, FSDP_AXIS)
MESH_AXES = (DATA_AXIS, FSDP_AXIS, PP_AXIS, SP_AXIS, EP_AXIS, TENSOR_AXIS)


def group_devices_by_slice(devices: Sequence, dcn_data: int):
    """Partition ``devices`` into ``dcn_data`` equal slice groups.

    Grouping key, in preference order: the TPU runtime's
    ``slice_index`` (real multi-slice), then ``process_index`` blocks
    (multi-host single-slice emulation / CPU tests), then plain
    contiguous blocks (single-process virtual meshes).  Groups are
    ordered by their smallest key so the layout is deterministic.
    Returns a list of ``dcn_data`` device lists of equal length.
    """
    n = len(devices)
    assert n % dcn_data == 0, (n, dcn_data)
    per = n // dcn_data

    def _try(keyf):
        groups = {}
        for d in devices:
            k = keyf(d)
            if k is None:
                return None
            groups.setdefault(k, []).append(d)
        if len(groups) == dcn_data and all(
                len(g) == per for g in groups.values()):
            return [groups[k] for k in sorted(groups)]
        if len(groups) % dcn_data == 0 and len(groups) > dcn_data:
            # more groups than slices (e.g. several processes per
            # slice): pack consecutive groups into slice-sized blocks
            keys = sorted(groups)
            merged = []
            stride = len(keys) // dcn_data
            for i in range(dcn_data):
                blk = []
                for k in keys[i * stride : (i + 1) * stride]:
                    blk.extend(groups[k])
                merged.append(blk)
            if all(len(g) == per for g in merged):
                return merged
        return None

    got = _try(lambda d: getattr(d, "slice_index", None))
    if got is None and dcn_data > 1:
        got = _try(lambda d: getattr(d, "process_index", None))
    if got is None:
        devices = list(devices)
        got = [devices[i * per : (i + 1) * per] for i in range(dcn_data)]
    return got


def hybrid_device_array(devices, data, fsdp, pp, sp, ep, tensor,
                        dcn_data) -> np.ndarray:
    """Hybrid multi-slice device layout: slice s owns data rows
    [s*data/dcn, (s+1)*data/dcn) — all model axes are intra-slice
    (ICI); only the outer data blocks talk across DCN."""
    assert data % dcn_data == 0, (
        f"data axis {data} must be a multiple of dcn_data {dcn_data}")
    groups = group_devices_by_slice(devices, dcn_data)
    return np.stack([
        np.asarray(g).reshape(data // dcn_data, fsdp, pp, sp, ep, tensor)
        for g in groups
    ]).reshape(data, fsdp, pp, sp, ep, tensor)


def make_mesh(
    data: int = -1,
    fsdp: int = 1,
    tensor: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    sp: int = 1,
    pp: int = 1,
    ep: int = 1,
    dcn_data: int = 1,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    rest = fsdp * pp * sp * ep * tensor
    if data == -1:
        assert n % rest == 0, (n, fsdp, pp, sp, ep, tensor)
        data = n // rest
    assert data * rest == n, \
        f"mesh {data}x{fsdp}x{pp}x{sp}x{ep}x{tensor} != {n} devices"
    if dcn_data > 1:
        arr = hybrid_device_array(devices, data, fsdp, pp, sp, ep, tensor,
                                  dcn_data)
        return Mesh(arr, MESH_AXES)
    # Contiguous device order: tensor fastest (innermost ICI ring), then
    # ep (MoE all_to_alls), then sp (ring-attention permutes ride
    # nearest neighbors), then pp (stage-to-stage ppermutes), then fsdp,
    # then data.
    arr = np.asarray(devices).reshape(data, fsdp, pp, sp, ep, tensor)
    return Mesh(arr, MESH_AXES)


def mesh_from_config(cfg, devices=None) -> Mesh:
    d, f, t = cfg.axis_sizes(len(devices if devices is not None else jax.devices()))
    return make_mesh(d, f, t, devices, sp=getattr(cfg, "sp", 1),
                     pp=getattr(cfg, "pp", 1), ep=getattr(cfg, "ep", 1),
                     dcn_data=getattr(cfg, "dcn_data", 1))


def n_batch_shards(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS] * mesh.shape[FSDP_AXIS]


def local_batch_slice(mesh: Mesh, global_batch: int) -> int:
    """Per-host batch size for multi-host feeding (replaces
    DistributedSampler per-rank slicing)."""
    n_hosts = jax.process_count()
    assert global_batch % n_hosts == 0, (global_batch, n_hosts)
    return global_batch // n_hosts
