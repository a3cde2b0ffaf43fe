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


def make_mesh(
    data: int = -1,
    fsdp: int = 1,
    tensor: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    sp: int = 1,
    pp: int = 1,
    ep: int = 1,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    rest = fsdp * pp * sp * ep * tensor
    if data == -1:
        assert n % rest == 0, (n, fsdp, pp, sp, ep, tensor)
        data = n // rest
    assert data * rest == n, \
        f"mesh {data}x{fsdp}x{pp}x{sp}x{ep}x{tensor} != {n} devices"
    # Contiguous device order: tensor fastest (innermost ICI ring), then
    # ep (MoE all_to_alls), then sp (ring-attention permutes ride
    # nearest neighbors), then pp (stage-to-stage ppermutes), then fsdp,
    # then data.
    arr = np.asarray(devices).reshape(data, fsdp, pp, sp, ep, tensor)
    return Mesh(arr, MESH_AXES)


def mesh_from_config(cfg, devices=None) -> Mesh:
    d, f, t = cfg.axis_sizes(len(devices if devices is not None else jax.devices()))
    return make_mesh(d, f, t, devices, sp=getattr(cfg, "sp", 1),
                     pp=getattr(cfg, "pp", 1), ep=getattr(cfg, "ep", 1))


def n_batch_shards(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS] * mesh.shape[FSDP_AXIS]


def local_batch_slice(mesh: Mesh, global_batch: int) -> int:
    """Per-host batch size for multi-host feeding (replaces
    DistributedSampler per-rank slicing)."""
    n_hosts = jax.process_count()
    assert global_batch % n_hosts == 0, (global_batch, n_hosts)
    return global_batch // n_hosts
