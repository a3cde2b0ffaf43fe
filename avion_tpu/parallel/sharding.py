"""Sharding rules for params, optimizer state, and batches.

Replaces the reference's DDP + ZeRO-1 combo
(``scripts/main_lavila_pretrain.py:283-340``) with sharding
annotations: under pjit, annotating parameters with an ``fsdp``-sharded
spec makes XLA keep one shard per device and all-gather on use, and the
optimizer state inherits the same sharding (fully-sharded optimizer
state — strictly stronger than ZeRO-1 — for free).

Rules are name/shape based:
  - batch arrays: first dim over ("data", "fsdp")
  - 2D+ params: largest dim divisible by fsdp size is sharded over "fsdp";
    a designated dim may shard over "tensor" (attention/MLP width).
  - small params (biases, norms, embeddings' small dims): replicated.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avion_tpu.parallel.mesh import (BATCH_AXES, EP_AXIS, FSDP_AXIS,
                                     PP_AXIS, TENSOR_AXIS)


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P(BATCH_AXES, *([None] * (ndim - 1))))


def batch_pspec(ndim: int = 1) -> P:
    return P(BATCH_AXES, *([None] * (ndim - 1)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Substrings of param paths that shard their *last* dim over "tensor"
# (column-parallel) or *first* dim over "tensor" (row-parallel) when a
# tensor axis is present.  ViT/Text blocks: qkv & mlp-in are column-
# parallel, proj & mlp-out are row-parallel (Megatron layout).
_COL_PARALLEL = ("qkv", "fc1", "in_proj")
_ROW_PARALLEL = ("out_proj", "fc2")
# stacked-pipeline param leaves ([layers, ...] or group-major [G, ...]
# leading dim over "pp"; see parallel/pipeline.py _LEAF_PATHS and
# pipeline_gated.py _SELF_PATHS/_CROSS_PATHS)
_PIPE_LEAVES = ("ln1_", "ln2_", "qkv_", "out_kernel", "out_bias",
                "fc1_", "fc2_", "lnx_", "lnxm_", "xattn_", "xmlp_")
# (gate_attn/gate_mlp are shape-[G] scalars-per-group: the ndim<=1
# early-return below replicates them, so listing them here would be
# dead config — they stay replicated by design)


def _spec_for_param(path: str, shape, mesh: Mesh) -> P:
    fsdp = mesh.shape[FSDP_AXIS]
    tensor = mesh.shape[TENSOR_AXIS]
    pp = mesh.shape.get(PP_AXIS, 1)
    ndim = len(shape)
    if ndim <= 1 or max(shape) < 128:
        return P()
    axes: list = [None] * ndim

    lname = path.lower()
    ep = mesh.shape.get(EP_AXIS, 1)
    if ep > 1 and "expert" in lname and shape[0] % ep == 0:
        axes[0] = EP_AXIS  # [E, ...] expert-stacked weights
    # "expert" leaves ([E, ...] stacked) are never pipeline-stacked —
    # without the guard, 'expert_fc1_bias' would substring-match 'fc1_'
    # and get its expert dim sharded over pp while the kernels stay
    # unsharded (inconsistent layout, avoidable resharding)
    if pp > 1 and "expert" not in lname \
            and any(k in lname for k in _PIPE_LEAVES) \
            and shape[0] % pp == 0 and axes[0] is None:
        axes[0] = PP_AXIS
    if tensor > 1:
        if any(k in lname for k in _COL_PARALLEL) and shape[-1] % tensor == 0:
            axes[-1] = TENSOR_AXIS
        elif any(k in lname for k in _ROW_PARALLEL) \
                and shape[0] % tensor == 0 and axes[0] is None:
            axes[0] = TENSOR_AXIS

    if fsdp > 1:
        # shard the largest remaining dim divisible by fsdp
        order = sorted(range(ndim), key=lambda i: -shape[i])
        for i in order:
            if axes[i] is None and shape[i] % fsdp == 0 and shape[i] >= fsdp * 8:
                axes[i] = FSDP_AXIS
                break
    return P(*axes)


def infer_param_sharding(params: Any, mesh: Mesh) -> Any:
    """Map a param pytree to a pytree of NamedShardings."""

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        spec = _spec_for_param(name, np.shape(leaf), mesh)
        out.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_params(params: Any, mesh: Mesh) -> Any:
    shardings = infer_param_sharding(params, mesh)
    return jax.device_put(params, shardings)


def make_global_batch(mesh: Mesh, host_batch: Any, batch_dim: int = 0) -> Any:
    """Assemble a globally-sharded batch from per-host numpy arrays.

    Replaces DistributedSampler rank slicing
    (``scripts/main_lavila_pretrain.py:557-573``): each host feeds its
    local shard; jax glues them into one global array.

    ``batch_dim=1`` shards dim 1 instead — the microbatch-major
    ``[update_freq, B_micro, ...]`` layout cached gradient accumulation
    scans over (dim 0 stays unsharded so the scan needs no resharding).
    """

    def put(x):
        nd = np.ndim(x)
        if batch_dim == 0 or nd <= batch_dim:
            sh = batch_sharding(mesh, nd)
        else:
            sh = NamedSharding(mesh, P(*([None] * batch_dim), BATCH_AXES,
                                       *([None] * (nd - batch_dim - 1))))
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree_util.tree_map(put, host_batch)
