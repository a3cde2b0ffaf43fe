"""Ring attention: sequence-parallel attention over a mesh axis.

Beyond-parity capability (the reference has no sequence/context
parallelism — SURVEY §5.7): shards the token dimension over an ``sp``
mesh axis so clips far longer than one chip's memory can be attended.
Each device holds its sequence shard of Q/K/V; K/V blocks rotate around
the ring with ``jax.lax.ppermute`` while a numerically-stable online
softmax accumulates partial attention — the blockwise-parallel /
ring-attention construction, expressed at the XLA level (collectives on
ICI, autodiff through the permutation chain for free).

Use under ``jax.shard_map`` with the token axis sharded::

    out = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="sp"),
        mesh=mesh,
        in_specs=P(None, "sp", None, None),
        out_specs=P(None, "sp", None, None),
    )(q, k, v)
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def ring_attention(
    q: jax.Array,   # [B, S_local, H, D]
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Bidirectional attention over the full (sharded) sequence.
    Returns the local output shard [B, S_local, H, D]."""
    b, s_local, h, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    n = jax.lax.axis_size(axis_name)

    qf = q.astype(jnp.float32) * sm_scale

    def block(q_blk, k_blk, v_blk):
        # [B, H, Sq, Sk] logits; returns (out_unnorm, row_max, row_sum)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q_blk, k_blk.astype(jnp.float32))
        m = jnp.max(logits, axis=-1)
        p = jnp.exp(logits - m[..., None])
        l = jnp.sum(p, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, v_blk.astype(jnp.float32))
        return o, m, l

    def body(carry, _):
        k_cur, v_cur, o_acc, m_acc, l_acc = carry
        o_blk, m_blk, l_blk = block(qf, k_cur, v_cur)
        # online softmax merge
        m_new = jnp.maximum(m_acc, m_blk)
        a = jnp.exp(m_acc - m_new)
        bfac = jnp.exp(m_blk - m_new)
        l_new = l_acc * a + l_blk * bfac
        o_new = (o_acc * a.transpose(0, 2, 1)[..., None]
                 + o_blk * bfac.transpose(0, 2, 1)[..., None])
        # rotate kv to the next device on the ring
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, o_new, m_new, l_new), None

    o0 = jnp.zeros((b, s_local, h, d), jnp.float32)
    m0 = jnp.full((b, h, s_local), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, s_local), jnp.float32)
    (k_f, v_f, o, m, l), _ = jax.lax.scan(
        body, (k, v, o0, m0, l0), None, length=n
    )
    out = o / l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def sequence_parallel_attention(q, k, v, mesh=None, axis_name: str = "sp",
                                sm_scale=None, batch_axes=None):
    """Convenience wrapper: shard_map over the token dim of BSHD inputs.

    ``mesh=None`` uses the ambient mesh (``jax.set_mesh`` context, the
    way the train steps run); ``batch_axes`` shards the batch dim (the
    model's data axes) so the ring runs inside an ordinary dp/fsdp
    step."""
    from jax.sharding import PartitionSpec as P

    if batch_axes is None:
        from avion_tpu.parallel.mesh import BATCH_AXES

        batch_axes = BATCH_AXES
    # keep only axes the target mesh actually has (tests use sp-only
    # meshes; the model path runs under the full data/fsdp/sp mesh)
    m = mesh
    if m is None:
        from jax.sharding import get_abstract_mesh

        m = get_abstract_mesh()
    batch_axes = tuple(a for a in batch_axes if a in m.axis_names)
    spec = P(batch_axes if batch_axes else None, axis_name, None, None)
    kw = {} if mesh is None else {"mesh": mesh}
    fn = jax.shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name=axis_name,
                                       sm_scale=sm_scale),
        in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False, **kw,
    )
    return fn(q, k, v)
