"""Ring attention: sequence-parallel attention over a mesh axis.

Beyond-parity capability (the reference has no sequence/context
parallelism — SURVEY §5.7): shards the token dimension over an ``sp``
mesh axis so clips far longer than one chip's memory can be attended.
Each device holds its sequence shard of Q/K/V; K/V blocks rotate around
the ring with ``jax.lax.ppermute`` while a numerically-stable online
softmax (log2 domain) accumulates partial attention.

Two implementations, one contract:

- ``impl="flash"`` — each ring hop runs the Pallas flash kernel on the
  local shard (``ops/flash_attention``), merging the per-hop
  (out, lse) pairs online.  A custom VJP makes the backward a second
  ring pass that reuses the flash backward kernels with the *global*
  logsumexp: with p = exp2(s - lse_global), the per-hop dq/dk/dv
  contributions are exactly the hop-restricted columns of the global
  softmax gradient, so summing them around the ring is exact.  K/V (and
  their grad accumulators in the backward) travel as one stacked array
  per hop — a single ppermute on ICI.
- ``impl="xla"`` — pure-JAX blockwise fallback (CPU meshes, tests):
  keys are processed in ``block_k``-sized chunks inside each hop, so
  peak score memory is [B, H, S_local, block_k] f32 instead of the
  full [B, H, S_local, S_local] per hop.

Causal: queries on ring position i attend key blocks from positions
<= i.  Hop 0 is always the diagonal block (in-block causal mask);
later hops are either fully visible or fully masked — the flash path
voids masked hops with a score bias (no recompile, grads exactly 0),
the XLA path with a mask.

Use via :func:`sequence_parallel_attention` (shard_map wrapper), or
inside an existing shard_map with the token axis sharded.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from avion_tpu.ops.flash_attention import DEFAULT_MASK_VALUE, _bwd, _fwd

LOG2E = 1.4426950408889634


# ---------------------------------------------------------------------------
# pure-JAX blockwise ring (CPU fallback / reference semantics)
# ---------------------------------------------------------------------------


def ring_attention(
    q: jax.Array,   # [B, S_local, H, D]
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_k: int = 1024,
) -> jax.Array:
    """Blockwise ring attention over the full (sharded) sequence.
    Returns the local output shard [B, S_local, H, D].  Autodiff runs
    through the permutation chain (no custom VJP needed)."""
    b, s_loc, h, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)

    block_k = min(block_k, s_loc)
    s_pad = (s_loc + block_k - 1) // block_k * block_k
    nblk = s_pad // block_k

    # keep matmul inputs in storage dtype with f32 accumulation (MXU)
    qe = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    rows = jnp.arange(s_loc)  # local; global row = i*s_loc + row

    def hop(carry, j):
        kv_cur, o, m, l = carry
        # rotate FIRST: at scan step j (1..n-1) we hold block (i - j)
        perm = [(p, (p + 1) % n) for p in range(n)]
        kv_cur = jax.lax.ppermute(kv_cur, axis_name, perm)
        src = jnp.mod(i - j, n)
        o, m, l = _hop_blocks(qe, kv_cur, o, m, l, src=src, i=i, j=j,
                              causal=causal, rows=rows, block_k=block_k,
                              nblk=nblk, s_loc=s_loc)
        return (kv_cur, o, m, l), None

    o0 = jnp.zeros((b, s_loc, h, d), jnp.float32)
    m0 = jnp.full((b, h, s_loc), DEFAULT_MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((b, h, s_loc), jnp.float32)
    kv = jnp.stack([k, v])  # one ppermute per hop
    # hop 0: own (diagonal) block
    o0, m0, l0 = _hop_blocks(qe, kv, o0, m0, l0, src=i, i=i, j=0,
                             causal=causal, rows=rows, block_k=block_k,
                             nblk=nblk, s_loc=s_loc)
    (kv, o, m, l), _ = jax.lax.scan(hop, (kv, o0, m0, l0),
                                    jnp.arange(1, n)) if n > 1 else (
        (kv, o0, m0, l0), None)
    out = o / l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def _hop_blocks(qe, kv_cur, o, m, l, *, src, i, j, causal, rows, block_k,
                nblk, s_loc):
    """Process one ring hop's keys in ``block_k`` chunks with online
    softmax merge (peak scores: [B, H, S_local, block_k] f32)."""
    k_cur, v_cur = kv_cur[0], kv_cur[1]
    pad = nblk * block_k - s_loc
    if pad:
        k_cur = jnp.pad(k_cur, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v_cur = jnp.pad(v_cur, ((0, 0), (0, pad), (0, 0), (0, 0)))

    def chunk(carry, c):
        o, m_acc, l_acc = carry
        k_blk = jax.lax.dynamic_slice_in_dim(k_cur, c * block_k, block_k, 1)
        v_blk = jax.lax.dynamic_slice_in_dim(v_cur, c * block_k, block_k, 1)
        cols = c * block_k + jnp.arange(block_k)  # local key index
        bias = jnp.where(cols < s_loc, 0.0, DEFAULT_MASK_VALUE)
        bias = jnp.broadcast_to(bias[None, :], (rows.shape[0], block_k))
        if causal:
            # hop 0 is the diagonal (in-block causal); hops with
            # src > i hold future keys (fully masked); src < i past
            # keys (fully visible)
            col_g = src * s_loc + cols
            row_g = i * s_loc + rows
            bias = jnp.where(col_g[None, :] <= row_g[:, None], bias,
                             DEFAULT_MASK_VALUE)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qe, k_blk,
                            preferred_element_type=jnp.float32)
        logits = logits + bias[None, None]
        m_blk = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m_acc, m_blk)
        p = jnp.exp(logits - m_new[..., None])
        l_blk = jnp.sum(p, axis=-1)
        a = jnp.exp(m_acc - m_new)
        l_new = l_acc * a + l_blk
        o_blk = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v_blk.dtype), v_blk,
                           preferred_element_type=jnp.float32)
        o_new = o * a.transpose(0, 2, 1)[..., None] + o_blk
        return (o_new, m_new, l_new), None

    (o, m, l), _ = jax.lax.scan(chunk, (o, m, l), jnp.arange(nblk))
    return o, m, l


# ---------------------------------------------------------------------------
# Pallas flash ring (TPU): per-hop flash kernel + global-lse backward
# ---------------------------------------------------------------------------


def _merge_packed(o_a, lse_a, o_b, lse_b, heads):
    """Online merge of two normalized partial outputs (packed [B,S,W])
    with their log2-domain logsumexps [B, H//hpp, hpp, S_pad]."""
    m = jnp.maximum(lse_a, lse_b)
    ea = jnp.exp2(lse_a - m)
    eb = jnp.exp2(lse_b - m)
    lse = m + jnp.log2(ea + eb)
    wa = ea / (ea + eb)
    wb = eb / (ea + eb)

    def apply_w(o, w):
        b, s, wdt = o.shape
        d = wdt // heads
        # w: [B, nhb, hpp, S_pad] -> [B, S, H]
        wh = w.reshape(b, heads, -1)[:, :, :s].transpose(0, 2, 1)
        return (o.reshape(b, s, heads, d)
                * wh[..., None].astype(o.dtype)).reshape(b, s, wdt)

    return apply_w(o_a, wa) + apply_w(o_b, wb), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _ring_flash(q, k, v, heads, sm_scale, causal, axis_name, interpret):
    out, _ = _ring_flash_fwd(q, k, v, heads, sm_scale, causal, axis_name,
                             interpret)
    return out


def _ring_hop_bias(j, i, causal):
    """Traced scalar score bias for hop j: 0 (visible) or the mask value
    (this device's queries precede the hop's keys).  src = i - j mod n,
    so src > i  <=>  j > i."""
    if not causal:
        return jnp.float32(0.0)
    return jnp.where(j > i, DEFAULT_MASK_VALUE, 0.0).astype(jnp.float32)


def _ring_flash_fwd(q, k, v, heads, sm_scale, causal, axis_name, interpret):
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    # hop 0: the diagonal block — the only hop needing an in-block
    # causal mask (static kernel variant)
    out, lse = _fwd(q, k, v, heads, sm_scale, causal, None, interpret)

    def hop(carry, j):
        kv_cur, o_acc, lse_acc = carry
        perm = [(p, (p + 1) % n) for p in range(n)]
        kv_cur = jax.lax.ppermute(kv_cur, axis_name, perm)
        o_j, lse_j = _fwd(q, kv_cur[0], kv_cur[1], heads, sm_scale, False,
                          None, interpret,
                          extra_bias=_ring_hop_bias(j, i, causal))
        o_acc, lse_acc = _merge_packed(o_acc, lse_acc,
                                       o_j.astype(jnp.float32), lse_j,
                                       heads)
        return (kv_cur, o_acc, lse_acc), None

    kv = jnp.stack([k, v])
    if n > 1:
        # merge/rescale the running output in f32: each hop re-weights
        # the accumulator, and n-1 rounds of bf16 re-rounding would
        # compound (the in-kernel accumulation and the XLA ring
        # fallback both carry f32 accumulators already)
        (kv, out, lse), _ = jax.lax.scan(
            hop, (kv, out.astype(jnp.float32), lse), jnp.arange(1, n))
        out = out.astype(q.dtype)
    return out, lse


def _ring_flash_fwd_rule(q, k, v, heads, sm_scale, causal, axis_name,
                         interpret):
    from jax.ad_checkpoint import checkpoint_name

    out, lse = _ring_flash_fwd(q, k, v, heads, sm_scale, causal, axis_name,
                               interpret)
    out = checkpoint_name(out, "attn_out")
    lse = checkpoint_name(lse, "attn_lse")
    return out, (q, k, v, out, lse)


def _ring_flash_bwd_rule(heads, sm_scale, causal, axis_name, interpret,
                         res, g):
    """Second ring pass: each hop reuses the flash backward kernels with
    the GLOBAL lse — p = exp2(s - lse_global) restricted to the hop's
    key columns is exactly that slice of the global softmax, so dq sums
    locally while each block's (dk, dv) accumulator rides the ring and
    arrives home after n rotations."""
    q, k, v, out, lse = res
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    dq, dk, dv = _bwd(heads, sm_scale, causal, None, interpret,
                      (q, k, v, out, lse), g)

    def hop(carry, j):
        kv_cur, dkv, dq_acc = carry
        perm = [(p, (p + 1) % n) for p in range(n)]
        # K/V and their f32 grad accumulators ride the ring together
        kv_cur = jax.lax.ppermute(kv_cur, axis_name, perm)
        dkv = jax.lax.ppermute(dkv, axis_name, perm)
        dq_j, dk_j, dv_j = _bwd(
            heads, sm_scale, False, None, interpret,
            (q, kv_cur[0], kv_cur[1], out, lse), g,
            extra_bias=_ring_hop_bias(j, i, causal))
        dkv = dkv.at[0].add(dk_j.astype(jnp.float32))
        dkv = dkv.at[1].add(dv_j.astype(jnp.float32))
        return (kv_cur, dkv, dq_acc + dq_j.astype(jnp.float32)), None

    kv = jnp.stack([k, v])
    dkv = jnp.stack([dk, dv]).astype(jnp.float32)
    dq = dq.astype(jnp.float32)
    if n > 1:
        (kv, dkv, dq), _ = jax.lax.scan(hop, (kv, dkv, dq),
                                        jnp.arange(1, n))
        # accumulators now sit one device behind home; final rotation
        perm = [(p, (p + 1) % n) for p in range(n)]
        dkv = jax.lax.ppermute(dkv, axis_name, perm)
    return (dq.astype(q.dtype), dkv[0].astype(k.dtype),
            dkv[1].astype(v.dtype))


_ring_flash.defvjp(_ring_flash_fwd_rule, _ring_flash_bwd_rule)


def ring_flash_attention_packed(
    q: jax.Array,  # packed [B, S_local, H*D]
    k: jax.Array,
    v: jax.Array,
    heads: int,
    *,
    axis_name: str,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Ring attention running the Pallas flash kernel inside each
    sequence shard (use within shard_map; packed layout end to end)."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1] // heads)
    return _ring_flash(q, k, v, heads, sm_scale, causal, axis_name,
                       interpret)


# ---------------------------------------------------------------------------
# shard_map convenience wrapper
# ---------------------------------------------------------------------------


def sequence_parallel_attention(q, k, v, mesh=None, axis_name: str = "sp",
                                sm_scale=None, batch_axes=None,
                                causal: bool = False,
                                impl: Optional[str] = None,
                                block_k: int = 1024,
                                interpret: bool = False):
    """Convenience wrapper: shard_map over the token dim of BSHD inputs.

    ``mesh=None`` uses the ambient mesh (``jax.set_mesh`` context, the
    way the train steps run); ``batch_axes`` shards the batch dim (the
    model's data axes) so the ring runs inside an ordinary dp/fsdp
    step.  ``impl``: "flash" (Pallas kernel per shard; TPU default) or
    "xla" (blockwise fallback; default elsewhere)."""
    from jax.sharding import PartitionSpec as P

    if impl is None:
        from avion_tpu.ops.attention import _on_tpu

        impl = "flash" if _on_tpu() else "xla"
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

    if impl == "flash":
        b, s, h, d = q.shape

        def local(q_, k_, v_):
            pack = lambda t: t.reshape(t.shape[0], t.shape[1], h * d)
            o = ring_flash_attention_packed(
                pack(q_), pack(k_), pack(v_), h, axis_name=axis_name,
                causal=causal, sm_scale=sm_scale, interpret=interpret)
            return o.reshape(o.shape[0], o.shape[1], h, d)

    else:
        def local(q_, k_, v_):
            return ring_attention(q_, k_, v_, axis_name=axis_name,
                                  causal=causal, sm_scale=sm_scale,
                                  block_k=block_k)

    fn = jax.shard_map(local, in_specs=(spec, spec, spec), out_specs=spec,
                       check_vma=False, **kw)
    return fn(q, k, v)
