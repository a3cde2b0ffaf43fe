"""Pallas TPU flash attention (forward + backward), packed layout.

TPU-native replacement for the reference's CUDA flash-attn dependency
(FlashMHA consumed at ``avion/models/transformer.py:116-120`` and
``avion/models/model_videomae.py:116``).  Design notes:

- Never materializes the S x S attention matrix in HBM.  Each grid
  program holds the full K/V for one (batch, head-group) in VMEM — ViT
  video sequences are ~800 tokens and text is 77, so K/V (S x 128,
  bf16) is a few hundred KB, far under the ~16MB VMEM budget; scores
  live only as a [block_q, S] f32 VMEM tile per head.  This "one-pass
  row-block" shape beats a literal FlashAttention tiling translation on
  TPU: one big MXU matmul per q-block instead of a scalar-carried
  online-softmax loop.
- PACKED layout end to end: the kernels read 128-lane head-group
  stripes straight out of [B, S, H*D] arrays (index-mapped blocks), so
  there are NO [B,S,H,D]->[B*H,S,D] fold transposes and no 2x HBM
  waste from 64-lane minor dims.  With head_dim 64 each program covers
  two heads.
- Softmax runs in the log2 domain: sm_scale * log2(e) is folded into
  the small q tile before the score matmul and probabilities use the
  VPU-native exp2 (exp lowers to mul+exp2).  Gradient formulas are
  unchanged: with p = exp2(s2 - lse2), ds2 = p*(dp-delta)*ln2 and
  dq = ds2 @ k * (sm_scale*log2e) = p*(dp-delta) @ k * sm_scale.
  lse is stored in log2 units (internal to these kernels only).
- lse residuals are [B, H, S_pad] f32 (a few MB); inside the forward
  kernel the per-row logsumexp column is transposed to row layout so
  no lane-padded [.., 128] broadcast ever reaches HBM.
- The fwd rule tags its out/lse with ``checkpoint_name`` so the remat
  policy save_only_these_names("attn_out", "attn_lse") keeps them: the
  rematerialized backward recomputes q/k/v via the (MXU-cheap) qkv
  projection but never re-runs the forward kernel.
- Backward recomputes probabilities from the saved logsumexp, with
  separate dq and dkv kernels so each output has a single writer (no
  cross-program accumulation).  delta (= sum(do*out)) is computed
  in-kernel for dq and once in XLA (row layout) for dkv.
- Sequence lengths are padded to the q/k block multiple; padded key
  columns are masked to -inf via a precomputed bias row (one VPU add —
  cheaper than iota+compare+select in a kernel this VPU-bound), padded
  query rows are sliced off.

Supports the two patterns the models need: bidirectional (ViT) and
causal (text transformer, ``avion/models/transformer.py:447-453``).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_MASK_VALUE = -1e30
LOG2E = 1.4426950408889634


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# VMEM budget for the [block_q, S_pad] f32 score tiles; the rest of the
# ~16MB VMEM holds q/k/v blocks and pipeline double-buffers.
_SCORE_TILE_BYTES = 8 * 1024 * 1024


def _auto_block_q(s_pad: int, hpp: int) -> int:
    """Largest q block (multiple of 128, capped at the full padded
    sequence) whose hpp score tiles fit the VMEM budget.  ViT-scale
    sequences (~800) fit whole — one program per (batch, head-group),
    which amortizes program-launch overhead."""
    cap = max(128, (_SCORE_TILE_BYTES // (4 * s_pad * hpp)) // 128 * 128)
    return min(_ceil_to(s_pad, 128), cap)


def _heads_per_program(heads: int, d: int) -> int:
    """Pack heads into 128-lane stripes: hpp*d == 128 when possible."""
    hpp = max(1, 128 // d)
    while heads % hpp:
        hpp -= 1
    return hpp


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, sm_scale,
                causal, block_q, d, hpp):
    # q_ref: [block_q, hpp*d]; k_ref/v_ref: [S_pad, hpp*d];
    # bias_ref: [8, S_pad] (row 0 = 0/-inf key-padding bias);
    # o_ref: [block_q, hpp*d]; lse_ref: [hpp, block_q] (row layout).
    # Matmul inputs stay in their (bf16) storage dtype with f32
    # accumulation — casting to f32 *before* the dot runs the MXU at a
    # fraction of peak.
    qi = pl.program_id(2)
    s_pad = k_ref.shape[0]
    if causal:
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, s_pad), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, s_pad), 0)
        cmask = col <= row + qi * block_q
    outs = []
    for e in range(hpp):
        sl = slice(e * d, (e + 1) * d)
        qe = (q_ref[:, sl].astype(jnp.float32) * (sm_scale * LOG2E)).astype(
            q_ref.dtype)
        s = jax.lax.dot_general(
            qe, k_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, S_pad] f32, log2-domain scores
        s = s + bias_ref[0:1, :]
        if causal:
            s = jnp.where(cmask, s, DEFAULT_MASK_VALUE)
        m = jnp.max(s, axis=-1, keepdims=True)
        p32 = jnp.exp2(s - m)
        l = jnp.sum(p32, axis=-1, keepdims=True)
        p = p32.astype(v_ref.dtype)
        if lse_ref is not None:
            lse = m + jnp.log2(l)  # [block_q, 1], log2 domain
            lse_ref[e : e + 1, :] = jnp.transpose(lse, (1, 0))
        o = jax.lax.dot_general(
            p, v_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # normalize on the [block_q, D] output instead of the
        # [block_q, S] score tile — one cheap pass
        outs.append((o / l).astype(o_ref.dtype))
    o_ref[:] = outs[0] if hpp == 1 else jnp.concatenate(outs, axis=-1)


def _fwd_infer_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, **kw):
    _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, None, **kw)


def _key_bias(s: int, s_pad: int):
    return jnp.broadcast_to(
        jnp.where(jnp.arange(s_pad) < s, 0.0, DEFAULT_MASK_VALUE
                  ).astype(jnp.float32)[None, :],
        (8, s_pad),
    )


def _fwd(q, k, v, heads, sm_scale, causal, block_q, interpret,
         need_lse=True, extra_bias=None):
    """q/k/v: packed [B, S, W].  Returns (out [B, S, W],
    lse [B, H//hpp, hpp, S_pad_q] | None).  ``extra_bias`` (traced
    scalar) is added to every score — the ring-attention hops use it to
    void entire key blocks (causal skip) without a recompile."""
    b, s, w = q.shape
    d = w // heads
    hpp = _heads_per_program(heads, d)
    stripe = hpp * d
    if block_q is None:
        block_q = _auto_block_q(_ceil_to(s, 128), hpp)
    s_pad_q = _ceil_to(s, block_q)
    s_pad_k = _ceil_to(s, 128)
    # Inference path: q is NOT padded — an out-of-bounds q row reads
    # undefined values but stays in its own softmax row, and the masked
    # final-block output write discards it.  The training path pads q so
    # the saved lse rows stay well-defined for the backward kernels.
    # k/v MUST be zero-padded either way (a garbage key/value poisons
    # every query row via max/sum/PV).
    kp = jnp.pad(k, ((0, 0), (0, s_pad_k - s), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, s_pad_k - s), (0, 0)))
    bias = _key_bias(s, s_pad_k)
    if extra_bias is not None:
        bias = bias + extra_bias
    grid = (b, heads // hpp, s_pad_q // block_q)

    kw = dict(sm_scale=sm_scale, causal=causal, block_q=block_q, d=d,
              hpp=hpp)
    in_specs = [
        pl.BlockSpec((None, block_q, stripe), lambda b, h, i: (b, i, h)),
        pl.BlockSpec((None, s_pad_k, stripe), lambda b, h, i: (b, 0, h)),
        pl.BlockSpec((None, s_pad_k, stripe), lambda b, h, i: (b, 0, h)),
        pl.BlockSpec((8, s_pad_k), lambda b, h, i: (0, 0)),
    ]
    o_spec = pl.BlockSpec((None, block_q, stripe), lambda b, h, i: (b, i, h))

    if not need_lse:
        out = pl.pallas_call(
            functools.partial(_fwd_infer_kernel, **kw),
            grid=grid,
            in_specs=in_specs,
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((b, s, w), q.dtype),
            interpret=interpret,
        )(q, kp, vp, bias)
        return out, None

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, **kw),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            o_spec,
            pl.BlockSpec((None, None, hpp, block_q),
                         lambda b, h, i: (b, h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s_pad_q, w), q.dtype),
            # 4D so the head-group dim can be a full (non-8-divisible)
            # block; [B, H, S] would need an 8-sublane block
            jax.ShapeDtypeStruct((b, heads // hpp, hpp, s_pad_q),
                                 jnp.float32),
        ],
        interpret=interpret,
    )(jnp.pad(q, ((0, 0), (0, s_pad_q - s), (0, 0))), kp, vp, bias)
    return out[:, :s], lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, out_ref, lse_ref, bias_ref,
                   dq_ref, *, sm_scale, causal, block_q, d, hpp,
                   valid=None):
    # valid: real q-row count — rows beyond it are zeroed on write (the
    # fused-qkv path feeds padded-but-garbage q rows whose score tiles
    # can overflow exp2; their grads must be exactly 0, not inf*0)
    qi = pl.program_id(2)
    s_pad = k_ref.shape[0]
    if causal:
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, s_pad), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, s_pad), 0)
        cmask = col <= row + qi * block_q
    # lse arrives as rows [hpp, block_q]; one small transpose yields the
    # per-head columns (no lane-padded HBM broadcast needed)
    lse_cols = jnp.transpose(lse_ref[:], (1, 0))  # [block_q, hpp]
    dqs = []
    for e in range(hpp):
        sl = slice(e * d, (e + 1) * d)
        qe = (q_ref[:, sl].astype(jnp.float32) * (sm_scale * LOG2E)).astype(
            q_ref.dtype)
        s = jax.lax.dot_general(
            qe, k_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + bias_ref[0:1, :]  # -inf on padded key columns
        if causal:
            s = jnp.where(cmask, s, DEFAULT_MASK_VALUE)
        p = jnp.exp2(s - lse_cols[:, e : e + 1])  # [block_q, S_pad]
        dp = jax.lax.dot_general(
            do_ref[:, sl], v_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, S_pad]
        # delta computed in-kernel on the tiny [block_q, D] tiles
        delta = jnp.sum(
            do_ref[:, sl].astype(jnp.float32)
            * out_ref[:, sl].astype(jnp.float32),
            axis=-1, keepdims=True)
        ds = (p * (dp - delta)).astype(k_ref.dtype)
        dq = jax.lax.dot_general(
            ds, k_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        dqs.append(dq.astype(dq_ref.dtype))
    dq = dqs[0] if hpp == 1 else jnp.concatenate(dqs, axis=-1)
    if valid is not None:
        rows = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0)
        dq = jnp.where(rows < valid, dq, 0)
    dq_ref[:] = dq


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    bias_ref, dk_ref, dv_ref, *, sm_scale, causal, block_k,
                    d, hpp, valid=None):
    # valid: real k-row count; see _bwd_dq_kernel.  With valid set, the
    # caller passes do UNPADDED (OOB rows read undefined values): the
    # padded-q columns of pt are exp2(-inf)=0, but 0*NaN would still
    # poison dv/dk sums, so zero the garbage do rows explicitly (one
    # VMEM-resident VPU pass).
    ki = pl.program_id(2)
    s_pad_q = q_ref.shape[0]
    if valid is not None:
        qrow = jax.lax.broadcasted_iota(jnp.int32, (s_pad_q, 1), 0)
        do_all = jnp.where(qrow < valid, do_ref[:], 0)
    else:
        do_all = do_ref[:]
    if causal:
        qcol = jax.lax.broadcasted_iota(jnp.int32, (block_k, s_pad_q), 1)
        krow = jax.lax.broadcasted_iota(jnp.int32, (block_k, s_pad_q), 0)
        cmask = krow + ki * block_k <= qcol
    dks, dvs = [], []
    for e in range(hpp):
        sl = slice(e * d, (e + 1) * d)
        # scores^T : [block_k, S_pad_q]; scale the small k tile
        ke = (k_ref[:, sl].astype(jnp.float32) * (sm_scale * LOG2E)).astype(
            k_ref.dtype)
        st = jax.lax.dot_general(
            ke, q_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # padded q columns: -inf bias -> exp2 0; padded k rows need no
        # mask because their dk/dv rows are sliced off by the caller
        st = st + bias_ref[0:1, :]
        if causal:
            st = jnp.where(cmask, st, DEFAULT_MASK_VALUE)
        lse = lse_ref[e : e + 1, :]  # [1, S_pad_q] row layout
        pt = jnp.exp2(st - lse)
        dv = jax.lax.dot_general(
            pt.astype(do_ref.dtype), do_all[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dvs.append(dv.astype(dv_ref.dtype))
        dpt = jax.lax.dot_general(
            v_ref[:, sl], do_all[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_k, S_pad_q]
        delta = delta_ref[e : e + 1, :]
        dst = (pt * (dpt - delta)).astype(q_ref.dtype)
        dk = jax.lax.dot_general(
            dst, q_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        dks.append(dk.astype(dk_ref.dtype))
    dk = dks[0] if hpp == 1 else jnp.concatenate(dks, axis=-1)
    dv = dvs[0] if hpp == 1 else jnp.concatenate(dvs, axis=-1)
    if valid is not None:
        rows = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, 1), 0)
        dk = jnp.where(rows < valid, dk, 0)
        dv = jnp.where(rows < valid, dv, 0)
    dk_ref[:] = dk
    dv_ref[:] = dv


def _bwd(heads, sm_scale, causal, block_q, interpret, res, g,
         extra_bias=None):
    q, k, v, out, lse = res  # packed [B,S,W]; lse [B,H//hpp,hpp,S_pad_q]
    do = g
    b, s, w = q.shape
    d = w // heads
    hpp = _heads_per_program(heads, d)
    stripe = hpp * d
    if block_q is None:
        block_q = _auto_block_q(_ceil_to(s, 128), hpp)
    block_k = block_q
    s_pad_q = _ceil_to(s, block_q)
    s_pad_k = _ceil_to(s, block_k)
    assert lse.shape == (b, heads // hpp, hpp, s_pad_q), lse.shape

    qp = jnp.pad(q, ((0, 0), (0, s_pad_q - s), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, s_pad_k - s), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, s_pad_k - s), (0, 0)))
    dop = jnp.pad(do, ((0, 0), (0, s_pad_q - s), (0, 0)))
    outp = jnp.pad(out, ((0, 0), (0, s_pad_q - s), (0, 0)))
    # delta rows for the dkv kernel: [B, H//hpp, hpp, S_pad_q] f32
    delta = (do.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
        b, s, heads, d).sum(axis=-1).transpose(0, 2, 1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, s_pad_q - s))).reshape(
        b, heads // hpp, hpp, s_pad_q)

    bias_k = _key_bias(s, s_pad_k)  # over key columns (dq kernel)
    bias_q = _key_bias(s, s_pad_q)  # over query columns (dkv kernel)
    if extra_bias is not None:
        # ring-hop skip: voiding all keys (dq) / all queries (dkv)
        # zeroes this hop's gradient contributions
        bias_k = bias_k + extra_bias
        bias_q = bias_q + extra_bias

    kw = dict(sm_scale=sm_scale, causal=causal, d=d, hpp=hpp)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_q=block_q, **kw),
        grid=(b, heads // hpp, s_pad_q // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, stripe), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((None, s_pad_k, stripe), lambda b, h, i: (b, 0, h)),
            pl.BlockSpec((None, s_pad_k, stripe), lambda b, h, i: (b, 0, h)),
            pl.BlockSpec((None, block_q, stripe), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((None, block_q, stripe), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((None, None, hpp, block_q),
                         lambda b, h, i: (b, h, 0, i)),
            pl.BlockSpec((8, s_pad_k), lambda b, h, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, stripe),
                               lambda b, h, i: (b, i, h)),
        out_shape=jax.ShapeDtypeStruct((b, s_pad_q, w), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, dop, outp, lse, bias_k)[:, :s]

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_k=block_k, **kw),
        grid=(b, heads // hpp, s_pad_k // block_k),
        in_specs=[
            pl.BlockSpec((None, s_pad_q, stripe), lambda b, h, i: (b, 0, h)),
            pl.BlockSpec((None, block_k, stripe), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((None, block_k, stripe), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((None, s_pad_q, stripe), lambda b, h, i: (b, 0, h)),
            pl.BlockSpec((None, None, hpp, s_pad_q),
                         lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((None, None, hpp, s_pad_q),
                         lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((8, s_pad_q), lambda b, h, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_k, stripe), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((None, block_k, stripe), lambda b, h, i: (b, i, h)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s_pad_k, w), k.dtype),
            jax.ShapeDtypeStruct((b, s_pad_k, w), v.dtype),
        ],
        interpret=interpret,
    )(qp, kp, vp, dop, lse, delta, bias_q)
    return dq, dk[:, :s], dv[:, :s]


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_packed(q, k, v, heads, sm_scale, causal, block_q, interpret):
    # primal-only (inference) path: no lse output/write
    out, _ = _fwd(q, k, v, heads, sm_scale, causal, block_q, interpret,
                  need_lse=False)
    return out


def _flash_fwd_rule(q, k, v, heads, sm_scale, causal, block_q, interpret):
    from jax.ad_checkpoint import checkpoint_name

    out, lse = _fwd(q, k, v, heads, sm_scale, causal, block_q, interpret)
    # Name the kernel outputs so a remat policy can SAVE them: with
    # save_only_these_names("attn_out", "attn_lse") the rematerialized
    # backward recomputes q/k/v via the (MXU-cheap) qkv projection but
    # never re-runs this forward kernel — the policy cuts the recompute
    # graph at these values.  Both are compact: out is the packed
    # [B, S, W] activation, lse is [B, H, S_pad] f32.
    out = checkpoint_name(out, "attn_out")
    lse = checkpoint_name(lse, "attn_lse")
    return out, (q, k, v, out, lse)


def _flash_bwd_rule(heads, sm_scale, causal, block_q, interpret, res, g):
    return _bwd(heads, sm_scale, causal, block_q, interpret, res, g)


_flash_packed.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention over [B, S, H, D] tensors (BSHD layout).

    Returns [B, S, H, D] in the dtype of ``q``.
    """
    b, s, h, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    pack = lambda x: x.reshape(b, s, h * d)  # bitcast, no data movement
    out = _flash_packed(pack(q), pack(k), pack(v), h, sm_scale, causal,
                        block_q, interpret)
    return out.reshape(b, s, h, d)


def flash_attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention over packed [B, S, H*D] tensors — the layout the
    fused qkv projection produces (q/k/v are contiguous lane slices of
    its [B, S, 3*H*D] output), so no reshape/transpose ever touches the
    data.  Returns [B, S, H*D]."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1] // heads)
    return _flash_packed(q, k, v, heads, sm_scale, causal, block_q,
                         interpret)


def _bwd_combined_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         bias_ref, dq_ref, dk_ref, dv_ref, *, sm_scale,
                         causal, d, hpp, valid=None):
    """Single-program backward: one (batch, head-group) program holds
    the full padded sequence and computes dq, dk AND dv — the score
    recompute (the expensive [S, S] matmul) is shared between them, so
    the backward runs 5 big matmuls per head instead of the split
    kernels' 7 (s, dp, dq | s^T, dp^T, dv, dk).  VMEM holds ~3 [S, S]
    f32 tiles live, which fits ViT-scale sequences (S_pad <= ~1024)."""
    s_pad = q_ref.shape[0]
    if valid is not None:
        row = jax.lax.broadcasted_iota(jnp.int32, (s_pad, 1), 0)
        do_all = jnp.where(row < valid, do_ref[:], 0)
    else:
        do_all = do_ref[:]
    if causal:
        col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
        rowm = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 0)
        cmask = col <= rowm
    lse_cols = jnp.transpose(lse_ref[:], (1, 0))  # [S_pad, hpp]
    dqs, dks, dvs = [], [], []
    for e in range(hpp):
        sl = slice(e * d, (e + 1) * d)
        qe = (q_ref[:, sl].astype(jnp.float32) * (sm_scale * LOG2E)).astype(
            q_ref.dtype)
        s2 = jax.lax.dot_general(
            qe, k_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S_pad_q, S_pad_k] log2-domain scores — computed ONCE
        s2 = s2 + bias_ref[0:1, :]  # -inf on padded key columns
        if causal:
            s2 = jnp.where(cmask, s2, DEFAULT_MASK_VALUE)
        p = jnp.exp2(s2 - lse_cols[:, e : e + 1])
        dp = jax.lax.dot_general(
            do_all[:, sl], v_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta_col = jnp.transpose(delta_ref[e : e + 1, :], (1, 0))
        ds = (p * (dp - delta_col)).astype(k_ref.dtype)
        dq = jax.lax.dot_general(
            ds, k_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        dqs.append(dq.astype(dq_ref.dtype))
        # dk = ds^T @ q, dv = p^T @ do — contract over the q rows;
        # padded q rows self-cancel (do zeroed -> dp row 0, delta 0)
        dk = jax.lax.dot_general(
            ds, q_ref[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        dks.append(dk.astype(dk_ref.dtype))
        dv = jax.lax.dot_general(
            p.astype(do_ref.dtype), do_all[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dvs.append(dv.astype(dv_ref.dtype))
    dq = dqs[0] if hpp == 1 else jnp.concatenate(dqs, axis=-1)
    dk = dks[0] if hpp == 1 else jnp.concatenate(dks, axis=-1)
    dv = dvs[0] if hpp == 1 else jnp.concatenate(dvs, axis=-1)
    if valid is not None:
        rows = jax.lax.broadcasted_iota(jnp.int32, (s_pad, 1), 0)
        dq = jnp.where(rows < valid, dq, 0)
        dk = jnp.where(rows < valid, dk, 0)
        dv = jnp.where(rows < valid, dv, 0)
    dq_ref[:] = dq
    dk_ref[:] = dk
    dv_ref[:] = dv


# ---------------------------------------------------------------------------
# zero-copy fused-qkv entry: the kernels read q/k/v as three
# index-mapped VIEWS of one [B, S_pad, 3W] array
# ---------------------------------------------------------------------------


def _fused_block_q(s_pad: int, hpp: int) -> int:
    """Largest 128-multiple block that DIVIDES s_pad (the fused path
    never over-pads the q dim, so blocks must tile it exactly) and fits
    the VMEM score-tile budget."""
    cap = _auto_block_q(s_pad, hpp)
    if s_pad <= cap:
        return s_pad
    for m in range(cap // 128, 0, -1):
        if s_pad % (m * 128) == 0:
            return m * 128
    return 128


def _fused_specs(s_pad: int, block_q: int, stripe: int, nhb: int):
    """BlockSpecs that read the q/k/v lane sections of a single fused
    [B, S_pad, 3*W] array (lane-block offsets 0 / nhb / 2*nhb, where
    nhb = heads//hpp is the per-section block count)."""
    return [
        pl.BlockSpec((None, block_q, stripe), lambda b, h, i: (b, i, h)),
        pl.BlockSpec((None, s_pad, stripe),
                     lambda b, h, i: (b, 0, h + nhb)),
        pl.BlockSpec((None, s_pad, stripe),
                     lambda b, h, i: (b, 0, h + 2 * nhb)),
        pl.BlockSpec((8, s_pad), lambda b, h, i: (0, 0)),
    ]


def _fwd_fused(qkv, heads, s, sm_scale, causal, block_q, interpret,
               need_lse=True):
    """qkv: [B, S_pad, 3W] fused projection output, S-padded to a
    128-multiple with FINITE rows (zeros or bias values — padded key
    columns are masked via the score bias, padded value rows see zero
    attention weight, so pad contents never reach the output).
    Returns (out [B, s, W], lse | None)."""
    b, s_pad, w3 = qkv.shape
    w = w3 // 3
    d = w // heads
    hpp = _heads_per_program(heads, d)
    stripe = hpp * d
    nhb = heads // hpp
    if block_q is None:
        block_q = _fused_block_q(s_pad, hpp)
    assert s_pad % 128 == 0 and s_pad % block_q == 0, (s_pad, block_q)
    bias = _key_bias(s, s_pad)
    grid = (b, nhb, s_pad // block_q)
    kw = dict(sm_scale=sm_scale, causal=causal, block_q=block_q, d=d,
              hpp=hpp)
    in_specs = _fused_specs(s_pad, block_q, stripe, nhb)
    o_spec = pl.BlockSpec((None, block_q, stripe), lambda b, h, i: (b, i, h))

    # out_shape uses the REAL s: the final q block's out-of-range rows
    # are a masked write (same mechanism as the unpadded inference q
    # path of _fwd), so no slice op ever materializes
    if not need_lse:
        out = pl.pallas_call(
            functools.partial(_fwd_infer_kernel, **kw),
            grid=grid, in_specs=in_specs, out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((b, s, w), qkv.dtype),
            interpret=interpret,
        )(qkv, qkv, qkv, bias)
        return out, None
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, **kw),
        grid=grid, in_specs=in_specs,
        out_specs=[
            o_spec,
            pl.BlockSpec((None, None, hpp, block_q),
                         lambda b, h, i: (b, h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, w), qkv.dtype),
            jax.ShapeDtypeStruct((b, nhb, hpp, s_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qkv, qkv, qkv, bias)
    return out, lse


def _bwd_fused_views(heads, s, sm_scale, causal, block_q, interpret, res,
                     g):
    """Backward over the fused layout: one dqkv [B, S_pad, 3W] gradient
    (pad rows are zero for the dq section and harmless garbage for
    dk/dv — they meet the zero pad rows of the projection input in the
    dense VJP, so nothing leaks)."""
    qkv, out, lse = res
    b, s_pad, w3 = qkv.shape
    w = w3 // 3
    d = w // heads
    hpp = _heads_per_program(heads, d)
    stripe = hpp * d
    nhb = heads // hpp
    if block_q is None:
        block_q = _fused_block_q(s_pad, hpp)
    block_k = block_q
    # do/out stay UNPADDED: the dq kernel's delta/dp are row-local (a
    # garbage OOB row only corrupts its own dq row, which the valid
    # mask zeroes) and the dkv kernel masks do rows in-kernel — no
    # [B, S_pad, W] pad materializations in the backward at all
    dop, outp = g, out
    delta = (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
        b, s, heads, d).sum(axis=-1).transpose(0, 2, 1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, s_pad - s))).reshape(
        b, nhb, hpp, s_pad)
    bias = _key_bias(s, s_pad)

    kw = dict(sm_scale=sm_scale, causal=causal, d=d, hpp=hpp)
    qv, kv_, vv, _ = _fused_specs(s_pad, block_q, stripe, nhb)
    full_q = pl.BlockSpec((None, s_pad, stripe),
                          lambda b, h, i: (b, 0, h))
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_q=block_q, valid=s, **kw),
        grid=(b, nhb, s_pad // block_q),
        in_specs=[
            qv, kv_, vv,
            pl.BlockSpec((None, block_q, stripe), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((None, block_q, stripe), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((None, None, hpp, block_q),
                         lambda b, h, i: (b, h, 0, i)),
            pl.BlockSpec((8, s_pad), lambda b, h, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, stripe),
                               lambda b, h, i: (b, i, h)),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, w), qkv.dtype),
        interpret=interpret,
    )(qkv, qkv, qkv, dop, outp, lse, bias)

    kblk = pl.BlockSpec((None, block_k, stripe),
                        lambda b, h, i: (b, i, h + nhb))
    vblk = pl.BlockSpec((None, block_k, stripe),
                        lambda b, h, i: (b, i, h + 2 * nhb))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_k=block_k, valid=s, **kw),
        grid=(b, nhb, s_pad // block_k),
        in_specs=[
            full_q, kblk, vblk,
            pl.BlockSpec((None, s_pad, stripe), lambda b, h, i: (b, 0, h)),
            pl.BlockSpec((None, None, hpp, s_pad),
                         lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((None, None, hpp, s_pad),
                         lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((8, s_pad), lambda b, h, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_k, stripe), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((None, block_k, stripe), lambda b, h, i: (b, i, h)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s_pad, w), qkv.dtype),
            jax.ShapeDtypeStruct((b, s_pad, w), qkv.dtype),
        ],
        interpret=interpret,
    )(qkv, qkv, qkv, dop, lse, delta, bias)
    return (jnp.concatenate([dq, dk, dv], axis=-1),)


def _bwd_fused_combined(heads, s, sm_scale, causal, block_q, interpret,
                        res, g):
    """Backward over the fused layout via the single-program combined
    kernel (shared score recompute; see _bwd_combined_kernel)."""
    qkv, out, lse = res
    b, s_pad, w3 = qkv.shape
    w = w3 // 3
    d = w // heads
    hpp = _heads_per_program(heads, d)
    stripe = hpp * d
    nhb = heads // hpp
    delta = (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
        b, s, heads, d).sum(axis=-1).transpose(0, 2, 1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, s_pad - s))).reshape(
        b, nhb, hpp, s_pad)
    bias = _key_bias(s, s_pad)

    qv = pl.BlockSpec((None, s_pad, stripe), lambda b, h: (b, 0, h))
    kv_ = pl.BlockSpec((None, s_pad, stripe), lambda b, h: (b, 0, h + nhb))
    vv = pl.BlockSpec((None, s_pad, stripe),
                      lambda b, h: (b, 0, h + 2 * nhb))
    io = pl.BlockSpec((None, s_pad, stripe), lambda b, h: (b, 0, h))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_combined_kernel, sm_scale=sm_scale,
                          causal=causal, d=d, hpp=hpp, valid=s),
        grid=(b, nhb),
        in_specs=[
            qv, kv_, vv, io,
            pl.BlockSpec((None, None, hpp, s_pad), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((None, None, hpp, s_pad), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((8, s_pad), lambda b, h: (0, 0)),
        ],
        out_specs=[io, io, io],
        out_shape=[jax.ShapeDtypeStruct((b, s_pad, w), qkv.dtype)] * 3,
        interpret=interpret,
    )(qkv, qkv, qkv, g, lse, delta, bias)
    return (jnp.concatenate([dq, dk, dv], axis=-1),)


# Combined (single-program) backward for the fused path.  Measured
# (tools/bench_attention.py, v5e, ViT-B shapes b64): split 11.45 ms vs
# combined 9.69 ms fwd+bwd — 1.18x.  "auto" (default) uses it whenever
# the [S_pad, S_pad] f32 score tiles fit VMEM (~3 live tiles); larger
# sequences (ViT-L: S_pad 3200) keep the split kernels.
_COMBINED_BWD = None  # None -> read env once; bool overrides (tests)
_COMBINED_MAX_SPAD = 1024


def _use_combined_bwd(s_pad: int) -> bool:
    global _COMBINED_BWD
    if _COMBINED_BWD is None:
        import os

        _COMBINED_BWD = os.environ.get("AVION_FLASH_COMBINED_BWD", "auto")
    if _COMBINED_BWD == "auto":
        return s_pad <= _COMBINED_MAX_SPAD
    return _COMBINED_BWD in (True, "1")


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def _flash_fused(qkv, heads, s, sm_scale, causal, block_q, interpret,
                 save_residuals):
    out, _ = _fwd_fused(qkv, heads, s, sm_scale, causal, block_q,
                        interpret, need_lse=False)
    return out


def _flash_fused_fwd_rule(qkv, heads, s, sm_scale, causal, block_q,
                          interpret, save_residuals):
    from jax.ad_checkpoint import checkpoint_name

    out, lse = _fwd_fused(qkv, heads, s, sm_scale, causal, block_q,
                          interpret)
    # save_residuals=False names the residuals OUTSIDE the remat
    # policy's saved set, so this layer's backward re-runs the forward
    # kernel instead of holding out+lse in HBM (~26 MB/clip across 12
    # layers) — the per-layer knob behind remat_policy save_attn_kN
    out = checkpoint_name(out, "attn_out" if save_residuals
                          else "attn_out_r")
    lse = checkpoint_name(lse, "attn_lse" if save_residuals
                          else "attn_lse_r")
    return out, (qkv, out, lse)


def _bwd_fused_dispatch(heads, s, sm_scale, causal, block_q, interpret,
                        save_residuals, res, g):
    del save_residuals  # fwd-side naming only
    if _use_combined_bwd(res[0].shape[1]):
        return _bwd_fused_combined(heads, s, sm_scale, causal, block_q,
                                   interpret, res, g)
    return _bwd_fused_views(heads, s, sm_scale, causal, block_q, interpret,
                            res, g)


_flash_fused.defvjp(_flash_fused_fwd_rule, _bwd_fused_dispatch)


def flash_attention_fused_qkv(
    qkv: jax.Array,
    heads: int,
    s: int,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    interpret: bool = False,
    save_residuals: bool = True,
) -> jax.Array:
    """Flash attention straight off the fused qkv projection output.

    ``qkv``: [B, S_pad, 3*H*D] with S_pad a multiple of 128 and
    ``s <= S_pad`` real rows; the pad rows only need to be FINITE (the
    projection of a zero-padded input — i.e. bias rows — qualifies).
    The kernels read the three lane sections through index-mapped views
    of this one array, eliminating the per-call q/k/v slice + re-pad
    data movement of the packed entry (~10 ms/layer at ViT-B b224).
    Returns [B, s, H*D]."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt((qkv.shape[-1] // 3) // heads)
    return _flash_fused(qkv, heads, s, sm_scale, causal, block_q,
                        interpret, save_residuals)
