"""GPipe pipeline for gated cross-attention decoders (the narrator).

Extends ``parallel/pipeline.py``'s uniform stacked-Block pipeline to the
narrator's NON-uniform decoder (ROADMAP r3: "needs a stage abstraction
beyond the uniform stacked Block pipeline"): every ``cross_every``-th
block carries a gated cross-attention sub-block over the visual tokens
(the LaViLa/Flamingo construction —
``second_party/lavilla_narrator/lavila/models/gpt2_gated.py``), so the
layer stack is not a scan over one repeated structure.

TPU-native formulation: the stack *is* uniform at the **group** level —
``G = layers / cross_every`` groups of ``[cross-block, plain, ...,
plain]`` — so parameters stack group-major (self leaves
``[G, cross_every, ...]``, cross leaves ``[G, ...]``) and shard over the
``pp`` mesh axis at the group boundary.  Each pipeline stage scans its
``G/pp`` groups; microbatch activations rotate with ``lax.ppermute``
while every stage indexes the (batch-sharded, pp-replicated) visual
tokens of the microbatch it is currently processing.  Autodiff through
the permutation chain gives the backward pipeline for free.

Two decoder families share the engine via the same stacked leaf names:

- ``cross_position="mid"`` — the native ``VCLM`` narrator
  (``models/narrator.py``): self-attn, then gated cross, then MLP.
- ``cross_position="pre"`` — the LaViLa interop ``GatedGPT2LMHead``
  (``models/gpt2_gated.py``): gated cross BEFORE the GPT-2 block
  (squared-ReLU cross-MLP, gelu_new self-MLP).

Converters to/from the sequential ``block_{i}`` / ``h_{i}`` trees keep
checkpoint interop both ways (a sequentially-trained narrator runs
pipelined and vice versa); ``parallel/pipeline.adapt_stacked_layouts``
dispatches here for gated-decoder subtrees.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from avion_tpu.ops.attention import attention_packed, xla_attention
from avion_tpu.parallel.mesh import BATCH_AXES, PP_AXIS
from avion_tpu.parallel.pipeline import _layernorm

# ---------------------------------------------------------------------------
# Stacked leaf names (shared by both decoder families) -> sequential
# subtree paths.  Self leaves stack group-major [G, cross_every, ...];
# cross leaves stack [G, ...].
# ---------------------------------------------------------------------------

_SELF_PATHS: Dict[str, Dict[str, tuple]] = {
    # native VCLM (models/narrator.py GatedDecoderBlock)
    "vclm": {
        "ln1_scale": ("ln_1", "norm", "scale"),
        "ln1_bias": ("ln_1", "norm", "bias"),
        "qkv_kernel": ("attn", "qkv", "kernel"),
        "qkv_bias": ("attn", "qkv", "bias"),
        "out_kernel": ("attn", "out_proj", "kernel"),
        "out_bias": ("attn", "out_proj", "bias"),
        "ln2_scale": ("ln_2", "norm", "scale"),
        "ln2_bias": ("ln_2", "norm", "bias"),
        "fc1_kernel": ("mlp", "fc1", "kernel"),
        "fc1_bias": ("mlp", "fc1", "bias"),
        "fc2_kernel": ("mlp", "fc2", "kernel"),
        "fc2_bias": ("mlp", "fc2", "bias"),
    },
    # LaViLa GPT-2 interop (models/gpt2_gated.py GatedGPT2Block)
    "gpt2": {
        "ln1_scale": ("ln_1", "scale"),
        "ln1_bias": ("ln_1", "bias"),
        "qkv_kernel": ("attn", "c_attn", "kernel"),
        "qkv_bias": ("attn", "c_attn", "bias"),
        "out_kernel": ("attn", "c_proj", "kernel"),
        "out_bias": ("attn", "c_proj", "bias"),
        "ln2_scale": ("ln_2", "scale"),
        "ln2_bias": ("ln_2", "bias"),
        "fc1_kernel": ("mlp", "c_fc", "kernel"),
        "fc1_bias": ("mlp", "c_fc", "bias"),
        "fc2_kernel": ("mlp", "c_proj", "kernel"),
        "fc2_bias": ("mlp", "c_proj", "bias"),
    },
}

_CROSS_PATHS: Dict[str, Dict[str, tuple]] = {
    "vclm": {
        "gate_attn": ("attn_gate",),
        "lnx_scale": ("ln_x", "norm", "scale"),
        "lnx_bias": ("ln_x", "norm", "bias"),
        "xattn_q_kernel": ("xattn", "q", "kernel"),
        "xattn_q_bias": ("xattn", "q", "bias"),
        "xattn_kv_kernel": ("xattn", "kv", "kernel"),
        "xattn_kv_bias": ("xattn", "kv", "bias"),
        "xattn_out_kernel": ("xattn", "out_proj", "kernel"),
        "xattn_out_bias": ("xattn", "out_proj", "bias"),
        "gate_mlp": ("mlp_gate",),
        "lnxm_scale": ("ln_xm", "norm", "scale"),
        "lnxm_bias": ("ln_xm", "norm", "bias"),
        "xmlp_fc1_kernel": ("xmlp", "fc1", "kernel"),
        "xmlp_fc1_bias": ("xmlp", "fc1", "bias"),
        "xmlp_fc2_kernel": ("xmlp", "fc2", "kernel"),
        "xmlp_fc2_bias": ("xmlp", "fc2", "bias"),
    },
    "gpt2": {
        "gate_attn": ("alpha_cattn",),
        "lnx_scale": ("ln_cross_attn", "scale"),
        "lnx_bias": ("ln_cross_attn", "bias"),
        "xattn_q_kernel": ("crossattention", "q_attn", "kernel"),
        "xattn_q_bias": ("crossattention", "q_attn", "bias"),
        "xattn_kv_kernel": ("crossattention", "c_attn", "kernel"),
        "xattn_kv_bias": ("crossattention", "c_attn", "bias"),
        "xattn_out_kernel": ("crossattention", "c_proj", "kernel"),
        "xattn_out_bias": ("crossattention", "c_proj", "bias"),
        "gate_mlp": ("alpha_dense",),
        "lnxm_scale": ("ln_2_crossattention", "scale"),
        "lnxm_bias": ("ln_2_crossattention", "bias"),
        "xmlp_fc1_kernel": ("mlp_crossattention", "c_fc", "kernel"),
        "xmlp_fc1_bias": ("mlp_crossattention", "c_fc", "bias"),
        "xmlp_fc2_kernel": ("mlp_crossattention", "c_proj", "kernel"),
        "xmlp_fc2_bias": ("mlp_crossattention", "c_proj", "bias"),
    },
}

_CROSS_NAMES = frozenset(_CROSS_PATHS["vclm"])


# ---------------------------------------------------------------------------
# Pure-function block math (numerically identical to the flax modules)
# ---------------------------------------------------------------------------


def _dense(x, p, name, dtype):
    return x @ p[f"{name}_kernel"].astype(dtype) + p[f"{name}_bias"].astype(dtype)


def _self_attn(p, x, *, heads, dtype, use_flash):
    """Causal self-attention sub-block (ln_1 -> fused qkv -> out)."""
    w = x.shape[-1]
    y = _layernorm(x, p["ln1_scale"], p["ln1_bias"]).astype(dtype)
    qkv = _dense(y, p, "qkv", dtype)
    o = attention_packed(qkv[..., :w], qkv[..., w:2 * w], qkv[..., 2 * w:],
                         heads, causal=True, use_flash=use_flash)
    return x + _dense(o, p, "out", dtype)


def _mlp(p, x, *, dtype, act):
    y = _layernorm(x, p["ln2_scale"], p["ln2_bias"]).astype(dtype)
    return x + _dense(act(_dense(y, p, "fc1", dtype)), p, "fc2", dtype)


def _gated_cross_vclm(p, x, enc, *, heads, dtype, act):
    """VCLM gated cross sub-block (``narrator.GatedDecoderBlock._cross``
    + ``CrossAttention``): k/v at compute dtype, xla attention."""
    w = x.shape[-1]
    d = w // heads
    b, s, _ = x.shape
    m = enc.shape[1]
    y = _layernorm(x, p["lnx_scale"], p["lnx_bias"]).astype(dtype)
    q = _dense(y, p, "xattn_q", dtype)
    kv = _dense(enc.astype(dtype), p, "xattn_kv", dtype)
    o = xla_attention(q.reshape(b, s, heads, d),
                      kv[..., :w].reshape(b, m, heads, d),
                      kv[..., w:].reshape(b, m, heads, d))
    y = _dense(o.reshape(b, s, w), p, "xattn_out", dtype)
    x = x + jnp.tanh(p["gate_attn"]).astype(x.dtype) * y
    y = _layernorm(x, p["lnxm_scale"], p["lnxm_bias"]).astype(dtype)
    y = _dense(act(_dense(y, p, "xmlp_fc1", dtype)), p, "xmlp_fc2", dtype)
    return x + jnp.tanh(p["gate_mlp"]).astype(x.dtype) * y


def _gated_cross_gpt2(p, x, enc, *, heads, dtype, act):
    """GPT-2 gated cross sub-block (``gpt2_gated.GPT2CrossAttention``):
    k/v heads materialized in f32 ([B, H, M, D] layout), f32 softmax."""
    import math

    w = x.shape[-1]
    d = w // heads
    b, s, _ = x.shape
    m = enc.shape[1]
    y = _layernorm(x, p["lnx_scale"], p["lnx_bias"]).astype(dtype)
    q = _dense(y, p, "xattn_q", dtype)
    kv = _dense(enc.astype(dtype), p, "xattn_kv", dtype)
    k = kv[..., :w].reshape(b, m, heads, d).transpose(0, 2, 1, 3)
    v = kv[..., w:].reshape(b, m, heads, d).transpose(0, 2, 1, 3)
    q = q.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / math.sqrt(d)
    prob = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", prob, v.astype(jnp.float32))
    o = o.transpose(0, 2, 1, 3).reshape(b, s, w).astype(dtype)
    y = _dense(o, p, "xattn_out", dtype)
    x = x + jnp.tanh(p["gate_attn"]).astype(x.dtype) * y
    y = _layernorm(x, p["lnxm_scale"], p["lnxm_bias"]).astype(dtype)
    y = _dense(act(_dense(y, p, "xmlp_fc1", dtype)), p, "xmlp_fc2", dtype)
    return x + jnp.tanh(p["gate_mlp"]).astype(x.dtype) * y


def make_group_forward(*, heads: int, cross_position: str = "mid",
                       dtype: Any = jnp.bfloat16, use_flash: bool = True,
                       act: Callable = nn.gelu,
                       cross_act: Callable = nn.gelu) -> Callable:
    """Build ``group_forward(group_params, h, enc) -> h`` applying one
    ``[cross-block, plain x (cross_every-1)]`` group.

    ``cross_position="mid"``: attn -> cross -> mlp (VCLM);
    ``"pre"``: cross -> attn -> mlp (GatedGPT2Block)."""
    assert cross_position in ("mid", "pre"), cross_position
    cross_fn = (_gated_cross_vclm if cross_position == "mid"
                else _gated_cross_gpt2)

    def plain_block(p, h):
        h = _self_attn(p, h, heads=heads, dtype=dtype, use_flash=use_flash)
        return _mlp(p, h, dtype=dtype, act=act)

    def group_forward(gp, h, enc):
        p_cross = {k: v for k, v in gp.items() if k in _CROSS_NAMES}
        p_self = {k: v for k, v in gp.items() if k not in _CROSS_NAMES}
        first = jax.tree.map(lambda t: t[0], p_self)
        cross = lambda hh: cross_fn(p_cross, hh, enc, heads=heads,
                                    dtype=dtype, act=cross_act)
        if cross_position == "pre":
            h = cross(h)
            h = plain_block(first, h)
        else:
            h = _self_attn(first, h, heads=heads, dtype=dtype,
                           use_flash=use_flash)
            h = cross(h)
            h = _mlp(first, h, dtype=dtype, act=act)
        c = next(iter(p_self.values())).shape[0]
        if c > 1:
            rest = jax.tree.map(lambda t: t[1:], p_self)
            h, _ = jax.lax.scan(lambda hh, p: (plain_block(p, hh), None),
                                h, rest)
        return h

    return group_forward


# ---------------------------------------------------------------------------
# GPipe engine over group-stacked params with a per-microbatch side input
# ---------------------------------------------------------------------------


def _stage_forward(params, h, enc, group_forward, remat=False):
    def body(carry, gp):
        return group_forward(gp, carry, enc), None

    if remat:
        # per-group checkpointing: the backward stores one group input
        # per scan step and recomputes the group's blocks (the memory
        # lever for GPT-2-XL-scale decoders — the pipeline's target)
        body = jax.checkpoint(body)
    h, _ = jax.lax.scan(body, h, params)
    return h


def gpipe_grouped(stacked, x, enc, *, group_forward: Callable,
                  num_microbatches: int, axis_name: str = PP_AXIS,
                  mesh=None, remat: bool = False) -> jax.Array:
    """Pipeline ``x`` [B, S, W] through group-stacked decoder params.

    Every leaf of ``stacked`` has leading dim ``G`` (groups); the
    shard_map shards that dim over ``axis_name`` so each stage owns
    ``G/pp`` groups.  ``enc`` [B, M, We] is the per-sample visual-token
    conditioning: it is NOT rotated — each stage indexes the microbatch
    it is processing this tick (stage ``i`` at tick ``t`` holds
    microbatch ``t - i``).  Same fill-drain schedule and data-axis
    microbatch sharding as ``pipeline.gpipe``."""
    m = num_microbatches
    b = x.shape[0]
    assert b % m == 0, (b, m)

    shape_src = mesh
    if shape_src is None:
        am = jax.sharding.get_abstract_mesh()
        shape_src = None if am.empty else am
    if shape_src is None or shape_src.shape.get(axis_name, 1) == 1:
        return _stage_forward(stacked, x, enc, group_forward, remat)

    pp_size = shape_src.shape[axis_name]
    g = next(iter(jax.tree.leaves(stacked))).shape[0]
    assert g % pp_size == 0, (
        f"groups {g} not divisible by pp={pp_size}: pipeline stages must "
        f"split at cross-attention group boundaries")

    mbs = x.reshape(m, b // m, *x.shape[1:])
    enc_mbs = enc.reshape(m, b // m, *enc.shape[1:])

    def spmd(params, mbs, enc_mbs):
        pp = jax.lax.axis_size(axis_name)
        i = jax.lax.axis_index(axis_name)
        perm = [(j, (j + 1) % pp) for j in range(pp)]

        def tick(carry, t):
            state, out = carry
            # stage i processes microbatch t-i this tick; clipped
            # indices during fill/drain feed garbage that the emit
            # guard masks out
            inp = jnp.where(i == 0, mbs[jnp.clip(t, 0, m - 1)], state)
            enc_t = enc_mbs[jnp.clip(t - i, 0, m - 1)]
            y = _stage_forward(params, inp, enc_t, group_forward, remat)
            mi = t - (pp - 1)
            emit = jnp.logical_and(i == pp - 1, mi >= 0)
            out = jnp.where(emit, out.at[jnp.clip(mi, 0, m - 1)].set(y), out)
            state = jax.lax.ppermute(y, axis_name, perm)
            return (state, out), None

        out0 = jnp.zeros_like(mbs)
        (_, out), _ = jax.lax.scan(
            tick, (jnp.zeros_like(mbs[0]), out0), jnp.arange(m + pp - 1))
        out = jnp.where(i == pp - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, axis_name)

    param_specs = jax.tree.map(lambda _: P(axis_name), stacked)
    kw = {} if mesh is None else {"mesh": mesh}
    dp = int(np.prod([shape_src.shape.get(a, 1) for a in BATCH_AXES]))
    if dp > 1 and (b // m) % dp == 0:
        mb_spec = P(None, BATCH_AXES, *([None] * (x.ndim - 1)))
        enc_spec = P(None, BATCH_AXES, *([None] * (enc.ndim - 1)))
    else:
        mb_spec = enc_spec = P()
    out = jax.shard_map(spmd, in_specs=(param_specs, mb_spec, enc_spec),
                        out_specs=mb_spec, check_vma=False,
                        **kw)(stacked, mbs, enc_mbs)
    return out.reshape(b, *x.shape[1:])


# ---------------------------------------------------------------------------
# flax module + layout converters
# ---------------------------------------------------------------------------


class PipelinedGatedDecoder(nn.Module):
    """Group-stacked gated decoder executing as a GPipe pipeline over
    ``mesh.pp`` — drop-in for the narrator's ``block_{i}`` stack (and,
    with ``cross_position="pre"``, the LaViLa GPT-2's ``h_{i}`` stack:
    at GPT-2-XL scale the decoder does not fit one chip's HBM with
    optimizer state, which is the case pipeline parallelism exists
    for)."""

    width: int
    layers: int
    heads: int
    cross_every: int = 2
    enc_width: Optional[int] = None  # visual-token width (default: width)
    cross_position: str = "mid"      # "mid" (VCLM) | "pre" (GPT-2)
    act: Callable = nn.gelu
    cross_act: Callable = nn.gelu
    dtype: Any = jnp.bfloat16
    use_flash: bool = True
    num_microbatches: int = 8
    axis_name: str = PP_AXIS
    mesh: Optional[Any] = None
    # checkpoint each group in the stage scan (backward recomputes the
    # group's blocks from its input) — see pipeline.gpipe remat
    remat: bool = False

    def _shapes(self) -> Dict[str, tuple]:
        assert self.layers % self.cross_every == 0, (
            self.layers, self.cross_every)
        g = self.layers // self.cross_every
        c = self.cross_every
        w = self.width
        ew = self.enc_width or w
        hid = 4 * w
        shapes = {
            # self leaves, group-major [G, c, ...]
            "ln1_scale": (g, c, w), "ln1_bias": (g, c, w),
            "qkv_kernel": (g, c, w, 3 * w), "qkv_bias": (g, c, 3 * w),
            "out_kernel": (g, c, w, w), "out_bias": (g, c, w),
            "ln2_scale": (g, c, w), "ln2_bias": (g, c, w),
            "fc1_kernel": (g, c, w, hid), "fc1_bias": (g, c, hid),
            "fc2_kernel": (g, c, hid, w), "fc2_bias": (g, c, w),
            # cross leaves [G, ...]
            "gate_attn": (g,), "gate_mlp": (g,),
            "lnx_scale": (g, w), "lnx_bias": (g, w),
            "xattn_q_kernel": (g, w, w), "xattn_q_bias": (g, w),
            "xattn_kv_kernel": (g, ew, 2 * w), "xattn_kv_bias": (g, 2 * w),
            "xattn_out_kernel": (g, w, w), "xattn_out_bias": (g, w),
            "lnxm_scale": (g, w), "lnxm_bias": (g, w),
            "xmlp_fc1_kernel": (g, w, hid), "xmlp_fc1_bias": (g, hid),
            "xmlp_fc2_kernel": (g, hid, w), "xmlp_fc2_bias": (g, w),
        }
        return shapes

    @nn.compact
    def __call__(self, x, enc):
        params = {}
        for name, shape in self._shapes().items():
            if name.endswith("_kernel"):
                init = nn.initializers.lecun_normal()
            elif name.endswith("_scale"):
                init = nn.initializers.ones
            else:  # biases and gates start at zero (gated-xattn init)
                init = nn.initializers.zeros
            params[name] = self.param(name, init, shape, jnp.float32)
        fwd = make_group_forward(
            heads=self.heads, cross_position=self.cross_position,
            dtype=self.dtype, use_flash=self.use_flash, act=self.act,
            cross_act=self.cross_act)
        return gpipe_grouped(params, x, enc, group_forward=fwd,
                             num_microbatches=self.num_microbatches,
                             axis_name=self.axis_name, mesh=self.mesh,
                             remat=self.remat)


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _detect_fmt(block: Dict) -> str:
    return "vclm" if "qkv" in block.get("attn", {}) else "gpt2"


def stack_gated_params(decoder_params: Dict, *, prefix: str) -> Dict:
    """Sequential ``{prefix}{i}`` gated-decoder tree -> group-stacked
    flat tree.  ``prefix`` is ``"block_"`` (VCLM) or ``"h_"`` (GPT-2);
    ``cross_every`` is inferred from which blocks carry cross params."""
    layers = sum(1 for k in decoder_params if k.startswith(prefix))
    assert layers > 0, f"no {prefix}* blocks in tree"
    blocks = [decoder_params[f"{prefix}{i}"] for i in range(layers)]
    fmt = _detect_fmt(blocks[0])
    cross_key = "xattn" if fmt == "vclm" else "crossattention"
    n_cross = sum(1 for b in blocks if cross_key in b)
    assert n_cross > 0 and layers % n_cross == 0, (layers, n_cross)
    c = layers // n_cross
    g = n_cross
    out: Dict[str, Any] = {}
    for name, path in _SELF_PATHS[fmt].items():
        stacked = jnp.stack([_get(b, path) for b in blocks])
        out[name] = stacked.reshape(g, c, *stacked.shape[1:])
    for name, path in _CROSS_PATHS[fmt].items():
        out[name] = jnp.stack([_get(blocks[i * c], path) for i in range(g)])
    return out


def unstack_gated_params(stacked: Dict, *, prefix: str) -> Dict:
    """Inverse of :func:`stack_gated_params`."""
    fmt = "vclm" if prefix == "block_" else "gpt2"
    g, c = stacked["qkv_kernel"].shape[:2]
    out: Dict[str, Any] = {}
    for gi in range(g):
        for ci in range(c):
            blk: Dict[str, Any] = {}
            for name, path in _SELF_PATHS[fmt].items():
                node = blk
                for k in path[:-1]:
                    node = node.setdefault(k, {})
                node[path[-1]] = stacked[name][gi, ci]
            if ci == 0:
                for name, path in _CROSS_PATHS[fmt].items():
                    node = blk
                    for k in path[:-1]:
                        node = node.setdefault(k, {})
                    node[path[-1]] = stacked[name][gi]
            out[f"{prefix}{gi * c + ci}"] = blk
    return out
