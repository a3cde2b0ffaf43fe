"""Pipeline parallelism: GPipe-style collective pipeline over a ``pp``
mesh axis.

Beyond-parity capability (the reference is data-parallel only —
SURVEY §2.3): partitions a transformer's *layers* over devices so towers
too large for one chip's HBM (ViT-H/g, the narrator's GPT-2-XL decoder)
can train. TPU-native formulation: one SPMD program under
``jax.shard_map`` where each pipeline stage holds ``layers/pp`` blocks
(stacked-parameter leading dim sharded over ``pp``); microbatch
activations rotate stage-to-stage with ``jax.lax.ppermute`` on ICI while
``lax.scan`` steps the schedule. Autodiff runs through the permutation
chain, so the backward pipeline comes for free.

Schedule: classic GPipe fill-drain. With ``M`` microbatches and ``P``
stages the scan runs ``M + P - 1`` ticks; bubble fraction is
``(P-1)/(M+P-1)`` — pick ``M >= 4*P`` in production configs.

Parameters are stored stacked (leading dim = layers) with flat names
(``qkv_kernel: [L, W, 3W]``, ...), and converters to/from the sequential
``Transformer`` ``resblocks_{i}`` tree keep checkpoint interop — a
sequentially-trained .pt/orbax checkpoint runs pipelined and vice versa.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from avion_tpu.ops.attention import attention_packed
from avion_tpu.parallel.mesh import BATCH_AXES, PP_AXIS

# flat stacked-param names -> (sequential Block subtree path)
_LEAF_PATHS: Dict[str, tuple] = {
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
}


def _layernorm(x, scale, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    return y * scale + bias


def block_forward(p: Dict[str, jax.Array], x: jax.Array, *, heads: int,
                  act: Callable = nn.gelu, dtype: Any = jnp.bfloat16,
                  use_flash: bool = True, causal: bool = False) -> jax.Array:
    """Pure-function pre-LN residual block, numerically identical to
    ``layers.Block`` (f32 LayerNorm, bf16 matmuls, packed-qkv
    attention)."""
    w = x.shape[-1]
    y = _layernorm(x, p["ln1_scale"], p["ln1_bias"]).astype(dtype)
    qkv = y @ p["qkv_kernel"].astype(dtype) + p["qkv_bias"].astype(dtype)
    o = attention_packed(qkv[..., :w], qkv[..., w:2 * w], qkv[..., 2 * w:],
                         heads, causal=causal, use_flash=use_flash)
    # named for the pipeline's save_attn remat (same policy as the
    # sequential tower): the rematerialized backward keeps the attention
    # output instead of re-running the kernel
    o = jax.ad_checkpoint.checkpoint_name(o, "attn_out")
    x = x + (o @ p["out_kernel"].astype(dtype) + p["out_bias"].astype(dtype))
    y = _layernorm(x, p["ln2_scale"], p["ln2_bias"]).astype(dtype)
    h = act(y @ p["fc1_kernel"].astype(dtype) + p["fc1_bias"].astype(dtype))
    return x + (h @ p["fc2_kernel"].astype(dtype)
                + p["fc2_bias"].astype(dtype))


def _stage_forward(stage_params, x, *, remat=False, **blk_kw):
    """Apply this stage's ``layers/pp`` stacked blocks sequentially.

    ``remat=True`` checkpoints each block with the sequential tower's
    ``save_attn`` policy: the backward keeps only block inputs plus the
    named attention outputs and recomputes the rest."""

    def body(h, p):
        return block_forward(p, h, **blk_kw), None

    if remat:
        body = jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_only_these_names(
                "attn_out", "attn_lse"))
    x, _ = jax.lax.scan(body, x, stage_params)
    return x


def gpipe(stacked_params, x, *, heads: int, num_microbatches: int,
          axis_name: str = PP_AXIS, act: Callable = nn.gelu,
          dtype: Any = jnp.bfloat16, use_flash: bool = True,
          causal: bool = False, mesh=None, remat: bool = False) -> jax.Array:
    """Run the stacked-block transformer pipelined over ``axis_name``.

    ``stacked_params`` leaves have leading dim = total layers; the
    shard_map shards that dim over the pipeline axis so each stage sees
    its own slice. ``x`` is [B, S, W]; the batch splits into
    ``num_microbatches`` equal microbatches.

    ``remat=True`` checkpoints each stage forward: the backward pipeline
    stores one [B/M, S, W] stage input per tick instead of every block
    intermediate — the lever that fits towers big enough to NEED a
    pipeline (GPipe's own per-microbatch recompute strategy).
    """
    m = num_microbatches
    b = x.shape[0]
    assert b % m == 0, (b, m)
    blk_kw = dict(heads=heads, act=act, dtype=dtype, use_flash=use_flash,
                  causal=causal)
    if remat:
        blk_kw["remat"] = True

    shape_src = mesh
    if shape_src is None:  # ambient mesh (jax.set_mesh) carries the axes
        am = jax.sharding.get_abstract_mesh()
        shape_src = None if am.empty else am
    if shape_src is None or shape_src.shape.get(axis_name, 1) == 1:
        # no mesh context (model init, mesh-less eval) or a 1-stage
        # "pipeline": run the stacked stack sequentially — same math,
        # no collectives
        return _stage_forward(stacked_params, x, **blk_kw)

    mb = x.reshape(m, b // m, *x.shape[1:])

    def spmd(params, mbs):
        pp = jax.lax.axis_size(axis_name)
        i = jax.lax.axis_index(axis_name)
        perm = [(j, (j + 1) % pp) for j in range(pp)]

        def tick(carry, t):
            state, out = carry
            # stage 0 injects microbatch t (clipped: garbage after M
            # ticks is masked by the output guard); others consume the
            # rotated activation from the previous stage
            inp = jnp.where(i == 0, mbs[jnp.clip(t, 0, m - 1)], state)
            y = _stage_forward(params, inp, **blk_kw)
            # last stage emits microbatch t-(pp-1) once the fill ends
            mi = t - (pp - 1)
            emit = jnp.logical_and(i == pp - 1, mi >= 0)
            out = jnp.where(emit, out.at[jnp.clip(mi, 0, m - 1)].set(y), out)
            state = jax.lax.ppermute(y, axis_name, perm)
            return (state, out), None

        out0 = jnp.zeros_like(mbs)
        (_, out), _ = jax.lax.scan(
            tick, (jnp.zeros_like(mbs[0]), out0), jnp.arange(m + pp - 1))
        # result lives on the last stage; zero-mask + psum replicates it
        out = jnp.where(i == pp - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, axis_name)

    param_specs = jax.tree.map(lambda _: P(axis_name), stacked_params)
    kw = {} if mesh is None else {"mesh": mesh}
    # Microbatch batch dim (dim 1 after the reshape) shards over the
    # data axes: each data-parallel group pipelines only its own batch
    # shard instead of redundantly processing the full global batch
    # (the pp ppermute/psum stay within a data coordinate). Requires
    # b % (m * dp) == 0; otherwise fall back to replicated compute.
    dp = int(np.prod([shape_src.shape.get(a, 1) for a in BATCH_AXES]))
    if dp > 1 and (b // m) % dp == 0:
        mb_spec = P(None, BATCH_AXES, *([None] * (x.ndim - 1)))
    else:
        mb_spec = P()
    out = jax.shard_map(spmd, in_specs=(param_specs, mb_spec),
                        out_specs=mb_spec, check_vma=False,
                        **kw)(stacked_params, mb)
    return out.reshape(b, *x.shape[1:])


class PipelinedTransformer(nn.Module):
    """Drop-in layer-stack replacement for ``layers.Transformer`` that
    executes as a GPipe pipeline over the ``pp`` mesh axis.

    Params are stacked ([layers, ...] leading dim) so the pipeline
    shard_map can slice them per stage; ``stack_block_params`` /
    ``unstack_block_params`` convert to the sequential layout.
    """

    width: int
    layers: int
    heads: int
    mlp_ratio: float = 4.0
    act: Callable = nn.gelu
    dtype: Any = jnp.bfloat16
    use_flash: bool = True
    causal: bool = False
    num_microbatches: int = 4
    axis_name: str = PP_AXIS
    mesh: Optional[Any] = None
    # checkpoint each stage's blocks (save_attn policy): backward stores
    # block inputs + attention outputs per tick instead of every
    # intermediate — the memory lever for towers that need a pipeline
    remat: bool = False

    def _leaf_shape(self, name: str) -> tuple:
        w, hid = self.width, int(self.width * self.mlp_ratio)
        shapes = {
            "ln1_scale": (w,), "ln1_bias": (w,),
            "qkv_kernel": (w, 3 * w), "qkv_bias": (3 * w,),
            "out_kernel": (w, w), "out_bias": (w,),
            "ln2_scale": (w,), "ln2_bias": (w,),
            "fc1_kernel": (w, hid), "fc1_bias": (hid,),
            "fc2_kernel": (hid, w), "fc2_bias": (w,),
        }
        return (self.layers,) + shapes[name]

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        del deterministic  # no dropout variants in the pipelined stack
        params = {}
        for name in _LEAF_PATHS:
            if name.endswith("_kernel"):
                init = nn.initializers.lecun_normal()
            elif name.endswith("_scale"):
                init = nn.initializers.ones
            else:
                init = nn.initializers.zeros
            params[name] = self.param(name, init, self._leaf_shape(name),
                                      jnp.float32)
        return gpipe(params, x, heads=self.heads,
                     num_microbatches=self.num_microbatches,
                     axis_name=self.axis_name, act=self.act,
                     dtype=self.dtype, use_flash=self.use_flash,
                     causal=self.causal, mesh=self.mesh, remat=self.remat)


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def stack_block_params(transformer_params: Dict, layers: int) -> Dict:
    """``Transformer`` ``resblocks_{i}`` tree -> stacked flat tree (for
    loading a sequentially-trained checkpoint into the pipeline)."""
    out = {}
    for name, path in _LEAF_PATHS.items():
        out[name] = jnp.stack([
            _get(transformer_params[f"resblocks_{i}"], path)
            for i in range(layers)
        ])
    return out


def adapt_stacked_layouts(src: Dict, template: Dict) -> Dict:
    """Recursively convert transformer-layer subtrees between the
    sequential ``resblocks_{i}`` layout and the stacked pipeline layout
    so ``src`` matches ``template`` — checkpoints trained sequentially
    load into pipelined models and vice versa (VERDICT r2 #4)."""
    if not isinstance(src, dict) or not isinstance(template, dict):
        return src
    src_seq = any(k.startswith("resblocks_") for k in src)
    tpl_stacked = "qkv_kernel" in template
    src_stacked = "qkv_kernel" in src
    tpl_seq = any(k.startswith("resblocks_") for k in template)
    if src_seq and tpl_stacked:
        layers = sum(1 for k in src if k.startswith("resblocks_"))
        return stack_block_params(src, layers)
    if src_stacked and tpl_seq:
        return unstack_block_params(src)

    # gated decoders (narrator block_{i} / GPT-2 h_{i} <-> group-stacked
    # "blocks"; see parallel/pipeline_gated.py)
    def _is_block(key, prefix):
        return key.startswith(prefix) and key[len(prefix):].isdigit()

    tpl_blocks = template.get("blocks")
    tpl_gated_stacked = isinstance(tpl_blocks, dict) and "gate_attn" in tpl_blocks
    for prefix in ("block_", "h_"):
        if tpl_gated_stacked and any(_is_block(k, prefix) for k in src):
            from avion_tpu.parallel.pipeline_gated import stack_gated_params

            out = {k: adapt_stacked_layouts(v, template.get(k, {}))
                   for k, v in src.items() if not _is_block(k, prefix)}
            out["blocks"] = stack_gated_params(src, prefix=prefix)
            return out
    src_blocks = src.get("blocks")
    if isinstance(src_blocks, dict) and "gate_attn" in src_blocks:
        for prefix in ("block_", "h_"):
            if any(_is_block(k, prefix) for k in template):
                from avion_tpu.parallel.pipeline_gated import (
                    unstack_gated_params)

                out = {k: adapt_stacked_layouts(v, template.get(k, {}))
                       for k, v in src.items() if k != "blocks"}
                out.update(unstack_gated_params(src_blocks, prefix=prefix))
                return out
    return {k: adapt_stacked_layouts(v, template.get(k, {}))
            for k, v in src.items()}


def unstack_block_params(stacked: Dict) -> Dict:
    """Inverse of :func:`stack_block_params`."""
    layers = int(next(iter(stacked.values())).shape[0])
    out: Dict[str, Any] = {}
    for i in range(layers):
        blk: Dict[str, Any] = {}
        for name, path in _LEAF_PATHS.items():
            node = blk
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = stacked[name][i]
        out[f"resblocks_{i}"] = blk
    return out
