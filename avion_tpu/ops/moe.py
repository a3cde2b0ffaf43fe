"""Mixture-of-Experts MLP with expert parallelism over an ``ep`` mesh
axis.

Beyond-parity capability (the reference has dense MLPs only): a
drop-in replacement for a transformer block's MLP that routes each
token to its top-k experts. TPU-native formulation: the classic
dispatch/combine einsum construction (one-hot capacity-bucketed
dispatch, batched expert matmuls, gated combine) with the expert
dimension annotated ``PartitionSpec("ep", ...)`` — under pjit XLA
lowers the dispatch/combine contractions to all_to_alls on ICI, so no
manual collectives appear in the model code (the same
annotate-and-let-XLA-partition recipe the rest of the framework uses).

Router: top-k softmax gating with a load-balancing auxiliary loss
(Shazeer et al.; the standard mean(gates)*mean(assignments)*E form) and
a fixed per-expert capacity so every shape is static under jit.
Overflow tokens fall through the residual connection (their combine
weights are zero), which is the standard behavior.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from avion_tpu.parallel.mesh import EP_AXIS


def _capacity(tokens: int, experts: int, capacity_factor: float) -> int:
    cap = int(tokens * capacity_factor / experts)
    return max(4, ((cap + 3) // 4) * 4)  # pad to a VPU-friendly multiple


def moe_dispatch_masks(
    router_logits: jax.Array,  # [T, E] f32
    top_k: int,
    capacity: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (dispatch [T, E, C] bool-ish f32, combine [T, E, C] f32,
    aux_loss scalar).

    Position within each expert's capacity bucket is assigned in token
    order (cumsum over the token dim), matching the reference MoE
    constructions; tokens past capacity are dropped from that expert.
    """
    t, e = router_logits.shape
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    gate_vals, gate_idx = jax.lax.top_k(probs, top_k)  # [T, k]

    # renormalize the selected gates so they sum to 1 per token
    gate_vals = gate_vals / jnp.clip(
        jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9)

    dispatch = jnp.zeros((t, e, capacity), jnp.float32)
    combine = jnp.zeros((t, e, capacity), jnp.float32)
    # assignment mask per k-slot, with positions from a token-order
    # cumsum; later k-slots see earlier slots' occupancy
    occupancy = jnp.zeros((t, e), jnp.float32)
    for s in range(top_k):
        onehot = jax.nn.one_hot(gate_idx[:, s], e, dtype=jnp.float32)
        pos = jnp.cumsum(onehot, axis=0) - onehot + jnp.sum(
            occupancy, axis=0, keepdims=True)  # [T, E]
        keep = onehot * (pos < capacity)
        posc = jnp.clip(pos, 0, capacity - 1).astype(jnp.int32)
        slot = jax.nn.one_hot(posc, capacity, dtype=jnp.float32)  # [T,E,C]
        sel = keep[..., None] * slot
        dispatch = dispatch + sel
        combine = combine + sel * gate_vals[:, s][:, None, None]
        occupancy = occupancy + keep

    # load-balancing aux loss over the top-1 assignment distribution
    top1 = jax.nn.one_hot(gate_idx[:, 0], e, dtype=jnp.float32)
    density = jnp.mean(top1, axis=0)          # fraction routed per expert
    density_proxy = jnp.mean(probs, axis=0)   # mean router prob per expert
    aux = jnp.sum(density * density_proxy) * (e * e) / e
    return dispatch, combine, aux


class MoEMlp(nn.Module):
    """Expert-parallel MLP: drop-in for ``layers.Mlp``.

    Stores the router aux loss in the ``"losses"`` collection under
    ``moe_aux`` (``model.apply(..., mutable=["losses"])`` in training
    steps that want to add it, weighted by ``aux_weight`` at the call
    site).
    """

    width: int
    experts: int = 8
    hidden_mult: float = 4.0
    top_k: int = 2
    capacity_factor: float = 1.25
    act: Callable = nn.gelu
    dtype: Any = jnp.bfloat16
    axis_name: str = EP_AXIS
    mesh: Optional[Any] = None  # unused; kept for call-site symmetry

    @nn.compact
    def __call__(self, x):
        b, s, w = x.shape
        e, hid = self.experts, int(self.width * self.hidden_mult)
        t = b * s
        cap = _capacity(t, e, self.capacity_factor)

        router = nn.Dense(e, dtype=jnp.float32, param_dtype=jnp.float32,
                          name="router")
        w1 = self.param("expert_fc1", nn.initializers.lecun_normal(),
                        (e, w, hid), jnp.float32)
        b1 = self.param("expert_fc1_bias", nn.initializers.zeros, (e, hid),
                        jnp.float32)
        w2 = self.param("expert_fc2", nn.initializers.lecun_normal(),
                        (e, hid, w), jnp.float32)
        b2 = self.param("expert_fc2_bias", nn.initializers.zeros, (e, w),
                        jnp.float32)

        xt = x.reshape(t, w)
        logits = router(xt.astype(jnp.float32))
        dispatch, combine, aux = moe_dispatch_masks(logits, self.top_k, cap)
        self.sow("losses", "moe_aux", aux)

        # dispatch: [T,W] x [T,E,C] -> [E,C,W]; annotate the expert dim
        # over "ep" so XLA partitions expert compute and inserts the
        # all_to_alls (no-op on meshes without an ep axis)
        expert_in = jnp.einsum("tw,tec->ecw", xt.astype(jnp.float32),
                               dispatch).astype(self.dtype)
        expert_in = _constrain(expert_in, (self.axis_name, None, None))
        h = jnp.einsum("ecw,ewh->ech", expert_in, w1.astype(self.dtype))
        h = self.act(h + b1[:, None, :].astype(self.dtype))
        h = _constrain(h, (self.axis_name, None, None))
        out = jnp.einsum("ech,ehw->ecw", h, w2.astype(self.dtype))
        out = out + b2[:, None, :].astype(self.dtype)
        out = _constrain(out, (self.axis_name, None, None))
        # combine: [E,C,W] x [T,E,C] -> [T,W]
        y = jnp.einsum("ecw,tec->tw", out.astype(jnp.float32), combine)
        return y.reshape(b, s, w).astype(x.dtype)


def _constrain(x, spec):
    """with_sharding_constraint if the ambient mesh has the axes."""
    from jax.sharding import PartitionSpec as P
    from jax.sharding import get_abstract_mesh

    try:
        m = get_abstract_mesh()
        names = set(m.axis_names) if m is not None else set()
    except Exception:
        names = set()
    if not names:
        return x
    fixed = tuple(a if (a is None or a in names) else None for a in spec)
    return jax.lax.with_sharding_constraint(x, P(*fixed))
