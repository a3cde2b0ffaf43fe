"""Mixture-of-Experts MLP with expert parallelism over an ``ep`` mesh
axis.

Beyond-parity capability (the reference has dense MLPs only): a
drop-in replacement for a transformer block's MLP that routes each
token to its top-k experts.  TPU-native formulation: the classic
GShard dispatch/combine einsum construction (one-hot capacity-bucketed
dispatch, batched expert matmuls, gated combine) with the expert
dimension annotated ``PartitionSpec("ep", ...)`` — under pjit XLA
lowers the dispatch/combine contractions to all_to_alls on ICI, so no
manual collectives appear in the model code (the same
annotate-and-let-XLA-partition recipe the rest of the framework uses).

Scalability: tokens are routed within fixed-size GROUPS (GShard's
grouping) so the dispatch/combine masks are [G, g, E, C] with
``C = g * top_k * capacity_factor / E`` — memory LINEAR in the total
token count (T * E * C/g per mask), not the O(T^2) a single global
capacity bucket would cost.  Groups also bound the blast radius of a
hot expert: overflow is per-group.

Router: top-k softmax gating with a load-balancing auxiliary loss
(Shazeer et al.; the standard mean(gates)*mean(assignments)*E form) and
fixed per-expert capacity so every shape is static under jit.  Overflow
tokens fall through the residual connection (their combine weights are
zero), which is the standard behavior.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from avion_tpu.parallel.mesh import EP_AXIS


def _capacity(group: int, experts: int, top_k: int,
              capacity_factor: float) -> int:
    """Per-expert slots per group: enough for ``top_k`` assignments per
    token at ``capacity_factor`` headroom (uniform routing fills
    ``top_k * group / experts`` slots)."""
    cap = int(group * top_k * capacity_factor / experts)
    return max(4, ((cap + 3) // 4) * 4)  # pad to a VPU-friendly multiple


def moe_dispatch_masks(
    router_logits: jax.Array,  # [G, g, E] f32
    top_k: int,
    capacity: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, dict]:
    """Returns (dispatch [G, g, E, C] f32, combine [G, g, E, C] f32,
    aux_loss scalar, stats dict).

    Position within each expert's per-group capacity bucket is assigned
    in token order (cumsum over the token dim); tokens past capacity are
    dropped from that expert.  ``stats`` carries router observability
    (a collapsed router would otherwise be invisible until the loss
    diverges): ``expert_load`` [E] = fraction of surviving assignments
    per expert, ``overflow`` = fraction of wanted assignments dropped
    at capacity, ``density`` [E] = pre-capacity top-1 distribution.
    """
    n_groups, g, e = router_logits.shape
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    gate_vals, gate_idx = jax.lax.top_k(probs, top_k)  # [G, g, k]

    # renormalize the selected gates so they sum to 1 per token
    gate_vals = gate_vals / jnp.clip(
        jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9)

    dispatch = jnp.zeros((n_groups, g, e, capacity), jnp.float32)
    combine = jnp.zeros((n_groups, g, e, capacity), jnp.float32)
    # assignment mask per k-slot, with positions from a token-order
    # cumsum; later k-slots see earlier slots' occupancy
    occupancy = jnp.zeros((n_groups, g, e), jnp.float32)
    for s in range(top_k):
        onehot = jax.nn.one_hot(gate_idx[..., s], e, dtype=jnp.float32)
        pos = jnp.cumsum(onehot, axis=1) - onehot + jnp.sum(
            occupancy, axis=1, keepdims=True)  # [G, g, E]
        keep = onehot * (pos < capacity)
        posc = jnp.clip(pos, 0, capacity - 1).astype(jnp.int32)
        slot = jax.nn.one_hot(posc, capacity, dtype=jnp.float32)
        sel = keep[..., None] * slot  # [G, g, E, C]
        dispatch = dispatch + sel
        combine = combine + sel * gate_vals[..., s][..., None, None]
        occupancy = occupancy + keep

    # load-balancing aux loss over the top-1 assignment distribution
    top1 = jax.nn.one_hot(gate_idx[..., 0], e, dtype=jnp.float32)
    density = jnp.mean(top1, axis=(0, 1))          # routed fraction/expert
    density_proxy = jnp.mean(probs, axis=(0, 1))   # mean router prob
    aux = jnp.sum(density * density_proxy) * e

    assigned = jnp.sum(occupancy, axis=(0, 1))     # kept slots / expert
    total = jnp.maximum(jnp.sum(assigned), 1.0)
    wanted = jnp.float32(n_groups * g * top_k)
    stats = {
        "expert_load": assigned / total,
        "overflow": 1.0 - jnp.sum(assigned) / wanted,
        "density": density,
    }
    return dispatch, combine, aux, stats


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
    group_size: int = 256  # routing-group tokens (GShard grouping)
    zloss: bool = True  # sow the router z-loss (weighted at call site)
    act: Callable = nn.gelu
    dtype: Any = jnp.bfloat16
    axis_name: str = EP_AXIS
    mesh: Optional[Any] = None  # unused; kept for call-site symmetry

    @nn.compact
    def __call__(self, x):
        b, s, w = x.shape
        e, hid = self.experts, int(self.width * self.hidden_mult)
        t = b * s
        g = min(self.group_size, t)
        # group tokens; pad the tail group (padded tokens route like
        # real ones but their combine output is sliced away)
        n_groups = -(-t // g)
        t_pad = n_groups * g
        cap = _capacity(g, e, self.top_k, self.capacity_factor)

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
        if t_pad != t:
            xt = jnp.pad(xt, ((0, t_pad - t), (0, 0)))
        xg = xt.reshape(n_groups, g, w)
        logits = router(xg.astype(jnp.float32))
        dispatch, combine, aux, stats = moe_dispatch_masks(
            logits, self.top_k, cap)
        self.sow("losses", "moe_aux", aux)
        if self.zloss:
            # router z-loss (ST-MoE): discourages drifting logit scale
            z = jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2)
            self.sow("moe_zloss", "z", z)
        # observability: per-expert load + overflow fraction reach the
        # train-step metrics (and the logger) via the "metrics"
        # collection — a collapsed router shows up immediately
        self.sow("metrics", "moe_expert_load", stats["expert_load"])
        self.sow("metrics", "moe_overflow", stats["overflow"])

        # dispatch: [G,g,W] x [G,g,E,C] -> [E,G,C,W]; annotate the
        # expert dim over "ep" so XLA partitions expert compute and
        # inserts the all_to_alls (no-op without an ep mesh axis)
        expert_in = jnp.einsum("ngw,ngec->encw", xg.astype(jnp.float32),
                               dispatch).astype(self.dtype)
        expert_in = _constrain(expert_in, (self.axis_name, None, None, None))
        h = jnp.einsum("encw,ewh->ench", expert_in, w1.astype(self.dtype))
        h = self.act(h + b1[:, None, None, :].astype(self.dtype))
        h = _constrain(h, (self.axis_name, None, None, None))
        out = jnp.einsum("ench,ehw->encw", h, w2.astype(self.dtype))
        out = out + b2[:, None, None, :].astype(self.dtype)
        out = _constrain(out, (self.axis_name, None, None, None))
        # combine: [E,G,C,W] x [G,g,E,C] -> [G,g,W]
        y = jnp.einsum("encw,ngec->ngw", out.astype(jnp.float32), combine)
        y = y.reshape(t_pad, w)[:t]
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
