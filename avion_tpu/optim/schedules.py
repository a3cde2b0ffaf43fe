"""LR schedules.

``cosine_schedule`` matches the reference's precomputed per-iteration
array (``avion/optim/schedulers.py:4-15``): linear warmup from
``start_warmup_value`` to ``base_value`` over ``warmup_epochs``, then
cosine decay to ``final_value`` — expressed as an optax schedule
function of the step (no host-side array needed under jit).
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_schedule(
    base_value: float,
    final_value: float,
    epochs: float,
    niter_per_ep: int,
    warmup_epochs: float = 0.0,
    start_warmup_value: float = 0.0,
):
    warmup_iters = int(warmup_epochs * niter_per_ep)
    total_iters = int(epochs * niter_per_ep)

    def schedule(step):
        step = jnp.minimum(step, total_iters)
        warm = start_warmup_value + (base_value - start_warmup_value) * (
            step / jnp.maximum(warmup_iters, 1)
        )
        progress = (step - warmup_iters) / jnp.maximum(
            total_iters - warmup_iters, 1
        )
        cos = final_value + 0.5 * (base_value - final_value) * (
            1 + jnp.cos(jnp.pi * progress)
        )
        return jnp.where(step < warmup_iters, warm, cos)

    return schedule
