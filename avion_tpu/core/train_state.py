"""Train state pytree."""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, use_ema=False):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            # materialize a distinct copy: aliasing params would donate
            # the same buffer twice in a donated step
            ema_params=jax.tree_util.tree_map(jnp.copy, params) if use_ema else None,
        )
