"""Mixed-precision policy.

TPU-native replacement for the reference's AMP setup
(``torch.cuda.amp.autocast`` + ``GradScaler`` at
``scripts/main_lavila_pretrain.py:341``): on TPU we run compute in
bfloat16 — which has the fp32 exponent range — so no loss scaling is
needed.  Parameters and optimizer state stay float32; activations and
matmuls are bfloat16; softmax/layernorm reductions are float32 (the
reference's fp32 LayerNorm variant at ``avion/models/transformer.py:26-32``
maps to ``norm_dtype``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    norm_dtype: Any = jnp.float32
    output_dtype: Any = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_param(self, x):
        return jnp.asarray(x, self.param_dtype)

    def cast_to_output(self, x):
        return jnp.asarray(x, self.output_dtype)


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)


def get_policy(name: str) -> Policy:
    name = name.lower()
    if name in ("bf16", "bfloat16", "mixed"):
        return DEFAULT_POLICY
    if name in ("fp32", "float32", "full"):
        return FP32_POLICY
    raise ValueError(f"unknown precision policy: {name!r}")
