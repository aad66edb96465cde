"""Mixed-precision policy.

TPU MXU native dtype is bfloat16; params and loss reductions stay f32.
The reference trains fp32 and deploys TensorRT fp16
(``src/GuideDepth/inference.py:189-204``); here bf16 is the compute/deploy
dtype and f32 the accumulation dtype.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def from_str(name: str) -> "Precision":
        name = (name or "bfloat16").lower()
        if name in ("bf16", "bfloat16"):
            return Precision()
        if name in ("f32", "float32", "fp32"):
            return Precision(compute_dtype=jnp.float32)
        raise ValueError(f"unknown compute dtype {name!r}")

    def cast_compute(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )
