"""Mixed-precision policy.

TPU-native default: parameters and optimizer state in float32, activations
and matmuls in bfloat16 (MXU-native), losses/metrics reduced in float32.
The reference's fp16 path (``--precision 16`` + pad_to_multiple_of=8,
data_module.py:215) maps to this policy on TPU.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        import jax

        def cast(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(self.compute_dtype)
            return x

        return jax.tree_util.tree_map(cast, tree)


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)
