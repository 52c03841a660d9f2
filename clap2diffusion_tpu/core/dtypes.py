"""Dtype policy: fp32 params, bf16 compute on the MXU.

TPU matmuls want bfloat16 operands; parameters and reductions stay float32.
Parity tests against the reference run everything in float32
(``DTypePolicy.fp32()``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


@dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def from_strings(cls, param: str, compute: str) -> "DTypePolicy":
        return cls(param_dtype=_DTYPES[param], compute_dtype=_DTYPES[compute])

    @classmethod
    def fp32(cls) -> "DTypePolicy":
        return cls(param_dtype=jnp.float32, compute_dtype=jnp.float32)

    @classmethod
    def bf16(cls) -> "DTypePolicy":
        return cls(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)

    def cast(self, x):
        return x.astype(self.compute_dtype)
