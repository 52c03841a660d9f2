"""Explicit PRNG discipline.

JAX's explicit keys replace the reference's scattered global seeding
(reference data/dataset.py:351-360,417-418, scripts/evaluate.py:49). Same seed
=> bitwise-identical outputs, which the determinism tests rely on.
"""

from __future__ import annotations

from typing import Iterator

import jax


def key(seed: int = 0) -> jax.Array:
    return jax.random.key(seed)


def split_tree(k: jax.Array, names: list[str]) -> dict[str, jax.Array]:
    keys = jax.random.split(k, len(names))
    return dict(zip(names, keys))


class KeyStream:
    """Host-side helper: hands out fresh subkeys sequentially (never reused)."""

    def __init__(self, seed: int = 0):
        self._key = jax.random.key(seed)

    def __call__(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def take(self, n: int) -> Iterator[jax.Array]:
        for _ in range(n):
            yield self()
