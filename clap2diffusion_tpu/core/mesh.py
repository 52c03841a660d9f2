"""Device mesh construction and sharding helpers.

The reference is single-process single-GPU (SURVEY.md section 2.5/2.6); here
multi-chip scaling is first-class: a named ``jax.sharding.Mesh`` with a
``data`` axis for DP over AudioCaps latents and an optional ``model`` axis so
tensor-parallel shardings are available without code changes. Collectives are
XLA-inserted (psum over ICI) — no custom comm layer.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a named mesh. ``-1`` in shape means "all remaining devices".

    Default: 1-D ``data`` mesh over all local devices.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if shape is None:
        shape = {"data": -1}
    names = list(shape.keys())
    sizes = list(shape.values())
    n = len(devices)
    # Resolve a single -1 wildcard.
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1])) or 1
        sizes[sizes.index(-1)] = max(1, n // known)
    total = int(np.prod(sizes))
    if total > n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} devices, have {n}")
    dev_array = np.array(devices[:total]).reshape(sizes)
    return Mesh(dev_array, axis_names=tuple(names))


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim, axis)), batch
    )
