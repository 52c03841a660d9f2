"""Parallelism: mesh-based data parallelism with a tensor-parallel axis.

The reference is single-process single-GPU with zero distributed code
(SURVEY.md 2.5/2.6). TPU-native replacement: a 2-D ``(data, model)``
``jax.sharding.Mesh``; batches shard over ``data``, and the few very wide
kernels (the adapter's 256 -> 2*768*16 KV head, the projector output, UNet
feed-forwards) shard over ``model``. Everything runs under ``jit`` with
explicit in/out shardings — XLA GSPMD inserts the psum/all-gather collectives
over ICI; there is no hand-written comm layer.

Gradient reduction for DP falls out of jit: the loss is a mean over the
data-sharded batch, so grads arrive replicated via an XLA-inserted psum.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clap2diffusion_tpu.core.mesh import make_mesh

# Kernels at least this wide on their last axis get model-sharded.
TP_MIN_WIDTH = 2048


def make_train_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return make_mesh({"data": n // model_parallel, "model": model_parallel},
                     devices=devs[:n])


def param_spec(path: tuple, leaf) -> P:
    """Sharding rule for a parameter: model-shard wide output axes, else
    replicate. Biases and norms always replicate."""
    if leaf.ndim >= 2 and leaf.shape[-1] >= TP_MIN_WIDTH and leaf.shape[-1] % 2 == 0:
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh per ``param_spec``."""

    def place(path, leaf):
        spec = param_spec(path, leaf) if mesh.shape.get("model", 1) > 1 else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def batch_spec(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(np.asarray(x), batch_spec(mesh, np.asarray(x).ndim)),
        batch,
    )


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def make_sharded_step(step_fn: Callable, mesh: Mesh, donate_state: bool = True):
    """jit a (state, batch, rng) -> (state, metrics) step with DP shardings.

    State (params/opt) stays as placed (replicated or model-sharded); the
    batch is data-sharded; metrics come back replicated.
    """
    jit_kwargs: Dict = {}
    if donate_state:
        jit_kwargs["donate_argnums"] = (0,)
    return jax.jit(step_fn, **jit_kwargs)
