"""Mesh + sharding helpers for multi-chip execution.

The reference is strictly single-node/single-device (SURVEY.md §2.5); its
only parallelism is a CPU thread pool. The TPU-native scaling story is data
parallelism over pages: put the page batch on a ``("data",)`` mesh axis and
let XLA partition every jitted pipeline stage (detection forward, CCL, rect
fitting) across chips — no hand-written communication. Tensor/pipeline/
sequence/expert parallelism do not pay off at this model scale and are
explicitly out of scope (documented in docs/PARALLELISM.md); the training
step separately demonstrates a ("data", "model") mesh with tensor-sharded
wide matrices (ocrs_tpu.train.train).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D ("data",) mesh over the first n devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


def shard_batch_dim(mesh: Mesh, array: jax.Array) -> jax.Array:
    """Shard the leading (batch) dim over the mesh's "data" axis."""
    spec = P("data", *([None] * (array.ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh."""
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), tree
    )
