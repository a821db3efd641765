"""Device mesh helpers for chunk-parallel encode/decode.

Chunks are fully independent (no cross-chunk state in the algorithm —
reference SURVEY §5.7), so the natural sharding is pure data parallelism
over the chunk-batch axis: ``NamedSharding(mesh, P("chunks"))`` on inputs
and outputs; XLA inserts the ICI scatter/gather automatically.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["chunk_mesh", "shard_batch", "batch_sharding"]


def chunk_mesh(n_devices: int | None = None, axis_name: str = "chunks") -> Mesh:
    """1-D mesh over available devices for chunk-level data parallelism."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "chunks") -> NamedSharding:
    """Sharding that splits the leading (chunk-batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(array, mesh: Mesh, axis_name: str = "chunks"):
    """Place a host batch onto the mesh, split along its leading axis."""
    return jax.device_put(array, batch_sharding(mesh, axis_name))
