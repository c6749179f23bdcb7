"""Device-mesh construction and sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
(code/train.py:295-298).  Here scale-out is mesh-based: a ``jax.sharding``
Mesh over ICI/DCN with named axes, batch arrays sharded over 'data', and
parameters replicated.  XLA inserts the gradient all-reduce (and the
cross-replica batch-norm reductions) automatically from the shardings, so
the train step contains no hand-written collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the given (default: all) devices.

    :param shape: per-axis sizes; default puts every device on the first axis
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_shardings(
    mesh: Mesh, batch: dict, axis: str = "data",
    spatial_axis: Optional[str] = None,
) -> dict:
    """Per-leaf NamedShardings for a batch dict.

    Every array leaf shards its leading (batch) dimension over ``axis``;
    with ``spatial_axis`` set, 4-D NCHW image leaves additionally shard H
    over it — the 2-D data x spatial layout (SURVEY §5's "long-context"
    analogue composed with DP).  XLA inserts the conv halo exchanges and
    gather collectives from the shardings alone.
    """
    out = {}
    for k, v in batch.items():
        if not (isinstance(v, np.ndarray) and v.ndim >= 1):
            out[k] = None
        elif spatial_axis is not None and v.ndim == 4:
            out[k] = NamedSharding(mesh, P(axis, None, spatial_axis, None))
        else:
            out[k] = NamedSharding(mesh, P(axis))
    return out


def shard_batch(
    mesh: Mesh, batch: dict, axis: str = "data",
    spatial_axis: Optional[str] = None,
) -> dict:
    """Device-put array leaves of a batch dict with the batch sharding.

    Single-process: a plain ``device_put`` of the global batch.
    Multi-process (``jax.process_count() > 1``): each host holds only its
    OWN shard of the global batch (the per-host pipeline shards via
    ``BatchLoader(num_shards=...)``), so the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the local array fills this
    process's addressable devices, no cross-host data movement.
    """
    shardings = batch_shardings(mesh, batch, axis, spatial_axis)
    multiproc = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        sharding = shardings[k]
        if sharding is None:
            out[k] = v
        elif multiproc:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        else:
            out[k] = jax.device_put(v, sharding)
    return out
