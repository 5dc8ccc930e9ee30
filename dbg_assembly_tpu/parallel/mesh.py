"""Device mesh helpers.

The framework's parallel axes (SURVEY.md section 2.5):
  * 'd' (data)  — reads-batch sharding, the analog of the reference's
    round-robin `i % threadNum` read assignment (DBGgraph.cpp:42).
  * k-mer space — table sharding by k-mer value routed with all_to_all,
    the analog of `kmer % threadNum == threadId` ownership
    (DBGgraph.cpp:148-150); see count_sharded.py.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding


def data_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("d",))


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with their leading dim sharded over the 'd' axis."""
    out = []
    for a in arrays:
        spec = P("d", *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def pad_to_multiple(a: np.ndarray, m: int, fill=0):
    n = a.shape[0]
    pad = (-n) % m
    if pad == 0:
        return a
    pad_block = np.full((pad,) + a.shape[1:], fill, dtype=a.dtype)
    return np.concatenate([a, pad_block], axis=0)
