"""Device mesh & sharding helpers (the multi-chip story).

FFmpeg has no distributed runtime (SURVEY.md §2.9 P8); the TPU-native
equivalents here:
  * data axis  — independent frames/clips sharded across chips (the analog
    of frame-pipeline threading, P2)
  * spatial axis — rows of a frame sharded across chips for tile-parallel
    stages (the analog of slice/tile threading, P1/P3); resize matmuls and
    elementwise chains partition cleanly, XLA inserts the collectives.

All entry points take an explicit device list so tests can run on a
virtual CPU mesh while production uses the real ICI mesh.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with ('data', 'spatial') axes. spatial divides n_devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % spatial:
        raise ValueError(f"spatial={spatial} does not divide {n} devices")
    arr = np.array(devs).reshape(n // spatial, spatial)
    return Mesh(arr, ("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial_dim: Optional[int] = None,
                   ndim: int = 3) -> NamedSharding:
    """Sharding for a batch-of-planes array (N, ..., H, W): batch over
    'data', optionally H over 'spatial'."""
    spec = [None] * ndim
    spec[0] = "data"
    if spatial_dim is not None:
        spec[spatial_dim] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, arrays: List[jax.Array],
                spatial_dim: Optional[int] = None) -> List[jax.Array]:
    """Place each (N, ...) array with batch sharded over 'data'."""
    out = []
    for a in arrays:
        sh = batch_sharding(mesh, spatial_dim, np.ndim(a))
        out.append(jax.device_put(a, sh))
    return out
