"""Device mesh + sharding helpers.

The reference's only parallelism is 8 env worker processes over pipes/shared
memory (baselines ShmemVecEnv, SURVEY §2.5).  The TPU-native scaling model:
env replicas are *data*, so cross-chip scale-out is data parallelism over the
env batch axis on a 1-D ``jax.sharding.Mesh``; parameters/optimizer state are
replicated (the nets are 64-100 wide); XLA inserts the gradient psum over ICI.
Multi-slice DCN would add an outer mesh axis — not needed at this model size.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def env_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (env-batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Place a pytree whose leaves have a leading env axis onto the mesh."""
    sh = env_sharding(mesh, axis)
    return jax.device_put(tree, sh)
