"""Device-mesh construction and sharding plans.

TPU-native equivalents of the reference's parallelism inventory
(SURVEY.md §2.6): data/GOP parallelism over the 'data' axis (X1/X2),
spatial-tile parallelism over the 'tile' axis (X3/X5's analogue) with XLA
GSPMD inserting the conv halo exchanges, and psum gradient sync for
training DP (X6).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tile: int | None = None) -> Mesh:
    """(data, tile) mesh. ``tile`` shards the image H axis across chips."""
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    if tile is None:
        tile = 2 if n % 2 == 0 and n > 1 else 1
    data = n // tile
    assert data * tile == n, f"{n} devices cannot form (data={data}, tile={tile})"
    dev_array = np.asarray(devices).reshape(data, tile)
    return Mesh(dev_array, axis_names=("data", "tile"))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC frames: batch over 'data', H (spatial tiles) over 'tile'."""
    return NamedSharding(mesh, P("data", "tile", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def scalar_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))
