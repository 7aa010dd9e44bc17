"""Device-mesh helpers for position-axis sharding."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


POS_AXIS = "pos"


def position_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the position (sequence) axis.

    Chromosome-scale inputs are sharded along positions; ICI neighbors hold
    adjacent genome chunks so boundary exchanges ride single hops.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (POS_AXIS,))
