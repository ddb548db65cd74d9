"""Device mesh helpers for multi-chip rendering.

The reference is single-GPU; its scaling axes (instances, pixels, rays —
SURVEY §2e) map to a JAX device mesh here. Screen-tile sharding is the
primary axis (the pixel/ray loops dominate), with ICI collectives implicit:
each device renders its tile against the replicated scene, and the image is
already sharded on output (no gather needed unless the host wants it).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def _factor2(n: int) -> Tuple[int, int]:
    """Split n into the most-square (rows, cols) factorization."""
    best = (1, n)
    for r in range(1, int(math.isqrt(n)) + 1):
        if n % r == 0:
            best = (r, n // r)
    return best


def make_tile_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axes: Tuple[str, str] = ("rows", "cols"),
) -> Mesh:
    """2D device mesh over screen tiles. On a real slice, keep neighbouring
    tiles on ICI-adjacent chips (jax's default device order is torus-major,
    which already does this)."""
    devices = list(devices if devices is not None else jax.devices())
    r, c = _factor2(len(devices))
    arr = np.asarray(devices).reshape(r, c)
    return Mesh(arr, axes)
