"""Mesh construction helpers."""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all).

    SSG's parallel axes are data (batch) and distance-matrix rows; both map
    onto one mesh axis — a v5e-8 ring over ICI in production, the virtual
    CPU mesh in tests. Under a multi-process runtime (multihost.initialize)
    ``jax.devices()`` spans every host, so the default mesh is the GLOBAL
    DCN x ICI mesh: devices are ordered process-major, keeping each host's
    row stripes contiguous and intra-host collectives on ICI.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))
