"""Backend helpers shared by the Pallas kernels."""

from __future__ import annotations

import jax


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def on_tpu() -> bool:
    """True when the default backend runs Pallas TPU kernels natively.

    The environment exposes TPU through the experimental 'axon' platform;
    CPU test runs (JAX_PLATFORMS=cpu) fall back to interpret mode or pure-XLA
    paths.
    """
    return jax.default_backend() not in ("cpu",)
