"""Persistent XLA compilation cache setup.

First compile of the big graphs (ResNet forward/backward, re-ranking) costs
20-40 s on this TPU; the persistent cache makes every later process start
warm. Scripts call ``enable_compilation_cache()`` before first device use.
"""

from __future__ import annotations

import os

import jax

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Best-effort persistent compile cache; returns the dir or None."""
    path = cache_dir or os.environ.get("SSG_TPU_CACHE_DIR", _DEFAULT)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return path
