"""ctypes bindings for libssg_data — the native C++ data pipeline.

The C++ library (native/ssg_data/) is this framework's replacement for the
reference's DataLoader-worker input path (PIL decode + torchvision resize,
SURVEY.md §2 #12 and the "Native compute" row): fused JPEG/PNG/PPM decode +
bilinear resize + threaded batch assembly, plus a background-prefetching
loader that overlaps host decode with TPU compute.

Gated: if the .so is absent we try one ``make`` (toolchain is in the image);
on any failure ``is_available()`` is False and callers fall back to PIL.
Set SSG_TPU_NO_NATIVE=1 to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.normpath(os.path.join(_HERE, "..", "..", "native", "ssg_data"))
_SO_PATH = os.path.join(_NATIVE_DIR, "libssg_data.so")

_lib = None
_lib_lock = threading.Lock()
_load_attempted = False


def _try_load():
    global _lib, _load_attempted
    with _lib_lock:
        if _load_attempted:
            return _lib
        _load_attempted = True
        if os.environ.get("SSG_TPU_NO_NATIVE"):
            return None
        if not os.path.exists(_SO_PATH) and os.path.isdir(_NATIVE_DIR):
            try:
                subprocess.run(
                    ["make", "-s"], cwd=_NATIVE_DIR, check=True,
                    capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.ssg_decode_resize.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, u8p]
        lib.ssg_decode_resize.restype = ctypes.c_int
        lib.ssg_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u8p, ctypes.c_int, i32p,
        ]
        lib.ssg_load_batch.restype = ctypes.c_int
        lib.ssg_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.ssg_loader_create.restype = ctypes.c_void_p
        lib.ssg_loader_next.argtypes = [ctypes.c_void_p, u8p, i32p]
        lib.ssg_loader_next.restype = ctypes.c_int
        lib.ssg_loader_reset.argtypes = [ctypes.c_void_p]
        lib.ssg_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.ssg_data_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def is_available() -> bool:
    return _try_load() is not None


def _paths_array(paths: list[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def decode_resize(path: str, height: int, width: int) -> np.ndarray:
    """Decode one image file and bilinear-resize to (height, width, 3) u8."""
    lib = _try_load()
    if lib is None:
        raise RuntimeError("libssg_data unavailable")
    out = np.empty((height, width, 3), dtype=np.uint8)
    rc = lib.ssg_decode_resize(
        path.encode(), height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise IOError(f"ssg_decode_resize({path!r}) failed with code {rc}")
    return out


def load_batch(paths: list[str], height: int, width: int,
               num_threads: int = 0) -> np.ndarray:
    """Threaded decode+resize of a batch -> (N, height, width, 3) u8.

    Failed items raise (the native layer zero-fills and reports them)."""
    lib = _try_load()
    if lib is None:
        raise RuntimeError("libssg_data unavailable")
    n = len(paths)
    out = np.empty((n, height, width, 3), dtype=np.uint8)
    err = np.full((n,), -1, dtype=np.int32)
    nfail = lib.ssg_load_batch(
        _paths_array(paths), n, height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads,
        err.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if nfail:
        bad = [paths[i] for i in err if i >= 0]
        raise IOError(f"{nfail} image(s) failed to decode: {bad[:5]}")
    return out


class BatchLoader:
    """Background-prefetching epoch iterator over a file list.

    Yields (images_u8 (B,H,W,3), valid) with the tail batch zero-padded;
    decode of batch i+1..i+prefetch proceeds while the consumer holds
    batch i (device compute overlap).
    """

    def __init__(self, paths: list[str], batch_size: int, height: int,
                 width: int, num_threads: int = 0, prefetch: int = 2):
        lib = _try_load()
        if lib is None:
            raise RuntimeError("libssg_data unavailable")
        self._lib = lib
        self._shape = (batch_size, height, width, 3)
        self.num_batches = (len(paths) + batch_size - 1) // batch_size
        self._handle = lib.ssg_loader_create(
            _paths_array(paths), len(paths), batch_size, height, width,
            num_threads, prefetch,
        )
        if not self._handle:
            raise RuntimeError("ssg_loader_create failed")

    def __iter__(self):
        self._lib.ssg_loader_reset(self._handle)
        valid = ctypes.c_int(0)
        while True:
            out = np.empty(self._shape, dtype=np.uint8)
            ok = self._lib.ssg_loader_next(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.byref(valid),
            )
            if not ok:
                return
            yield out, int(valid.value)

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.ssg_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
