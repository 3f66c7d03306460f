"""ctypes binding for the native prefetching frame loader
(native/frameloader.cpp). Decodes grayscale frames on C++ worker threads
into a bounded in-order queue — the dataset-playback hot loop stays off the
Python GIL (role of the reference's C++ example drivers)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    root = os.path.join(os.path.dirname(__file__), "..", "..", "native")
    so = os.path.join(root, "libframeloader.so")
    if not os.path.exists(so):
        subprocess.check_call(["sh", os.path.join(root, "build.sh")])
    lib = ctypes.CDLL(so)
    lib.frameloader_create.restype = ctypes.c_void_p
    lib.frameloader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.frameloader_next.restype = ctypes.c_int
    lib.frameloader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.frameloader_destroy.restype = None
    lib.frameloader_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


class FrameLoader:
    """Iterate decoded grayscale frames in order, prefetched by C++ threads.

    >>> for img in FrameLoader([...paths...]):
    ...     tracker.process(img, ts)
    """

    def __init__(self, paths, n_threads: int = 3, queue_depth: int = 8,
                 max_pixels: int = 4096 * 3072):
        self._lib = _load_lib()
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths]
        )
        self._handle = self._lib.frameloader_create(
            arr, len(paths), n_threads, queue_depth
        )
        self._buf = np.empty(max_pixels, np.uint8)
        self._n = len(paths)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self._lib.frameloader_next(
            self._handle,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._buf.size, ctypes.byref(w), ctypes.byref(h),
        )
        if rc == -2:
            raise StopIteration
        if rc != 0:
            raise IOError("frame decode failed")
        return (
            self._buf[: w.value * h.value]
            .reshape(h.value, w.value)
            .astype(np.float32)
        )

    def close(self):
        if self._handle:
            self._lib.frameloader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
