"""ctypes bindings for the native scenecore library (native/scenecore.cpp).

The native library provides the host-side runtime pieces the reference
implements in C++: the fragmentable arena allocator, the staging delta
packer, and morton coding. Everything degrades gracefully to pure
Python/numpy when the library hasn't been built (``make -C native``) —
``AVAILABLE`` tells you which path is active.
"""

from __future__ import annotations

import ctypes as C
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native",
    "libscenecore.so",
)

_lib = None
AVAILABLE = False


def _try_load():
    global _lib, AVAILABLE
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = C.CDLL(_LIB_PATH)
    u64, i64, i32 = C.c_uint64, C.c_int64, C.c_int32
    fp, ip, up = (
        C.POINTER(C.c_float), C.POINTER(C.c_int32), C.POINTER(C.c_uint64),
    )
    lib.arena_create.restype = C.c_void_p
    lib.arena_create.argtypes = [u64, u64]
    lib.arena_destroy.argtypes = [C.c_void_p]
    lib.arena_alloc.restype = u64
    lib.arena_alloc.argtypes = [C.c_void_p, u64]
    lib.arena_free.restype = C.c_int
    lib.arena_free.argtypes = [C.c_void_p, u64]
    lib.arena_stack_top.restype = u64
    lib.arena_stack_top.argtypes = [C.c_void_p]
    lib.arena_live_bytes.restype = u64
    lib.arena_live_bytes.argtypes = [C.c_void_p]
    lib.arena_live_count.restype = u64
    lib.arena_live_count.argtypes = [C.c_void_p]
    lib.arena_compact.restype = i64
    lib.arena_compact.argtypes = [C.c_void_p, up, up, up, i64, up]

    lib.packer_create.restype = C.c_void_p
    lib.packer_create.argtypes = [i64]
    lib.packer_destroy.argtypes = [C.c_void_p]
    lib.packer_capacity.restype = i64
    lib.packer_capacity.argtypes = [C.c_void_p]
    lib.packer_grow.argtypes = [C.c_void_p, i64]
    for name in ("packer_pos", "packer_scale", "packer_quat"):
        getattr(lib, name).restype = fp
        getattr(lib, name).argtypes = [C.c_void_p]
    lib.packer_model.restype = ip
    lib.packer_model.argtypes = [C.c_void_p]
    lib.packer_set.argtypes = [C.c_void_p, i64, fp, fp, fp, i32, i32]
    lib.packer_swap_remove.argtypes = [C.c_void_p, i64, i64]
    lib.packer_dirty_count.restype = i64
    lib.packer_dirty_count.argtypes = [C.c_void_p]
    lib.packer_pack.restype = i64
    lib.packer_pack.argtypes = [C.c_void_p, i64, ip, fp, fp, fp, ip]
    lib.packer_clear_dirty.argtypes = [C.c_void_p]

    lib.morton3d.argtypes = [fp, i64, fp, fp, up]
    _lib = lib
    AVAILABLE = True
    return lib


_try_load()


def _as_f32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


class NativeArena:
    """Fragmentable offset allocator (reference FragmentableBuffer parity)."""

    def __init__(self, capacity: int, alignment: int = 1):
        lib = _try_load()
        if lib is None:
            raise RuntimeError("libscenecore.so not built (make -C native)")
        self._lib = lib
        self._h = lib.arena_create(capacity, alignment)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.arena_destroy(self._h)
            self._h = None

    def alloc(self, size: int) -> Optional[int]:
        off = self._lib.arena_alloc(self._h, size)
        return None if off == 2**64 - 1 else off

    def free(self, offset: int) -> bool:
        return self._lib.arena_free(self._h, offset) == 0

    @property
    def stack_top(self) -> int:
        return self._lib.arena_stack_top(self._h)

    @property
    def live_bytes(self) -> int:
        return self._lib.arena_live_bytes(self._h)

    @property
    def live_count(self) -> int:
        return self._lib.arena_live_count(self._h)

    def compact(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
        """Returns (old_offsets, new_offsets, sizes, new_top)."""
        cap = int(self.live_count)
        old = np.zeros(cap + 1, np.uint64)
        new = np.zeros(cap + 1, np.uint64)
        sizes = np.zeros(cap + 1, np.uint64)
        top = np.zeros(1, np.uint64)
        up = C.POINTER(C.c_uint64)
        n = self._lib.arena_compact(
            self._h,
            old.ctypes.data_as(up), new.ctypes.data_as(up),
            sizes.ctypes.data_as(up), cap + 1, top.ctypes.data_as(up),
        )
        assert n >= 0
        return old[:n], new[:n], sizes[:n], int(top[0])


class NativeDeltaPacker:
    """Instance SoA store + dirty-row staging packer in C++."""

    def __init__(self, capacity: int):
        lib = _try_load()
        if lib is None:
            raise RuntimeError("libscenecore.so not built (make -C native)")
        self._lib = lib
        self._h = lib.packer_create(capacity)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.packer_destroy(self._h)
            self._h = None

    @property
    def capacity(self) -> int:
        return self._lib.packer_capacity(self._h)

    def grow(self, new_capacity: int) -> None:
        self._lib.packer_grow(self._h, new_capacity)

    def views(self):
        """Zero-copy numpy views of the SoA (valid until grow)."""
        cap = self.capacity
        lib = self._lib

        def view(ptr, n, dt):
            return np.ctypeslib.as_array(ptr, shape=(n,))

        pos = view(lib.packer_pos(self._h), cap * 3, np.float32).reshape(cap, 3)
        scale = view(lib.packer_scale(self._h), cap * 3, np.float32).reshape(cap, 3)
        quat = view(lib.packer_quat(self._h), cap * 4, np.float32).reshape(cap, 4)
        model = view(lib.packer_model(self._h), cap, np.int32)
        return pos, scale, quat, model

    def set(self, i: int, pos=None, scale=None, quat=None, model_id=None):
        fp = C.POINTER(C.c_float)
        def p(a):
            return None if a is None else _as_f32(a).ctypes.data_as(fp)
        self._lib.packer_set(
            self._h, i, p(pos), p(scale), p(quat),
            -1 if model_id is None else int(model_id),
            0 if model_id is None else 1,
        )

    def swap_remove(self, i: int, last: int) -> None:
        self._lib.packer_swap_remove(self._h, i, last)

    @property
    def dirty_count(self) -> int:
        return self._lib.packer_dirty_count(self._h)

    def pack(self, max_rows: int):
        """Pack dirty rows -> (idx, pos, scale, quat, model) dense arrays."""
        idx = np.zeros(max_rows, np.int32)
        pos = np.zeros((max_rows, 3), np.float32)
        scale = np.ones((max_rows, 3), np.float32)
        quat = np.zeros((max_rows, 4), np.float32)
        model = np.full(max_rows, -1, np.int32)
        fp = C.POINTER(C.c_float)
        ip = C.POINTER(C.c_int32)
        n = self._lib.packer_pack(
            self._h, max_rows,
            idx.ctypes.data_as(ip), pos.ctypes.data_as(fp),
            scale.ctypes.data_as(fp), quat.ctypes.data_as(fp),
            model.ctypes.data_as(ip),
        )
        return n, idx, pos, scale, quat, model


def morton3d(points: np.ndarray, lo, hi) -> np.ndarray:
    """63-bit morton codes via the native library (numpy fallback upstream)."""
    lib = _try_load()
    pts = _as_f32(points).reshape(-1, 3)
    out = np.zeros(pts.shape[0], np.uint64)
    fp = C.POINTER(C.c_float)
    up = C.POINTER(C.c_uint64)
    lib.morton3d(
        pts.ctypes.data_as(fp), pts.shape[0],
        _as_f32(lo).ctypes.data_as(fp), _as_f32(hi).ctypes.data_as(fp),
        out.ctypes.data_as(up),
    )
    return out
