"""ctypes bindings for the native (C++) data-runtime: record store, threaded
batch gather, shuffler, background prefetcher (native/*.cpp).

The native library auto-builds on first use (``make -C native``); every
entry point has a pure-numpy fallback so the framework works without a
toolchain. The record store replaces the reference's LMDB cache
(legacy/camvid_lmdb.py); the loader replaces DataLoader worker processes
(train.py:80-84) for the host-fed (HostLoader) path."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcamvid_native.so")

_lib = None
_build_failed = False


def _load(build: bool = True):
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            _build_failed = True  # don't fork a failing make per call
            return None
    if not os.path.exists(_LIB_PATH):
        _build_failed = True
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rs_write.restype = ctypes.c_int
    lib.rs_open.restype = ctypes.c_void_p
    lib.rs_count.restype = ctypes.c_uint64
    lib.rs_count.argtypes = [ctypes.c_void_p]
    lib.rs_length.restype = ctypes.c_uint64
    lib.rs_length.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.rs_read.restype = ctypes.c_uint64
    lib.rs_read.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                            ctypes.POINTER(ctypes.c_uint8)]
    lib.rs_close.argtypes = [ctypes.c_void_p]
    lib.pf_start.restype = ctypes.c_void_p
    lib.pf_next.restype = ctypes.c_uint64
    lib.pf_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.pf_stop.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


# ------------------------------------------------------------ record store

class RecordStore:
    """Single-file mmap record store (LMDB-cache equivalent)."""

    @staticmethod
    def write(path: str, records: List[bytes]):
        lib = _load()
        if lib is None:  # numpy fallback: same file format
            import struct
            with open(path, "wb") as f:
                f.write(b"CVRS0001")
                f.write(struct.pack("<Q", len(records)))
                off = 16 + 16 * len(records)
                for r in records:
                    f.write(struct.pack("<QQ", off, len(r)))
                    off += len(r)
                for r in records:
                    f.write(r)
            return
        n = len(records)
        bufs = (ctypes.POINTER(ctypes.c_uint8) * n)()
        lens = (ctypes.c_uint64 * n)()
        keep = []
        for i, r in enumerate(records):
            arr = np.frombuffer(r, np.uint8)
            keep.append(arr)
            bufs[i] = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            lens[i] = len(r)
        rc = lib.rs_write(path.encode(), bufs, lens, n)
        if rc != 0:
            raise IOError(f"rs_write failed: {rc}")

    def __init__(self, path: str):
        self._lib = _load()
        self._path = path
        if self._lib is not None:
            self._h = self._lib.rs_open(path.encode())
            if not self._h:
                raise IOError(f"cannot open record store {path}")
            self._n = int(self._lib.rs_count(self._h))
        else:  # numpy fallback reader
            import struct
            self._mm = np.memmap(path, np.uint8, "r")
            assert bytes(self._mm[:8]) == b"CVRS0001"
            self._n = struct.unpack("<Q", bytes(self._mm[8:16]))[0]
            idx = np.frombuffer(bytes(self._mm[16:16 + 16 * self._n]),
                                np.uint64).reshape(self._n, 2)
            self._idx = idx
            self._h = None

    def __len__(self):
        return self._n

    def __getitem__(self, i: int) -> bytes:
        if i < 0:
            i += self._n
        if not 0 <= i < self._n:
            raise IndexError(i)
        if self._h is not None:
            ln = int(self._lib.rs_length(self._h, i))
            out = np.empty(ln, np.uint8)
            got = self._lib.rs_read(
                self._h, i, out.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_uint8)))
            assert got == ln
            return out.tobytes()
        off, ln = (int(v) for v in self._idx[i])
        return bytes(self._mm[off: off + ln])

    def close(self):
        if self._h is not None:
            self._lib.rs_close(self._h)
            self._h = None


# ------------------------------------------------------------------ gather

def gather_batch(data: np.ndarray, indices: np.ndarray,
                 out: Optional[np.ndarray] = None,
                 nthreads: int = 0) -> np.ndarray:
    """Threaded out[i] = data[indices[i]] over the leading axis."""
    data = np.ascontiguousarray(data)
    if out is None:
        out = np.empty((len(indices),) + data.shape[1:], data.dtype)
    lib = _load()
    if lib is None:
        np.take(data, indices, axis=0, out=out)
        return out
    itemsize = int(np.prod(data.shape[1:])) * data.dtype.itemsize
    idx = np.ascontiguousarray(indices, np.uint64)
    lib.ld_gather(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_uint64(itemsize),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_uint64(len(indices)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(nthreads))
    return out


def permutation(n: int, seed: int) -> np.ndarray:
    """Deterministic native Fisher-Yates shuffle of [0, n)."""
    lib = _load()
    if lib is None:
        return np.random.default_rng(seed).permutation(n).astype(np.uint64)
    out = np.empty(n, np.uint64)
    lib.ld_permutation(ctypes.c_uint64(n), ctypes.c_uint64(seed),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out


class NativePrefetcher:
    """Background-thread batch prefetcher over a packed dataset array."""

    def __init__(self, data: np.ndarray, batch: int, seed: int = 0,
                 shuffle: bool = True):
        self._lib = _load()
        self._data = np.ascontiguousarray(data)
        self._batch = batch
        self._item_shape = data.shape[1:]
        self._itemsize = int(np.prod(data.shape[1:])) * data.dtype.itemsize
        self._dtype = data.dtype
        if self._lib is None:
            self._perm = permutation(len(data), seed) if shuffle \
                else np.arange(len(data), dtype=np.uint64)
            self._pos = 0
            self._h = None
        else:
            self._h = self._lib.pf_start(
                self._data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.c_uint64(len(data)), ctypes.c_uint64(self._itemsize),
                ctypes.c_uint64(batch), ctypes.c_uint64(seed),
                ctypes.c_int(1 if shuffle else 0))

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._h is None:
            if self._pos >= len(self._data):
                raise StopIteration
            idx = self._perm[self._pos: self._pos + self._batch]
            self._pos += len(idx)
            return np.take(self._data, idx.astype(np.int64), axis=0)
        out = np.empty((self._batch,) + self._item_shape, self._dtype)
        n = int(self._lib.pf_next(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))))
        if n == 0:
            raise StopIteration
        return out[:n]

    def close(self):
        if self._h is not None:
            self._lib.pf_stop(self._h)
            self._h = None
