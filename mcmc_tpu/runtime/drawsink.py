"""ctypes binding for the native draw sink (runtime/drawsink.cpp).

Builds the shared library on first use with the toolchain in the image
(g++ -O2 -fPIC; no pybind11 available). Falls back to a pure-Python
implementation with identical file format if no compiler is present, so the
package never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import pathlib
import struct
import subprocess
import threading

import numpy as np

_HERE = pathlib.Path(__file__).resolve().parent
_SRC = _HERE / "drawsink.cpp"
_LIB = _HERE / "_drawsink.so"

_MAGIC = b"MCMCSINK"
_HEADER_FMT = "<8sIIII4QQ"  # magic, version, dtype, ndim, reserved, dims[4], n_rows
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)
_DTYPES = {0: np.float32, 1: np.float64}
_DTYPE_CODES = {np.dtype(np.float32): 0, np.dtype(np.float64): 1}

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load_lib():
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not _LIB.exists() or _SRC.stat().st_mtime > _LIB.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", "-pthread",
                     str(_SRC), "-o", str(_LIB)],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(str(_LIB))
            lib.drawsink_open.restype = ctypes.c_void_p
            lib.drawsink_open.argtypes = [ctypes.c_char_p, ctypes.c_uint32,
                                          ctypes.c_uint32,
                                          ctypes.POINTER(ctypes.c_uint64)]
            lib.drawsink_append.restype = ctypes.c_int
            lib.drawsink_append.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                            ctypes.c_uint64, ctypes.c_uint64]
            lib.drawsink_flush.argtypes = [ctypes.c_void_p]
            lib.drawsink_rows.restype = ctypes.c_uint64
            lib.drawsink_rows.argtypes = [ctypes.c_void_p]
            lib.drawsink_close.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


class DrawSink:
    """Append-only draw storage. ``row_shape`` is the trailing shape of one
    draw (e.g. ``(n_chains, n_vals)``); appended arrays have shape
    ``(k, *row_shape)``. Native path double-buffers writes on a background
    thread so disk IO overlaps device compute."""

    def __init__(self, path, row_shape, dtype=np.float32, force_python=False):
        self.path = str(path)
        self.row_shape = tuple(int(d) for d in row_shape)
        if len(self.row_shape) > 4:
            raise ValueError("row_shape supports at most 4 dims")
        self.dtype = np.dtype(dtype)
        if self.dtype not in _DTYPE_CODES:
            raise ValueError(f"unsupported dtype {self.dtype}")
        self._code = _DTYPE_CODES[self.dtype]
        self._rows = 0
        self._handle = None
        self._file = None

        lib = None if force_python else _load_lib()
        if lib is not None:
            dims = (ctypes.c_uint64 * 4)(*(list(self.row_shape) + [0] * (4 - len(self.row_shape))))
            self._handle = lib.drawsink_open(
                self.path.encode(), self._code, len(self.row_shape), dims
            )
            self._lib = lib
        if self._handle is None:
            # pure-Python fallback, same on-disk format
            self._file = open(self.path, "wb")
            self._write_header(0)

    def _write_header(self, n_rows):
        dims = list(self.row_shape) + [0] * (4 - len(self.row_shape))
        self._file.write(struct.pack(
            _HEADER_FMT, _MAGIC, 1, self._code, len(self.row_shape), 0,
            *dims, n_rows,
        ))

    @property
    def native(self) -> bool:
        return self._handle is not None

    @property
    def rows(self) -> int:
        if self._handle is not None:
            return int(self._lib.drawsink_rows(self._handle))
        return self._rows

    def append(self, arr):
        arr = np.ascontiguousarray(arr, self.dtype)
        if arr.shape[1:] != self.row_shape:
            raise ValueError(f"expected trailing shape {self.row_shape}, "
                             f"got {arr.shape[1:]}")
        if self._handle is not None:
            rc = self._lib.drawsink_append(
                self._handle, arr.ctypes.data_as(ctypes.c_void_p),
                arr.shape[0], arr.nbytes,
            )
            if rc != 0:
                raise IOError("native drawsink append failed")
        else:
            self._file.write(arr.tobytes())
            self._rows += arr.shape[0]

    def flush(self):
        if self._handle is not None:
            self._lib.drawsink_flush(self._handle)
        else:
            self._file.flush()

    def close(self):
        if self._handle is not None:
            self._lib.drawsink_close(self._handle)
            self._handle = None
        elif self._file is not None:
            n = self._rows
            self._file.seek(0)
            self._write_header(n)
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_draws(path, mmap=True):
    """Read a sink file back as a numpy array of shape (n_rows, *row_shape).

    If the header's row count was never finalized (the writing process was
    killed before close()), the count is recovered from the file size — any
    torn trailing partial row is dropped."""
    import os
    with open(path, "rb") as f:
        raw = f.read(_HEADER_SIZE)
    magic, version, code, ndim, _res, d0, d1, d2, d3, n_rows = struct.unpack(
        _HEADER_FMT, raw
    )
    if magic != _MAGIC:
        raise ValueError(f"{path} is not a draw-sink file")
    dtype = _DTYPES[code]
    row_shape = tuple(int(d) for d in (d0, d1, d2, d3)[:ndim])
    row_bytes = int(np.prod(row_shape)) * np.dtype(dtype).itemsize
    data_bytes = os.path.getsize(path) - _HEADER_SIZE
    rows_on_disk = data_bytes // row_bytes if row_bytes else 0
    if n_rows == 0 and rows_on_disk > 0:
        n_rows = rows_on_disk          # crash recovery
    n_rows = min(n_rows, rows_on_disk)  # never trust header past the data
    shape = (n_rows,) + row_shape
    if mmap:
        return np.memmap(path, dtype=dtype, mode="r", offset=_HEADER_SIZE,
                         shape=shape)
    data = np.fromfile(path, dtype=dtype, offset=_HEADER_SIZE,
                       count=int(np.prod(shape)))
    return data.reshape(shape)
