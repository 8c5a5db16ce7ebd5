"""ctypes bindings to the aztocore native host runtime (csrc/aztocore.cpp).

Compiled on first import with the system g++ (no pip packages needed);
falls back to pure-Python implementations when no compiler is available
(`HAVE_NATIVE` is False then — callers must check).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "csrc", "aztocore.cpp")
_SO = os.path.join(_HERE, "_aztocore.so")

HAVE_NATIVE = False
_lib = None


def _build() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return False
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", _SO, src],
                check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError) as e:
        print(f"aztocore native build failed ({e}); using Python fallback",
              file=sys.stderr)
        return False


def _load():
    global _lib, HAVE_NATIVE
    if not _build():
        return
    lib = ctypes.CDLL(_SO)
    lib.azto_open.restype = ctypes.c_void_p
    lib.azto_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.azto_write_str.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.azto_write_row_f.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int]
    lib.azto_write_traj_row.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
    lib.azto_write_xyz_rows.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
    lib.azto_close.argtypes = [ctypes.c_void_p]
    lib.azto_parse_xyz_rows.restype = ctypes.c_int64
    lib.azto_parse_xyz_rows.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    HAVE_NATIVE = True


_load()


class NativeRowFile:
    """Buffered tab-separated row writer backed by aztocore."""

    def __init__(self, path: str, mode: str = "w"):
        if not HAVE_NATIVE:
            raise RuntimeError("aztocore not available")
        self._h = _lib.azto_open(path.encode(), mode.encode())
        if not self._h:
            raise OSError(f"cannot open {path}")

    def write_str(self, s: str):
        _lib.azto_write_str(self._h, s.encode())

    def write_row(self, time: float, step: int, vals, newline_first=False):
        v = np.ascontiguousarray(vals, dtype=np.float64)
        _lib.azto_write_row_f(
            self._h, time, step,
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), v.size,
            1 if newline_first else 0)

    def write_traj_row(self, time: float, step: int, pos, types, ptypes):
        p = np.ascontiguousarray(pos, dtype=np.float32)
        t = np.ascontiguousarray(types, dtype=np.int32)
        pt = np.ascontiguousarray(ptypes, dtype=np.int32)
        _lib.azto_write_traj_row(
            self._h, time, step,
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            pt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(t))

    def write_xyz_rows(self, names, pos):
        n = len(names)
        packed = np.zeros((n, 8), dtype="S1")
        for i, nm in enumerate(names):
            b = nm.encode()[:7]
            packed[i, :len(b)] = np.frombuffer(b, dtype="S1")
        p = np.ascontiguousarray(pos, dtype=np.float64)
        _lib.azto_write_xyz_rows(
            self._h, packed.tobytes(),
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n)

    def close(self):
        if self._h:
            _lib.azto_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def parse_xyz_rows(text: str, n: int):
    """Parse n 'name x y z [...]' lines; returns (names list, pos (n,3))."""
    if not HAVE_NATIVE:
        raise RuntimeError("aztocore not available")
    raw = text.encode()
    names8 = ctypes.create_string_buffer(8 * n)
    pos = np.empty((n, 3), np.float64)
    got = _lib.azto_parse_xyz_rows(
        raw, len(raw), n, names8,
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if got != n:
        raise ValueError(f"parsed {got} of {n} atom lines")
    nb = names8.raw
    names = [nb[i * 8:(i + 1) * 8].split(b"\0", 1)[0].decode()
             for i in range(n)]
    return names, pos
