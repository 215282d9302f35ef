"""ctypes loader for the native ristretto kernels (_native/ristretto.cpp).

Replaces the reference's GPU curve acceleration dispatch
(`sunscreen_math/src/lib.rs:44-90` selecting CPU vs CUDA/Metal/OpenCL
backends): compiled on demand with g++, with the pure-python
`zk.curve25519` as fallback and as the bit-exactness oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LIB = None
_TRIED = False
_LOCK = threading.Lock()

_SRC = os.path.join(os.path.dirname(__file__), "..", "_native",
                    "ristretto.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "_native",
                   "libristretto.so")


def get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            src_mtime = os.path.getmtime(_SRC)
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < src_mtime):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-funroll-loops",
                     "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            for name in ("ristretto_msm", "ristretto_batch_scalarmul",
                         "ristretto_fold", "ristretto_scale_all",
                         "ristretto_from_uniform", "keccak_f1600",
                         "keccak_f1600_batch"):
                getattr(lib, name).restype = None
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def _points_to_buf(points) -> bytes:
    out = bytearray()
    for p in points:
        out += p.x.to_bytes(32, "little")
        out += p.y.to_bytes(32, "little")
        out += p.z.to_bytes(32, "little")
        out += p.t.to_bytes(32, "little")
    return bytes(out)


def _scalars_to_buf(scalars, L) -> bytes:
    return b"".join((int(s) % L).to_bytes(32, "little") for s in scalars)


def _buf_to_points(buf, count):
    from sunscreen_tpu.zk.curve25519 import Point
    out = []
    for i in range(count):
        off = 128 * i
        out.append(Point(
            int.from_bytes(buf[off:off + 32], "little"),
            int.from_bytes(buf[off + 32:off + 64], "little"),
            int.from_bytes(buf[off + 64:off + 96], "little"),
            int.from_bytes(buf[off + 96:off + 128], "little")))
    return out


def msm(scalars, points):
    """Native Pippenger MSM; returns a Point or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from sunscreen_tpu.zk.curve25519 import L
    n = len(points)
    if n == 0:
        return None
    sb = _scalars_to_buf(scalars, L)
    pb = _points_to_buf(points)
    out = ctypes.create_string_buffer(128)
    lib.ristretto_msm(sb, pb, ctypes.c_long(n), out)
    return _buf_to_points(out.raw, 1)[0]


def from_uniform_batch(data: bytes, count: int):
    """[from_uniform_bytes(data[64i:64i+64])] — batched elligator maps
    (generator derivation hot loop); None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    assert len(data) == 64 * count
    out = ctypes.create_string_buffer(128 * count)
    lib.ristretto_from_uniform(data, ctypes.c_long(count), out)
    return _buf_to_points(out.raw, count)


def batch_scalar_mul(scalars, points):
    lib = get_lib()
    if lib is None:
        return None
    from sunscreen_tpu.zk.curve25519 import L
    n = len(points)
    sb = _scalars_to_buf(scalars, L)
    pb = _points_to_buf(points)
    out = ctypes.create_string_buffer(128 * n)
    lib.ristretto_batch_scalarmul(sb, pb, ctypes.c_long(n), out)
    return _buf_to_points(out.raw, n)


def fold(points_a, points_b, scalar):
    """[a_i + scalar * b_i]."""
    lib = get_lib()
    if lib is None:
        return None
    from sunscreen_tpu.zk.curve25519 import L
    n = len(points_a)
    sb = (int(scalar) % L).to_bytes(32, "little")
    out = ctypes.create_string_buffer(128 * n)
    lib.ristretto_fold(_points_to_buf(points_a), _points_to_buf(points_b),
                       sb, ctypes.c_long(n), out)
    return _buf_to_points(out.raw, n)
