"""ctypes loader for the native ristretto kernels (_native/ristretto.cpp).

Replaces the reference's GPU curve acceleration dispatch
(`sunscreen_math/src/lib.rs:44-90` selecting CPU vs CUDA/Metal/OpenCL
backends): compiled on demand with g++, with the pure-python
`zk.curve25519` as fallback and as the bit-exactness oracle.
"""

from __future__ import annotations

import ctypes
import hashlib
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
# Source-content hash recorded next to the built .so: a -march=native
# binary from one host must never be silently reused for different
# source (mtimes are useless after checkout — both files get
# checkout-time stamps), and the .so itself is gitignored so a foreign
# host always builds its own.
_SO_HASH = _SO + ".srchash"


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            want = _src_hash()
            have = None
            if os.path.exists(_SO) and os.path.exists(_SO_HASH):
                with open(_SO_HASH) as f:
                    have = f.read().strip()
            if have != want:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-funroll-loops",
                     "-pthread", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True, timeout=120)
                with open(_SO_HASH, "w") as f:
                    f.write(want)
            lib = ctypes.CDLL(_SO)
            for name in ("ristretto_msm", "ristretto_batch_scalarmul",
                         "ristretto_fold", "ristretto_scale_all",
                         "ristretto_from_uniform", "keccak_f1600",
                         "keccak_f1600_batch", "ristretto_ipp_prove",
                         "strobe_fork_challenges", "ristretto_ipp_s",
                         "sc_vec_fold", "sc_vec_mul"):
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


def msm_buf(scalars, points_buf, n: int):
    """MSM over a pre-marshalled 128B-per-point buffer (cached
    generator buffers skip the python Point marshalling)."""
    lib = get_lib()
    if lib is None:
        return None
    from sunscreen_tpu.zk.curve25519 import L
    if n == 0:
        return None
    sb = _scalars_to_buf(scalars, L)
    out = ctypes.create_string_buffer(128)
    lib.ristretto_msm(sb, bytes(points_buf), ctypes.c_long(n), out)
    return _buf_to_points(out.raw, 1)[0]


def batch_scalar_mul_buf(scalars, points_buf, n: int):
    """[s_i * P_i] over a pre-marshalled buffer, returning the RAW
    128B-per-point result buffer (callers feeding another native call
    skip two marshalling round-trips)."""
    lib = get_lib()
    if lib is None:
        return None
    from sunscreen_tpu.zk.curve25519 import L
    sb = _scalars_to_buf(scalars, L)
    out = ctypes.create_string_buffer(128 * n)
    lib.ristretto_batch_scalarmul(sb, bytes(points_buf),
                                  ctypes.c_long(n), out)
    return out.raw


def sc_vec_mul(a, b):
    """Elementwise a*b mod L; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from sunscreen_tpu.zk.curve25519 import L
    n = len(a)
    ab = _scalars_to_buf(a, L)
    bb = _scalars_to_buf(b, L)
    out = ctypes.create_string_buffer(32 * max(n, 1))
    lib.sc_vec_mul(ab, bb, ctypes.c_long(n), out)
    raw = out.raw
    return [int.from_bytes(raw[32 * i:32 * i + 32], "little")
            for i in range(n)]


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


# -- strobe bridging (native transcript continuation) -------------------------

def _strobe_io(strobe):
    """(state_buf, meta_buf) ctypes views of a python Strobe128; call
    `_strobe_writeback` after the native call."""
    state = ctypes.create_string_buffer(bytes(strobe.state), 200)
    meta = (ctypes.c_int32 * 3)(strobe.pos, strobe.pos_begin,
                                strobe.cur_flags)
    return state, meta


def _strobe_writeback(strobe, state, meta):
    strobe.state = bytearray(state.raw[:200])
    strobe.pos = int(meta[0])
    strobe.pos_begin = int(meta[1])
    strobe.cur_flags = int(meta[2])


def fork_challenges(strobe, label: bytes, count: int):
    """128-way forked batch challenge scalars
    (linear_relation._challenge_scalars) natively, mutating the python
    Strobe128 exactly as the python path would; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    state, meta = _strobe_io(strobe)
    out = ctypes.create_string_buffer(32 * max(count, 1))
    lib.strobe_fork_challenges(state, meta, label,
                               ctypes.c_long(len(label)),
                               ctypes.c_long(count), out)
    _strobe_writeback(strobe, state, meta)
    raw = out.raw
    return [int.from_bytes(raw[32 * i:32 * i + 32], "little")
            for i in range(count)]


def ipp_s_vector(cs, n: int):
    """s[i] = prod_{j: bit j of i} cs[lg-1-j] mod L (IPP verifier
    exponents); None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from sunscreen_tpu.zk.curve25519 import L
    lg = len(cs)
    csb = _scalars_to_buf(cs, L)
    out = ctypes.create_string_buffer(32 * n)
    lib.ristretto_ipp_s(csb, ctypes.c_long(lg), ctypes.c_long(n), out)
    raw = out.raw
    return [int.from_bytes(raw[32 * i:32 * i + 32], "little")
            for i in range(n)]


def ipp_prove(strobe, v1, v2, g_buf: bytes, h_buf: bytes, a_pt, u_pt,
              rho: int, rand_scalars, n: int, n_real: int | None = None,
              g_coeff=None):
    """Full ZK-IPP prover loop (inner_product.create after the a_pt
    draw) natively. `g_buf`/`h_buf` are 128-byte-per-point extended
    buffers (pass cached generator buffers to skip marshalling).
    `g_coeff` (optional, n scalars) folds per-point coefficients into
    the g bases virtually — the SDLP's g' = phi^-1 o g without the
    l-point materialization pass. Returns (t1_points, tm1_points, w,
    w_prime, z1, z2, tau) or None. Mutates `strobe` exactly as the
    python loop would."""
    lib = get_lib()
    if lib is None:
        return None
    from sunscreen_tpu.zk.curve25519 import L
    lg = n.bit_length() - 1
    assert 1 << lg == n
    state, meta = _strobe_io(strobe)
    v1b = _scalars_to_buf(v1, L)
    v2b = _scalars_to_buf(v2, L)
    ab = _points_to_buf([a_pt])
    ub = _points_to_buf([u_pt])
    rhob = (int(rho) % L).to_bytes(32, "little")
    randb = _scalars_to_buf(rand_scalars, L)
    assert len(rand_scalars) == 2 * lg + 4
    gcb = None
    if g_coeff is not None:
        assert len(g_coeff) == n
        gcb = _scalars_to_buf(g_coeff, L)
    t1 = ctypes.create_string_buffer(128 * max(lg, 1))
    tm1 = ctypes.create_string_buffer(128 * max(lg, 1))
    w = ctypes.create_string_buffer(128)
    wp = ctypes.create_string_buffer(128)
    z1 = ctypes.create_string_buffer(32)
    z2 = ctypes.create_string_buffer(32)
    tau = ctypes.create_string_buffer(32)
    lib.ristretto_ipp_prove(state, meta, v1b, v2b, g_buf, h_buf, ab, ub,
                            rhob, randb, ctypes.c_long(n),
                            ctypes.c_long(n_real if n_real is not None
                                          else n),
                            gcb, t1, tm1, w, wp, z1, z2, tau)
    _strobe_writeback(strobe, state, meta)
    return (_buf_to_points(t1.raw, lg), _buf_to_points(tm1.raw, lg),
            _buf_to_points(w.raw, 1)[0], _buf_to_points(wp.raw, 1)[0],
            int.from_bytes(z1.raw, "little"),
            int.from_bytes(z2.raw, "little"),
            int.from_bytes(tau.raw, "little"))
