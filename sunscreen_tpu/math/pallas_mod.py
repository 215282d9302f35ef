"""Pallas TPU kernels for exact 64-bit modular arithmetic on u32 planes.

Production kernels for the hot elementwise paths (north star: the RNS
cost core "as JAX/Pallas kernels", replacing SEAL's native engine —
`seal_fhe/build.rs:31-90`). Why Pallas here: measured on the v5e, a
single fused XLA u64 op streams at HBM roofline (~0.02 ms / 786K
elements) but COMPOSITIONS do not fuse — `mul_mod_shoup` costs 1.0 ms
and Barrett-128 0.67 ms standalone (~30 unfused passes). These kernels
run the whole chain in VMEM on u32 planes (TPU has no native 64-bit
lanes; XLA's u64 emulation is exactly such pairs, minus the fusion).

Data layout: "planar" u64 = uint32 array [..., 2, N] with [..., 0, :]
the low and [..., 1, :] the high words (`to_planar`/`from_planar`, one
XLA relayout each). Chains of kernels should stay planar.

Moduli are static python ints baked into each kernel (one compiled
kernel per modulus set — same plan-cache pattern as the NTT tables).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
I32 = jnp.int32


def split64(x):
    """u64 [..., N] -> (lo, hi) u32 planes (XLA strided slices of the
    bitcast pair view — one relayout pass each; Mosaic cannot lower
    in-kernel lane-strided deinterleaves)."""
    v = jax.lax.bitcast_convert_type(x, U32)          # [..., N, 2]
    return v[..., 0], v[..., 1]


def join64(lo, hi):
    """(lo, hi) u32 planes -> u64 [..., N]."""
    v = jnp.stack((lo, hi), axis=-1)
    return jax.lax.bitcast_convert_type(v, jnp.uint64)


# ---------------------------------------------------------------------------
# in-kernel u32-pair arithmetic (all values traced u32; constants python)
# ---------------------------------------------------------------------------


def _mul32(a, b):
    """u32 x u32 -> (hi, lo) exact via 16-bit halves."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> 16) + (p01 & 0xFFFF) + (p10 & 0xFFFF)
    lo = (p00 & 0xFFFF) | ((mid & 0xFFFF) << 16)
    hi = p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    return hi, lo


def _one(x):
    return jnp.ones_like(x)


def _zero(x):
    return jnp.zeros_like(x)


def _addc(a, b):
    """u32 + u32 -> (sum, carry)."""
    s = a + b
    return s, jnp.where(s < a, _one(s), _zero(s))


def _mul64_128(alo, ahi, blo, bhi):
    """64x64 -> 128 as four u32 words (w0 lowest)."""
    h00, l00 = _mul32(alo, blo)
    h01, l01 = _mul32(alo, bhi)
    h10, l10 = _mul32(ahi, blo)
    h11, l11 = _mul32(ahi, bhi)
    w0 = l00
    s1, c1a = _addc(h00, l01)
    w1, c1b = _addc(s1, l10)
    s2, c2a = _addc(h01, h10)
    s2b, c2b = _addc(s2, l11)
    w2, c2c = _addc(s2b, c1a + c1b)
    w3 = h11 + c2a + c2b + c2c
    return w0, w1, w2, w3


def _mul64_lo(alo, ahi, blo, bhi):
    """low 64 bits of the product."""
    h00, l00 = _mul32(alo, blo)
    _, l01 = _mul32(alo, bhi)
    _, l10 = _mul32(ahi, blo)
    return l00, h00 + l01 + l10


def _sub64(alo, ahi, blo, bhi):
    lo = alo - blo
    borrow = jnp.where(alo < blo, _one(alo), _zero(alo))
    return lo, ahi - bhi - borrow


def _add64(alo, ahi, blo, bhi):
    lo, c = _addc(alo, blo)
    return lo, ahi + bhi + c


def _geq64(alo, ahi, blo, bhi):
    return (ahi > bhi) | ((ahi == bhi) & (alo >= blo))


def _cond_sub_q(rlo, rhi, ql, qh):
    ge = _geq64(rlo, rhi, ql, qh)
    slo, shi = _sub64(rlo, rhi, ql, qh)
    return jnp.where(ge, slo, rlo), jnp.where(ge, shi, rhi)


def _shoup_core(xlo, xhi, wlo, whi, slo, shi, ql, qh):
    """reduce_2q(mul_mod_shoup(x, w)) for x in [0, 2q), w < q."""
    _, _, h2, h3 = _mul64_128(xlo, xhi, slo, shi)      # hi64(x*wsh)
    m0, m1 = _mul64_lo(xlo, xhi, wlo, whi)             # lo64(w*x)
    n0, n1 = _mul64_lo(h2, h3, ql, qh)                 # lo64(hi*q)
    rlo, rhi = _sub64(m0, m1, n0, n1)                  # in [0, 2q)
    return _cond_sub_q(rlo, rhi, ql, qh)


def _barrett128_core(lo0, lo1, hi0, hi1, ql, qh, rl0, rl1, rh0, rh1):
    """(hi*2^64 + lo) mod q, value < q*2^64 (mirrors
    `modular.barrett_reduce_128` word for word)."""
    # carry = HIGH(lo * r_lo)
    _, _, c0, c1 = _mul64_128(lo0, lo1, rl0, rl1)
    # tmp1 = l2 + carry (64-bit, carry-out); l2 = LOW(lo * r_hi)
    l2_0, l2_1, h2_0, h2_1 = _mul64_128(lo0, lo1, rh0, rh1)
    t1_0, cA = _addc(l2_0, c0)
    s_hi, cB1 = _addc(l2_1, c1)
    t1_1, cB2 = _addc(s_hi, cA)
    # tmp3 = h2 + carry-out(tmp1)
    t3_0, t3_1 = _add64(h2_0, h2_1, cB1 + cB2, _zero(cB1))
    # tmp1b = tmp1 + l3 (carry-out c2); l3 = LOW(hi * r_lo)
    l3_0, l3_1, h3_0, h3_1 = _mul64_128(hi0, hi1, rl0, rl1)
    _, cC = _addc(t1_0, l3_0)
    u_hi, cD1 = _addc(t1_1, l3_1)
    _, cD2 = _addc(u_hi, cC)
    carry2_0, carry2_1 = _add64(h3_0, h3_1, cD1 + cD2, _zero(cD1))
    # qhat = hi * r_hi + tmp3 + carry2  (mod 2^64)
    q1_0, q1_1 = _mul64_lo(hi0, hi1, rh0, rh1)
    q2_0, q2_1 = _add64(q1_0, q1_1, t3_0, t3_1)
    qh_0, qh_1 = _add64(q2_0, q2_1, carry2_0, carry2_1)
    # r = lo - qhat * q
    p0, p1 = _mul64_lo(qh_0, qh_1, ql, qh)
    rlo, rhi = _sub64(lo0, lo1, p0, p1)
    return _cond_sub_q(rlo, rhi, ql, qh)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _imap2(i):
    """Explicit i32 index map (under jax x64 the auto maps return i64
    block indices, which Mosaic fails to legalize)."""
    return (jnp.asarray(i, jnp.int32), jnp.int32(0))


_INTERPRET = None


def _interpret() -> bool:
    """Pallas TPU kernels run compiled on TPU-like backends,
    interpreted elsewhere (CPU tests)."""
    global _INTERPRET
    if _INTERPRET is None:
        _INTERPRET = jax.default_backend() == "cpu"
    return _INTERPRET


def _row_block(n_rows: int, bytes_per_row: int, n_arrays: int,
               budget: int = 8 << 20) -> int:
    per_row = bytes_per_row * n_arrays
    r = max(1, budget // max(per_row, 1))
    while n_rows % r:
        r -= 1
    return r


@functools.partial(jax.jit, static_argnames=("q",))
def _shoup_call(xl, xh, wl, wh, sl, sh, q: int):
    ql, qh = q & 0xFFFFFFFF, q >> 32

    def kernel(xl_r, xh_r, wl_r, wh_r, sl_r, sh_r, ol_r, oh_r):
        rlo, rhi = _shoup_core(xl_r[:], xh_r[:], wl_r[:], wh_r[:],
                               sl_r[:], sh_r[:], U32(ql), U32(qh))
        ol_r[:] = rlo
        oh_r[:] = rhi

    rows, n = xl.shape
    r = _row_block(rows, 4 * n, 8)
    spec = pl.BlockSpec((r, n), _imap2, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(rows // r,),
        out_shape=(jax.ShapeDtypeStruct(xl.shape, U32),
                   jax.ShapeDtypeStruct(xl.shape, U32)),
        in_specs=[spec] * 6, out_specs=(spec, spec),
        interpret=_interpret(),
    )(xl, xh, wl, wh, sl, sh)


@functools.partial(jax.jit, static_argnames=("q",))
def _mul_mod_call(al, ah, bl, bh, q: int):
    ql, qh = q & 0xFFFFFFFF, q >> 32
    ratio = (1 << 128) // q
    rl, rh = ratio & ((1 << 64) - 1), ratio >> 64
    rl0, rl1 = rl & 0xFFFFFFFF, rl >> 32
    rh0, rh1 = rh & 0xFFFFFFFF, rh >> 32

    def kernel(al_r, ah_r, bl_r, bh_r, ol_r, oh_r):
        w0, w1, w2, w3 = _mul64_128(al_r[:], ah_r[:], bl_r[:], bh_r[:])
        rlo, rhi = _barrett128_core(
            w0, w1, w2, w3, U32(ql), U32(qh),
            U32(rl0), U32(rl1), U32(rh0), U32(rh1))
        ol_r[:] = rlo
        oh_r[:] = rhi

    rows, n = al.shape
    r = _row_block(rows, 4 * n, 6)
    spec = pl.BlockSpec((r, n), _imap2, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(rows // r,),
        out_shape=(jax.ShapeDtypeStruct(al.shape, U32),
                   jax.ShapeDtypeStruct(al.shape, U32)),
        in_specs=[spec] * 4, out_specs=(spec, spec),
        interpret=_interpret(),
    )(al, ah, bl, bh)


def _rows(x):
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    return rows, lead


def shoup_mul_mod(x, w, w_sh, q: int):
    """u64 [..., N] x broadcastable w tables -> u64. Equivalent to
    `reduce_2q(mul_mod_shoup(x, w, w_sh, q))`, one fused VMEM pass."""
    w_b = jnp.broadcast_to(w, x.shape)
    s_b = jnp.broadcast_to(w_sh, x.shape)
    rows, lead = _rows(x)
    n = x.shape[-1]
    xl, xh = split64(x.reshape(rows, n))
    wl, wh = split64(w_b.reshape(rows, n))
    sl, sh = split64(s_b.reshape(rows, n))
    ol, oh = _shoup_call(xl, xh, wl, wh, sl, sh, q)
    return join64(ol, oh).reshape(lead + (n,))


def mul_mod(a, b, q: int):
    """u64 [..., N] exact modular product, one fused VMEM pass."""
    b_b = jnp.broadcast_to(b, a.shape)
    rows, lead = _rows(a)
    n = a.shape[-1]
    al, ah = split64(a.reshape(rows, n))
    bl, bh = split64(b_b.reshape(rows, n))
    ol, oh = _mul_mod_call(al, ah, bl, bh, q)
    return join64(ol, oh).reshape(lead + (n,))
