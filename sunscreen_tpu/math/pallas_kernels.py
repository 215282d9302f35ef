"""Pallas TPU kernels for modular arithmetic (proof of concept).

TPUs operate on 32-bit lanes; XLA emulates our uint64 ops with 32-bit
pairs already, but a Pallas kernel controls the whole pipeline in VMEM
— the round-2 plan is to fuse entire NTT stages here (see CLAUDE.md).
This module establishes the u32-limb arithmetic building blocks and a
pointwise Barrett multiply kernel, bit-exact against `math.modular`
(tested in interpret mode on CPU and compiled on TPU).

Layout: a u64 array [..., N] is carried as two u32 arrays (hi, lo).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
_M16 = 0xFFFF  # python int: pallas kernels must not capture jax constants


def _mul32_wide(a, b):
    """Exact 32x32 -> (hi, lo) u32 via 16-bit halves."""
    a0 = a & _M16
    a1 = a >> 16
    b0 = b & _M16
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> 16) + (p01 & _M16) + (p10 & _M16)
    lo = (p00 & _M16) | (mid << 16)
    hi = p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    return hi, lo


def _add32c(a, b):
    s = a + b
    return s, (s < a).astype(U32)


def _add64(ah, al, bh, bl):
    """(ah:al) + (bh:bl) mod 2^64 as u32 pairs."""
    lo, c = _add32c(al, bl)
    return ah + bh + c, lo


def _mul64_wide(ah, al, bh, bl):
    """Exact 64x64 -> 128 as four u32 words [w3, w2, w1, w0]."""
    # partial products of the four 32-bit limbs
    h00, l00 = _mul32_wide(al, bl)            # 2^0
    h01, l01 = _mul32_wide(al, bh)            # 2^32
    h10, l10 = _mul32_wide(ah, bl)            # 2^32
    h11, l11 = _mul32_wide(ah, bh)            # 2^64
    w0 = l00
    w1, c1 = _add32c(h00, l01)
    w1, c2 = _add32c(w1, l10)
    w2, c3 = _add32c(h01, h10)
    w2, c4 = _add32c(w2, l11)
    w2, c5 = _add32c(w2, c1 + c2)
    w3 = h11 + c3 + c4 + c5
    return w3, w2, w1, w0


def _mul64_lo(ah, al, bh, bl):
    """Low 64 bits of the product."""
    _, l00h = None, None  # readability
    h00, l00 = _mul32_wide(al, bl)
    _, l01 = _mul32_wide(al, bh)
    _, l10 = _mul32_wide(ah, bl)
    w1 = h00 + l01 + l10
    return w1, l00


def mul_mod_kernel(a_hi, a_lo, b_hi, b_lo, q_hi, q_lo, rh_hi, rh_lo,
                   rl_hi, rl_lo):
    """(a*b) mod q on u32 pairs (Barrett, mirrors
    modular.barrett_reduce_128). All scalars are python ints baked in.
    """
    # z = a * b (128-bit): words z3..z0
    z3, z2, z1, z0 = _mul64_wide(a_hi, a_lo, b_hi, b_lo)
    hi_h, hi_l = z3, z2
    lo_h, lo_l = z1, z0
    # carry = HIGH(lo * r_lo)
    c3, c2, _, _ = _mul64_wide(lo_h, lo_l, rl_hi, rl_lo)
    # (h2:l2)*2^64 ... tmp1 = LOW(lo*r_hi) + carry
    t3, t2, t1, t0 = _mul64_wide(lo_h, lo_l, rh_hi, rh_lo)
    tmp1_h, tmp1_l = _add64(t1, t0, c3, c2)
    carry_in = ((tmp1_h < t1) | ((tmp1_h == t1)
                                 & (tmp1_l < t0))).astype(U32)
    tmp3_h, tmp3_l = _add64(t3, t2, 0, carry_in)
    # round 2: (h3:l3) = hi * r_lo
    s3, s2, s1, s0 = _mul64_wide(hi_h, hi_l, rl_hi, rl_lo)
    tmp1b_h, tmp1b_l = _add64(tmp1_h, tmp1_l, s1, s0)
    c2_in = ((tmp1b_h < s1) | ((tmp1b_h == s1)
                               & (tmp1b_l < s0))).astype(U32)
    carry2_h, carry2_l = _add64(s3, s2, 0, c2_in)
    # qhat = hi*r_hi + tmp3 + carry2 (mod 2^64)
    p_h, p_l = _mul64_lo(hi_h, hi_l, rh_hi, rh_lo)
    qh_h, qh_l = _add64(p_h, p_l, tmp3_h, tmp3_l)
    qh_h, qh_l = _add64(qh_h, qh_l, carry2_h, carry2_l)
    # r = lo - qhat * q (mod 2^64)
    qq_h, qq_l = _mul64_lo(qh_h, qh_l, q_hi, q_lo)
    # 64-bit subtract
    borrow = ((lo_l < qq_l)).astype(U32)
    r_l = lo_l - qq_l
    r_h = lo_h - qq_h - borrow
    # conditional subtract q
    ge = (r_h > q_hi) | ((r_h == q_hi) & (r_l >= q_lo))
    b2 = (r_l < q_lo).astype(U32)
    r_l2 = r_l - q_lo
    r_h2 = r_h - q_hi - b2
    out_h = jnp.where(ge, r_h2, r_h)
    out_l = jnp.where(ge, r_l2, r_l)
    return out_h, out_l


def make_pointwise_mul_mod(q: int, interpret: bool = False):
    """Returns fn(a_hi, a_lo, b_hi, b_lo) -> (hi, lo): (a*b) mod q via
    one Pallas kernel launch."""
    from sunscreen_tpu.math import modular as m
    r_hi, r_lo = m.barrett_ratio(q)
    # python ints bake in as literals (pallas kernels may not capture
    # traced constants)
    consts = dict(
        q_hi=q >> 32, q_lo=q & 0xFFFFFFFF,
        rh_hi=r_hi >> 32, rh_lo=r_hi & 0xFFFFFFFF,
        rl_hi=r_lo >> 32, rl_lo=r_lo & 0xFFFFFFFF)

    def kernel(a_hi_ref, a_lo_ref, b_hi_ref, b_lo_ref, o_hi_ref,
               o_lo_ref):
        oh, ol = mul_mod_kernel(
            a_hi_ref[:], a_lo_ref[:], b_hi_ref[:], b_lo_ref[:],
            **consts)
        o_hi_ref[:] = oh
        o_lo_ref[:] = ol

    @jax.jit
    def run(a_hi, a_lo, b_hi, b_lo):
        rows, cols = a_hi.shape
        # tile rows so each block (x ~10 u32 temporaries) fits VMEM
        tile_r = rows
        while tile_r * cols * 4 * 12 > 8 * 1024 * 1024 and tile_r % 2 == 0:
            tile_r //= 2
        if rows % tile_r:
            tile_r = rows
        spec = pl.BlockSpec((tile_r, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(rows // tile_r,),
            out_shape=(jax.ShapeDtypeStruct(a_hi.shape, jnp.uint32),
                       jax.ShapeDtypeStruct(a_hi.shape, jnp.uint32)),
            in_specs=[spec] * 4,
            out_specs=(spec, spec),
            interpret=interpret,
        )(a_hi, a_lo, b_hi, b_lo)

    return run


def split_u64(x):
    """u64 [..., N] -> (hi, lo) u32 arrays."""
    x = jnp.asarray(x, dtype=jnp.uint64)
    return ((x >> jnp.uint64(32)).astype(U32),
            (x & jnp.uint64(0xFFFFFFFF)).astype(U32))


def join_u64(hi, lo):
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) \
        | lo.astype(jnp.uint64)
