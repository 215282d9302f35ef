"""Fused MXU+VPU negacyclic NTT for the u32 engine (moduli < 2^30).

Round-3 findings on the v5e (benchmarks/PERF_NOTES.md) that shape this
design:

- the chip's EFFECTIVE HBM bandwidth through this stack is ~120 GB/s
  (not the 819 GB/s spec) and every XLA op between kernels is a full
  HBM round trip, so the NTT must minimize PASSES, not arithmetic;
- in-kernel MXU dots run at ~45-65 TMAC/s once the ~0.9 ms tunnel
  dispatch floor is accounted for (the XLA-level dot_general path for
  the same shapes is pathological), so dot MACs are nearly free;
- Mosaic supports in-kernel 2D tile transposes (jnp.swapaxes), byte
  extraction via shift/mask, astype(int8), and lane-dim concatenation
  — but NOT bitcasts that change bitwidth.

So each four-step transform is exactly TWO Pallas kernels with NO XLA
ops between them: every kernel fuses (layout transpose) + (signed byte
extraction) + (MXU dot) + (2-word recombination + modular reduction +
optional twiddle) in one VMEM residency, and the k <-> row-major
reorders ride the block index maps for free. Reference replacement:
SEAL's Harvey NTT core (`seal_fhe/SEAL` engine consumed by every
Evaluator op — SURVEY.md §2.4).

v4 stage structure (N = n1 * 128, n2 = 128; domain = flat (j2, j1)):

  fwd S1: read [rows, k, n2, n1] block (i2, i1) -> in-kernel transpose
          -> rows (r, i1), contraction (byte a, i2), K = 4*n2 = 512
          -> dot m2 -> recombine -> psi mid-twiddle (i1, j2)
          -> in-kernel transpose -> write [k, rows, n2(j2), n1(i1)]
  fwd S2: read (j2, i1) rows (r, j2), contraction (a, i1), K = 4*n1
          -> dot m1 (columns padded to 128) -> recombine
          -> write [rows, k, n2(j2), n1(j1)]      == the NTT domain
  inv A:  read domain (j2, j1) rows (r, j2), contraction (a, j1)
          -> dot im1 -> recombine -> inverse twiddle (j2, i1)
          -> write [k, rows, n2(j2), n1(i1)]
  inv B:  read (j2, i1) -> transpose -> rows (r, i1), contraction
          (a, j2), K = 512 -> dot im2 (psi^-1/N folded) -> recombine
          -> transpose -> write [rows, k, n2(i2), n1(i1)]  == natural

ARITHMETIC: absorbed byte weights, i8-native. For every input byte
plane a the matrix (2^(8a) * M) mod q is precomputed and split into
BALANCED signed digits d_b in [-128, 127] (sum_b d_b 2^(8b) = value),
so the dot's output diagonals are 4 digit planes of a value < q and

    y = sum_b T_b 2^(8b)  <  2^50

assembles into a 2-word (l, m < 2^18) pair with three shifted adds.
The mid twiddle applies to the UNREDUCED pair via two Shoup multiplies
by precomputed t and (t*2^32 mod q); untwiddled stages fold m with one
Shoup by (2^32 mod q) plus a single Barrett on l.

SIGNED-DOT HAZARD (measured on the real chip, round 3): this Mosaic
toolchain lowers jnp.dot(u8, u8, preferred_element_type=i32) inside a
Pallas kernel as a SIGNED i8 x i8 MXU product — u8 operands are
silently reinterpreted (the XLA-level einsum is correct; the bug is
Pallas-only, and it made the v2 kernels wrong on hardware while the
CPU interpret tests passed). v4 is therefore i8-native by design:

- matrix entries are balanced signed digits (above);
- input bytes are extracted in-kernel as ((x >> 8a) & 0xFF) ^ 0x80,
  truncated to i8 — exactly X_a - 128;
- the hardware partial P_b = sum_j (X_j - 128) d_bj is corrected with
  a per-column bias 128*colsum(d_b) + 2^24, making
  U_b = sum_j X_j d_bj + 2^24 nonnegative (< 2^25);
- the constant K = 2^24 * 0x01010101 is subtracted during the modular
  reduction: twiddled stages add a third table (-t*K mod q), plain
  stages a per-limb constant (-K mod q).

Every |P_b| <= 512*128*128 = 2^23 fits i32; validated against
python-int oracles in tests/test_pmntt.py AND against the interpret
oracle on the real chip (tools/tpu_selfcheck.py — rerun it after ANY
kernel change; interpret-mode tests cannot catch device miscompiles).
"""

from __future__ import annotations

import functools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sunscreen_tpu.math import modular as m
from sunscreen_tpu.math import primes
from sunscreen_tpu.math.mntt import _vandermonde
from sunscreen_tpu.math.prns import _addc, _mul32, _reduce64

U32 = jnp.uint32
I32 = jnp.int32
LANES = 128
WB = 4          # u32 word bytes (input planes)
NP = 4          # output digit planes (matrix entries < q < 2^30)

_KBIAS = 1 << 24   # per-plane nonnegativity shift
_K = sum(_KBIAS << (8 * b) for b in range(NP))  # total assembled shift


# ---------------------------------------------------------------------------
# in-kernel u32 primitives (traced)
# ---------------------------------------------------------------------------


def _mulhi32(a, b):
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    mid = (p00 >> 16) + (p01 & 0xFFFF) + (p10 & 0xFFFF)
    return a1 * b1 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)


def _shoup2q(x, w, wsh, q):
    """(x * w) mod q in [0, 2q): valid for ANY x < 2^32, w < q < 2^30
    (Harvey bound: qhat >= x*w/q - 2)."""
    hi = _mulhi32(x, wsh)
    return w * x - hi * q


def _reduce32(x, q, mu, s1):
    """x mod q for u32 x (barrett32_consts convention)."""
    qhat = _mulhi32(x >> s1, mu)
    r = x - qhat * q
    q2 = q + q
    r = jnp.where(r >= q2, r - q2, r)
    return jnp.where(r >= q, r - q, r)


def _norm2q(r, q):
    return jnp.where(r >= q, r - q, r)


def _assemble_lm(p):
    """u32 digit-plane partials U_b = p[b] (b = 0..3, each < 2^25) ->
    (l, m) u32 words of y = sum_b U_b 2^(8b) < 2^50 (m < 2^18)."""
    u0, u1, u2, u3 = p
    a1 = u1 << jnp.uint32(8)
    a2 = u2 << jnp.uint32(16)
    a3 = u3 << jnp.uint32(24)
    l = u0 + a1
    c1 = jnp.where(l < a1, jnp.uint32(1), jnp.uint32(0))
    l = l + a2
    c2 = jnp.where(l < a2, jnp.uint32(1), jnp.uint32(0))
    l = l + a3
    c3 = jnp.where(l < a3, jnp.uint32(1), jnp.uint32(0))
    mw = (u1 >> jnp.uint32(24)) + (u2 >> jnp.uint32(16)) \
        + (u3 >> jnp.uint32(8)) + c1 + c2 + c3
    return l, mw


def _extract_i8(t, n_rows, kdim):
    """u32 tile [bb, r, c] -> signed contraction operand
    [bb*r, 4*c] i8 with lanes plane-major (a, c): plane a holds
    ((t >> 8a) & 0xFF) ^ 0x80 truncated to i8 (= byte_a - 128)."""
    planes = [((t >> jnp.uint32(8 * a)) & jnp.uint32(0xFF)
               ^ jnp.uint32(0x80)).astype(jnp.int8) for a in range(WB)]
    return jnp.concatenate(planes, axis=-1).reshape(n_rows, kdim)


# ---------------------------------------------------------------------------
# fused stage kernels
# ---------------------------------------------------------------------------


def _twiddled_reduce(l, mw, q, tw, twsh, tw32, tw32sh, tk):
    """t*(y - K) mod q with y = l + m*2^32 unreduced: two Shoups plus
    the precomputed -t*K term; result in [0, q)."""
    r = (_norm2q(_shoup2q(l, tw, twsh, q), q)
         + _norm2q(_shoup2q(mw, tw32, tw32sh, q), q)
         + tk)
    q2 = q + q
    r = jnp.where(r >= q2, r - q2, r)
    return _norm2q(r, q)


def _plain_reduce(l, mw, q, mu, s1c, c32, c32_sh, kc):
    """(y - K) mod q for unreduced (l, m): one Shoup fold of m, one
    Barrett on l, plus the per-limb -K mod q constant."""
    r = (_norm2q(_shoup2q(mw, c32, c32_sh, q), q)
         + _reduce32(l, q, mu, s1c) + kc)
    q2 = q + q
    r = jnp.where(r >= q2, r - q2, r)
    return _norm2q(r, q)


def _fwd_core(x, bb, n1, n2, cv, ma, ba, mb, bbias, tws):
    """Forward four-step transform of ONE [bb, n2(i2), n1(i1)]
    natural-order tile to the flat NTT domain [bb, n2(j2), n1(j1)] —
    the traced body shared by the plain forward kernel and the fused
    keyswitch megakernel. cv/tws as in `_inv_core` (tws = the 5 forward
    mid-twiddle tables [n1, n2])."""
    q, mu, s1c, c32, c32_sh, kc = cv
    # stage 1: contract i2 for each i1
    t = jnp.swapaxes(x, 1, 2)                          # [bb, n1, n2]
    a8 = _extract_i8(t, bb * n1, WB * n2)
    p = jnp.dot(a8, ma, preferred_element_type=I32)
    p = (p + ba).astype(U32)
    l, mw = _assemble_lm(
        [p[:, b * LANES:(b + 1) * LANES] for b in range(NP)])
    l = l.reshape(bb, n1, n2)
    mw = mw.reshape(bb, n1, n2)
    r1 = _twiddled_reduce(l, mw, q, *tws)              # (i1, j2)
    # stage 2: contract i1 for each j2
    t2 = jnp.swapaxes(r1, 1, 2)                        # [bb, n2, n1]
    a8b = _extract_i8(t2, bb * n2, WB * n1)
    p2 = jnp.dot(a8b, mb, preferred_element_type=I32)
    p2 = (p2 + bbias).astype(U32)
    l2, mw2 = _assemble_lm(
        [p2[:, b * LANES:(b + 1) * LANES] for b in range(NP)])
    if n1 < LANES:
        l2 = l2[:, :n1]
        mw2 = mw2[:, :n1]
    l2 = l2.reshape(bb, n2, n1)
    mw2 = mw2.reshape(bb, n2, n1)
    return _plain_reduce(l2, mw2, q, mu, s1c, c32, c32_sh, kc)  # (j2, j1)


def _inv_core(x, bb, n1, n2, cv, ma, ba, mb, bbias, tws):
    """Inverse four-step transform of ONE [bb, n2(j2), n1(j1)] NTT-domain
    tile to natural order [bb, n2(i2), n1(i1)] — the traced body shared
    by the plain inverse kernel and the fused tensor/keyswitch inverse
    kernels. cv = (q, mu, s1c, c32, c32_sh, kc); tws = the 5 inverse
    mid-twiddle tables [n2, n1]."""
    q, mu, s1c, c32, c32_sh, kc = cv
    a8 = _extract_i8(x, bb * n2, WB * n1)
    p = jnp.dot(a8, ma, preferred_element_type=I32)
    p = (p + ba).astype(U32)
    l, mw = _assemble_lm(
        [p[:, b * LANES:(b + 1) * LANES] for b in range(NP)])
    if n1 < LANES:
        l = l[:, :n1]
        mw = mw[:, :n1]
    l = l.reshape(bb, n2, n1)
    mw = mw.reshape(bb, n2, n1)
    rA = _twiddled_reduce(l, mw, q, *tws)               # (j2, i1)
    t2 = jnp.swapaxes(rA, 1, 2)                        # [bb,n1,n2]
    a8b = _extract_i8(t2, bb * n1, WB * n2)
    p2 = jnp.dot(a8b, mb, preferred_element_type=I32)
    p2 = (p2 + bbias).astype(U32)
    l2, mw2 = _assemble_lm(
        [p2[:, b * LANES:(b + 1) * LANES] for b in range(NP)])
    l2 = l2.reshape(bb, n1, n2)
    mw2 = mw2.reshape(bb, n1, n2)
    rB = _plain_reduce(l2, mw2, q, mu, s1c, c32, c32_sh, kc)
    return jnp.swapaxes(rB, 1, 2)                      # (i2, i1)


def _make_transform(inverse: bool, n: int, k: int, rows: int, bb: int,
                    n1: int, interpret: bool, broadcast: bool = False):
    """One FULL four-step transform as a single pallas_call: both
    stages run back-to-back in one VMEM residency (the intermediate
    never touches HBM), so a transform costs exactly one HBM read and
    one write. In/out arrays are [rows, k, n2, n1] u32; the k <-> row
    reorder rides the block index maps.

      fwd: transpose (i2,i1)->(i1,i2); dot m2 (K=4*n2); psi twiddle
           (i1,j2); transpose; dot m1 (K=4*n1, cols padded to 128);
           out flat (j2, j1) == the NTT domain
      inv: dot im1 (K=4*n1) contracting j1 per j2; inverse twiddle
           (j2,i1); transpose; dot im2 (K=4*n2, psi^-1/N folded);
           transpose; out natural (i2, i1)

    Inputs: consts [k, 8] SMEM; x; matA/biasA (first stage); matB/
    biasB (second stage); twiddle quint [k, ., .] u32. Grid
    (limb, row-block)."""
    n2 = LANES
    rpb = rows // bb

    def kernel(consts_r, x_r, ma_r, ba_r, mb_r, bb_r,
               tw_r, twsh_r, tw32_r, tw32sh_r, tk_r, o_r):
        li = pl.program_id(0)
        q = consts_r[li, 0]
        mu = consts_r[li, 1]
        s1c = consts_r[li, 2]
        c32 = consts_r[li, 3]
        c32_sh = consts_r[li, 4]
        kc = consts_r[li, 5]
        x = x_r[:].reshape(bb, n2, n1)

        if not inverse:
            # stage 1: contract i2 for each i1
            t = jnp.swapaxes(x, 1, 2)                      # [bb,n1,n2]
            a8 = _extract_i8(t, bb * n1, WB * n2)
            p = jnp.dot(a8, ma_r[0], preferred_element_type=I32)
            p = (p + ba_r[0]).astype(U32)
            l, mw = _assemble_lm(
                [p[:, b * LANES:(b + 1) * LANES] for b in range(NP)])
            l = l.reshape(bb, n1, n2)
            mw = mw.reshape(bb, n1, n2)
            r1 = _twiddled_reduce(l, mw, q, tw_r[0], twsh_r[0],
                                  tw32_r[0], tw32sh_r[0],
                                  tk_r[0])                 # (i1, j2)
            # stage 2: contract i1 for each j2
            t2 = jnp.swapaxes(r1, 1, 2)                    # [bb,n2,n1]
            a8b = _extract_i8(t2, bb * n2, WB * n1)
            p2 = jnp.dot(a8b, mb_r[0], preferred_element_type=I32)
            p2 = (p2 + bb_r[0]).astype(U32)
            l2, mw2 = _assemble_lm(
                [p2[:, b * LANES:(b + 1) * LANES] for b in range(NP)])
            if n1 < LANES:
                l2 = l2[:, :n1]
                mw2 = mw2[:, :n1]
            l2 = l2.reshape(bb, n2, n1)
            mw2 = mw2.reshape(bb, n2, n1)
            r2 = _plain_reduce(l2, mw2, q, mu, s1c, c32, c32_sh, kc)
            o_r[:] = r2.reshape(o_r.shape)                 # (j2, j1)
            return

        # inverse: both stages via the shared core
        o_r[:] = _inv_core(
            x, bb, n1, n2, (q, mu, s1c, c32, c32_sh, kc),
            ma_r[0], ba_r[0], mb_r[0], bb_r[0],
            (tw_r[0], twsh_r[0], tw32_r[0], tw32sh_r[0], tk_r[0]),
        ).reshape(o_r.shape)

    def imap_rk(i, j):
        return (j, i, jnp.int32(0), jnp.int32(0))

    def imap_rk_bcast(i, j):
        # broadcast mode: every limb reads the SAME single-limb input
        # block (keyswitch raw digits — the materialized k-fold
        # broadcast never exists in HBM)
        return (j, jnp.int32(0), jnp.int32(0), jnp.int32(0))

    def imap_limb(i, j):
        return (i, jnp.int32(0), jnp.int32(0))

    def imap_consts(i, j):
        return (jnp.int32(0), jnp.int32(0))

    ka = WB * (n2 if not inverse else n1)
    kb = WB * (n1 if not inverse else n2)
    ncols = NP * LANES
    if not inverse:
        trows, tcols = n1, n2
    else:
        trows, tcols = n2, n1
    in_specs = [
        pl.BlockSpec((k, 8), imap_consts, memory_space=pltpu.SMEM),
        pl.BlockSpec((bb, 1, n2, n1),
                     imap_rk_bcast if broadcast else imap_rk,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ka, ncols), imap_limb, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ncols), imap_limb, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kb, ncols), imap_limb, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ncols), imap_limb, memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((1, trows, tcols), imap_limb,
                      memory_space=pltpu.VMEM)] * 5
    return pl.pallas_call(
        kernel,
        grid=(k, rpb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, 1, n2, n1), imap_rk,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, k, n2, n1), U32),
        interpret=interpret,
    )


def _make_inv_tensor3(n: int, k: int, rows: int, bb: int, n1: int,
                      interpret: bool):
    """Fused BFV component convolution + inverse transform: reads the
    two 2-component NTT-domain operands, forms (a0b0, a0b1+a1b0, a1b1)
    mod q in VMEM, and inverse-transforms all three — the 3-component
    tensor intermediate never exists in HBM (bfv.ops.multiply)."""
    n2 = LANES
    rpb = rows // bb

    def kernel(consts_r, a_r, b_r, ma_r, ba_r, mb_r, bbias_r,
               tw_r, twsh_r, tw32_r, tw32sh_r, tk_r, o_r):
        li = pl.program_id(0)
        q = consts_r[li, 0]
        mu = consts_r[li, 1]
        s1c = consts_r[li, 2]
        c32 = consts_r[li, 3]
        c32_sh = consts_r[li, 4]
        kc = consts_r[li, 5]
        cv = (q, mu, s1c, c32, c32_sh, kc)
        tws = (tw_r[0], twsh_r[0], tw32_r[0], tw32sh_r[0], tk_r[0])
        a0 = a_r[:, 0, 0]
        a1 = a_r[:, 1, 0]
        b0 = b_r[:, 0, 0]
        b1 = b_r[:, 1, 0]

        def red(hi, lo):
            return _reduce64(hi, lo, q, mu, s1c, c32, c32_sh)

        h0, l0 = _mul32(a0, b0)
        h1, l1 = _mul32(a0, b1)
        h2, l2 = _mul32(a1, b0)
        hs, ls = _addc(h1 + h2, l1, l2)
        h3, l3 = _mul32(a1, b1)
        for c, (hh, ll) in enumerate(((h0, l0), (hs, ls), (h3, l3))):
            o_r[:, c, 0] = _inv_core(red(hh, ll), bb, n1, n2, cv,
                                     ma_r[0], ba_r[0], mb_r[0],
                                     bbias_r[0], tws)

    def imap_ab(i, j):
        return (j, jnp.int32(0), i, jnp.int32(0), jnp.int32(0))

    def imap_limb(i, j):
        return (i, jnp.int32(0), jnp.int32(0))

    def imap_consts(i, j):
        return (jnp.int32(0), jnp.int32(0))

    ka = WB * n1
    kb = WB * n2
    ncols = NP * LANES
    in_specs = [
        pl.BlockSpec((k, 8), imap_consts, memory_space=pltpu.SMEM),
        pl.BlockSpec((bb, 2, 1, n2, n1), imap_ab,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, 2, 1, n2, n1), imap_ab,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ka, ncols), imap_limb, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ncols), imap_limb, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kb, ncols), imap_limb, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ncols), imap_limb, memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((1, n2, n1), imap_limb,
                      memory_space=pltpu.VMEM)] * 5
    return pl.pallas_call(
        kernel,
        grid=(k, rpb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, 3, 1, n2, n1), imap_ab,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 3, k, n2, n1), U32),
        interpret=interpret,
    )


def _make_inv_ks(n: int, k: int, kdig: int, rows: int, bb: int, n1: int,
                 interpret: bool):
    """Fused keyswitch inner product + inverse transform: contracts the
    digit axis against both key components in VMEM and inverse-
    transforms the two accumulators — the [rows, 2, k, N] inner-product
    intermediate never exists in HBM (bfv.ops.keyswitch). Raw 64-bit
    accumulation: kdig * q^2 < 2^64 for kdig <= 16, q < 2^30."""
    n2 = LANES
    rpb = rows // bb

    def kernel(consts_r, d_r, k0_r, k1_r, ma_r, ba_r, mb_r, bbias_r,
               tw_r, twsh_r, tw32_r, tw32sh_r, tk_r, o_r):
        li = pl.program_id(0)
        q = consts_r[li, 0]
        mu = consts_r[li, 1]
        s1c = consts_r[li, 2]
        c32 = consts_r[li, 3]
        c32_sh = consts_r[li, 4]
        kc = consts_r[li, 5]
        cv = (q, mu, s1c, c32, c32_sh, kc)
        tws = (tw_r[0], twsh_r[0], tw32_r[0], tw32sh_r[0], tk_r[0])
        for comp, kr in ((0, k0_r), (1, k1_r)):
            ahi = jnp.zeros((bb, n2, n1), U32)
            alo = jnp.zeros((bb, n2, n1), U32)
            for i in range(kdig):
                hi, lo = _mul32(d_r[:, i, 0], kr[i, 0])
                ahi, alo = _addc(ahi, alo, lo)
                ahi = ahi + hi
            acc = _reduce64(ahi, alo, q, mu, s1c, c32, c32_sh)
            o_r[:, comp, 0] = _inv_core(acc, bb, n1, n2, cv,
                                        ma_r[0], ba_r[0], mb_r[0],
                                        bbias_r[0], tws)

    def imap_d(i, j):
        return (j, jnp.int32(0), i, jnp.int32(0), jnp.int32(0))

    def imap_key(i, j):
        return (jnp.int32(0), i, jnp.int32(0), jnp.int32(0))

    def imap_limb(i, j):
        return (i, jnp.int32(0), jnp.int32(0))

    def imap_consts(i, j):
        return (jnp.int32(0), jnp.int32(0))

    ka = WB * n1
    kb = WB * n2
    ncols = NP * LANES
    in_specs = [
        pl.BlockSpec((k, 8), imap_consts, memory_space=pltpu.SMEM),
        pl.BlockSpec((bb, kdig, 1, n2, n1), imap_d,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kdig, 1, n2, n1), imap_key,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kdig, 1, n2, n1), imap_key,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ka, ncols), imap_limb, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ncols), imap_limb, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kb, ncols), imap_limb, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ncols), imap_limb, memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((1, n2, n1), imap_limb,
                      memory_space=pltpu.VMEM)] * 5
    return pl.pallas_call(
        kernel,
        grid=(k, rpb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, 2, 1, n2, n1), imap_d,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 2, k, n2, n1), U32),
        interpret=interpret,
    )


def _make_ks_full(n: int, k: int, kdig: int, rows: int, bb: int, n1: int,
                  interpret: bool, per_limb: bool = False):
    """The keyswitch MEGAKERNEL: raw u32 digits -> keyswitched
    coefficient-domain components in ONE Pallas call. Per grid instance
    (limb, row-block) it forward-transforms each of the kdig raw digit
    polynomials with `_fwd_core` (exact for ANY u32 input — the same
    linearity argument as `fwd_broadcast`), contracts them against both
    key components in 64-bit (hi, lo) accumulators, and inverse-
    transforms the two results with `_inv_core`.

    Removes BOTH keyswitch HBM glue arrays of the two-kernel path
    (bfv.ops.keyswitch round-4 structure): the [rows, kdig, k, N]
    NTT-domain digit stack (`fwd_broadcast` output) never exists, so
    the op costs one broadcast digit read per key limb + the [rows, 2,
    k, N] output write. Raw 64-bit accumulation: kdig * q^2 < 2^64 for
    kdig <= 16, q < 2^30 (same bound as `_make_inv_ks`).

    per_limb=False: d is ONE raw u32 poly per digit, broadcast-read by
    every limb (the BFV hybrid-keyswitch shape — exact for any u32).
    per_limb=True: d carries per-limb residues [rows, kdig, k, n2, n1]
    (the TFHE signed-digit shape, where a digit's residues differ per
    modulus)."""
    n2 = LANES
    rpb = rows // bb

    def kernel(consts_r, d_r, k0_r, k1_r,
               fma_r, fba_r, fmb_r, fbb_r,
               ftw_r, ftwsh_r, ftw32_r, ftw32sh_r, ftk_r,
               ima_r, iba_r, imb_r, ibb_r,
               itw_r, itwsh_r, itw32_r, itw32sh_r, itk_r, o_r):
        li = pl.program_id(0)
        q = consts_r[li, 0]
        mu = consts_r[li, 1]
        s1c = consts_r[li, 2]
        c32 = consts_r[li, 3]
        c32_sh = consts_r[li, 4]
        kc = consts_r[li, 5]
        cv = (q, mu, s1c, c32, c32_sh, kc)
        ftws = (ftw_r[0], ftwsh_r[0], ftw32_r[0], ftw32sh_r[0], ftk_r[0])
        itws = (itw_r[0], itwsh_r[0], itw32_r[0], itw32sh_r[0], itk_r[0])
        a0hi = jnp.zeros((bb, n2, n1), U32)
        a0lo = jnp.zeros((bb, n2, n1), U32)
        a1hi = jnp.zeros((bb, n2, n1), U32)
        a1lo = jnp.zeros((bb, n2, n1), U32)
        for i in range(kdig):
            di = d_r[:, i, 0] if per_limb else d_r[:, i]
            y = _fwd_core(di, bb, n1, n2, cv,
                          fma_r[0], fba_r[0], fmb_r[0], fbb_r[0], ftws)
            hi, lo = _mul32(y, k0_r[i, 0])
            a0hi, a0lo = _addc(a0hi, a0lo, lo)
            a0hi = a0hi + hi
            hi, lo = _mul32(y, k1_r[i, 0])
            a1hi, a1lo = _addc(a1hi, a1lo, lo)
            a1hi = a1hi + hi
        acc0 = _reduce64(a0hi, a0lo, q, mu, s1c, c32, c32_sh)
        o_r[:, 0, 0] = _inv_core(acc0, bb, n1, n2, cv, ima_r[0], iba_r[0],
                                 imb_r[0], ibb_r[0], itws)
        acc1 = _reduce64(a1hi, a1lo, q, mu, s1c, c32, c32_sh)
        o_r[:, 1, 0] = _inv_core(acc1, bb, n1, n2, cv, ima_r[0], iba_r[0],
                                 imb_r[0], ibb_r[0], itws)

    def imap_d(i, j):
        # digit block depends only on the row-block: every limb
        # re-reads the same raw digits (no HBM broadcast materialized)
        return (j, jnp.int32(0), jnp.int32(0), jnp.int32(0))

    def imap_d_limb(i, j):
        return (j, jnp.int32(0), i, jnp.int32(0), jnp.int32(0))

    def imap_key(i, j):
        return (jnp.int32(0), i, jnp.int32(0), jnp.int32(0))

    def imap_out(i, j):
        return (j, jnp.int32(0), i, jnp.int32(0), jnp.int32(0))

    def imap_limb(i, j):
        return (i, jnp.int32(0), jnp.int32(0))

    def imap_consts(i, j):
        return (jnp.int32(0), jnp.int32(0))

    ncols = NP * LANES
    d_spec = (pl.BlockSpec((bb, kdig, 1, n2, n1), imap_d_limb,
                           memory_space=pltpu.VMEM) if per_limb else
              pl.BlockSpec((bb, kdig, n2, n1), imap_d,
                           memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((k, 8), imap_consts, memory_space=pltpu.SMEM),
        d_spec,
        pl.BlockSpec((kdig, 1, n2, n1), imap_key, memory_space=pltpu.VMEM),
        pl.BlockSpec((kdig, 1, n2, n1), imap_key, memory_space=pltpu.VMEM),
        # forward tables (S1: K = 4*n2; S2: K = 4*n1; twiddles [n1, n2])
        pl.BlockSpec((1, WB * n2, ncols), imap_limb,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ncols), imap_limb, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, WB * n1, ncols), imap_limb,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ncols), imap_limb, memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((1, n1, n2), imap_limb,
                      memory_space=pltpu.VMEM)] * 5 + [
        # inverse tables (A: K = 4*n1; B: K = 4*n2; twiddles [n2, n1])
        pl.BlockSpec((1, WB * n1, ncols), imap_limb,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ncols), imap_limb, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, WB * n2, ncols), imap_limb,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ncols), imap_limb, memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((1, n2, n1), imap_limb,
                      memory_space=pltpu.VMEM)] * 5
    return pl.pallas_call(
        kernel,
        grid=(k, rpb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, 2, 1, n2, n1), imap_out,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 2, k, n2, n1), U32),
        interpret=interpret,
    )


def _make_fwd_tensor3(n: int, k: int, rows: int, bb: int, n1: int,
                      interpret: bool, full: bool):
    """BFV tensor megakernel: forward-transforms the FOUR ciphertext
    component polynomials (a0, a1, b0, b1) of one operand pair and
    forms the NTT-domain tensor (a0b0, a0b1+a1b0, a1b1) mod q in VMEM —
    the separate [rows, 4, k, N] NTT image of the operands never exists
    in HBM (bfv.ops.multiply round-4 structure wrote + re-read it).

    full=False writes the NTT-domain tensor (inverse-transformed by the
    plain kernel next); full=True also runs the three inverse
    transforms in-kernel and writes the coefficient-domain tensor —
    seven transforms per instance, measured separately (round-4's
    3-inverse fusion lost to VMEM pressure; both variants stay
    selectable)."""
    n2 = LANES
    rpb = rows // bb

    def kernel(consts_r, x_r,
               fma_r, fba_r, fmb_r, fbb_r,
               ftw_r, ftwsh_r, ftw32_r, ftw32sh_r, ftk_r,
               ima_r, iba_r, imb_r, ibb_r,
               itw_r, itwsh_r, itw32_r, itw32sh_r, itk_r, o_r):
        li = pl.program_id(0)
        q = consts_r[li, 0]
        mu = consts_r[li, 1]
        s1c = consts_r[li, 2]
        c32 = consts_r[li, 3]
        c32_sh = consts_r[li, 4]
        kc = consts_r[li, 5]
        cv = (q, mu, s1c, c32, c32_sh, kc)
        ftws = (ftw_r[0], ftwsh_r[0], ftw32_r[0], ftw32sh_r[0], ftk_r[0])
        hats = [_fwd_core(x_r[:, c, 0], bb, n1, n2, cv, fma_r[0],
                          fba_r[0], fmb_r[0], fbb_r[0], ftws)
                for c in range(4)]
        a0, a1, b0, b1 = hats

        def red(hi, lo):
            return _reduce64(hi, lo, q, mu, s1c, c32, c32_sh)

        h0, l0 = _mul32(a0, b0)
        h1, l1 = _mul32(a0, b1)
        h2, l2 = _mul32(a1, b0)
        hs, ls = _addc(h1 + h2, l1, l2)
        h3, l3 = _mul32(a1, b1)
        if full:
            itws = (itw_r[0], itwsh_r[0], itw32_r[0], itw32sh_r[0],
                    itk_r[0])
            for c, (hh, ll) in enumerate(((h0, l0), (hs, ls), (h3, l3))):
                o_r[:, c, 0] = _inv_core(red(hh, ll), bb, n1, n2, cv,
                                         ima_r[0], iba_r[0], imb_r[0],
                                         ibb_r[0], itws)
        else:
            for c, (hh, ll) in enumerate(((h0, l0), (hs, ls), (h3, l3))):
                o_r[:, c, 0] = red(hh, ll)

    def imap_x(i, j):
        return (j, jnp.int32(0), i, jnp.int32(0), jnp.int32(0))

    def imap_limb(i, j):
        return (i, jnp.int32(0), jnp.int32(0))

    def imap_consts(i, j):
        return (jnp.int32(0), jnp.int32(0))

    ncols = NP * LANES
    in_specs = [
        pl.BlockSpec((k, 8), imap_consts, memory_space=pltpu.SMEM),
        pl.BlockSpec((bb, 4, 1, n2, n1), imap_x, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, WB * n2, ncols), imap_limb,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ncols), imap_limb, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, WB * n1, ncols), imap_limb,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ncols), imap_limb, memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((1, n1, n2), imap_limb,
                      memory_space=pltpu.VMEM)] * 5 + [
        pl.BlockSpec((1, WB * n1, ncols), imap_limb,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ncols), imap_limb, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, WB * n2, ncols), imap_limb,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ncols), imap_limb, memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((1, n2, n1), imap_limb,
                      memory_space=pltpu.VMEM)] * 5
    return pl.pallas_call(
        kernel,
        grid=(k, rpb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, 3, 1, n2, n1), imap_x,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 3, k, n2, n1), U32),
        interpret=interpret,
    )


_INTERPRET = None


def _interpret() -> bool:
    global _INTERPRET
    if _INTERPRET is None:
        _INTERPRET = jax.default_backend() == "cpu"
    return _INTERPRET


def _balanced_digits(v: np.ndarray) -> list[np.ndarray]:
    """u64 values < 2^31 -> NP int8 planes d_b in [-128, 127] with
    sum_b d_b 2^(8b) = v."""
    cur = v.astype(np.int64)
    out = []
    for _ in range(NP):
        d = ((cur + 128) % 256) - 128
        out.append(d.astype(np.int8))
        cur = (cur - d) >> 8
    assert np.all(cur == 0)
    return out


def _absorbed_digits(msrc: np.ndarray, moduli) \
        -> tuple[np.ndarray, np.ndarray]:
    """[k, n_in, n_out] u64 (entries < q) -> (mat, bias): mat
    [k, WB*n_in, NP*128] int8 with row (a, i) PLANE-MAJOR, col (b, j)
    zero-padded to 128 j-lanes; entry digit_b((2^(8a) M[i, j]) mod q).
    bias [k, 1, NP*128] i32 = 128*colsum(mat) + 2^24 (the signed-dot
    zero-point correction)."""
    k, n_in, n_out = msrc.shape
    assert n_out <= LANES
    out = np.zeros((k, WB, n_in, NP, LANES), np.int8)
    for j, q in enumerate(moduli):
        for a in range(WB):
            ma = (msrc[j] * ((1 << (8 * a)) % q)) % q  # < 2^30, u64 safe
            digs = _balanced_digits(ma)
            for b in range(NP):
                out[j, a, :, b, :n_out] = digs[b]
    mat = out.reshape(k, WB * n_in, NP * LANES)
    bias = (128 * mat.astype(np.int64).sum(axis=1, keepdims=True)
            + _KBIAS).astype(np.int32)
    return mat, bias


class PallasMatmulNttPlan:
    """Negacyclic NTT over u32 RNS limb stacks: fused transpose +
    signed-byte-extract + MXU-dot + recombination Pallas stages. Same
    call surface as the other plans (fwd/inv/pointwise_mul/
    negacyclic_mul on [..., k, N]); NTT domain is the plan-private
    flat (j2*n1 + j1) four-step order."""

    mode = "pallas"

    def __init__(self, n: int, moduli: tuple[int, ...]):
        assert n & (n - 1) == 0 and n >= 256, "pallas plan needs N >= 256"
        assert n <= 16384, "pallas plan: n1 <= 128 needs N <= 16384"
        assert max(q.bit_length() for q in moduli) <= 30
        assert min(q.bit_length() for q in moduli) >= 17
        self.n = n
        self.moduli = tuple(moduli)
        self.word = U32
        k = len(moduli)
        n2 = LANES
        n1 = n // n2
        self.n1, self.n2 = n1, n2

        m2 = np.empty((k, n2, n2), dtype=np.uint64)
        m1 = np.empty((k, n1, n1), dtype=np.uint64)
        im2 = np.empty((k, n2, n2), dtype=np.uint64)
        im1 = np.empty((k, n1, n1), dtype=np.uint64)
        tw1 = np.empty((k, n1, n2), dtype=np.uint32)
        itw1 = np.empty((k, n1, n2), dtype=np.uint32)
        consts = np.zeros((k, 8), dtype=np.uint32)

        for j, q in enumerate(moduli):
            assert q % (2 * n) == 1, f"q={q} not NTT-friendly for N={n}"
            psi = primes.min_root_of_unity(2 * n, q)
            w = psi * psi % q
            ipsi = pow(psi, -1, q)
            iw = pow(w, -1, q)
            ninv = pow(n, -1, q)
            w_n1, iw_n1 = pow(w, n1, q), pow(iw, n1, q)
            w_n2, iw_n2 = pow(w, n2, q), pow(iw, n2, q)
            psi_n1, ipsi_n1 = pow(psi, n1, q), pow(ipsi, n1, q)
            # stage-1 matrix with psi^(n1 i2) pre-twiddle folded in
            m2[j] = _vandermonde(w_n1, n2, q, row_scale_base=psi_n1)
            # inverse final matrix with psi^(-n1 i2)/N folded in
            im2[j] = _vandermonde(iw_n1, n2, q, row_scale_base=ipsi_n1,
                                  scale_all=ninv).T
            m1[j] = _vandermonde(w_n2, n1, q)
            im1[j] = _vandermonde(iw_n2, n1, q)
            # mid twiddle with psi^(i1) folded (fwd) / psi^(-i1) (inv)
            for i1 in range(n1):
                wi = pow(w, i1, q)
                iwi = pow(iw, i1, q)
                acc = pow(psi, i1, q)
                iacc = pow(ipsi, i1, q)
                for j2 in range(n2):
                    tw1[j, i1, j2] = acc
                    itw1[j, i1, j2] = iacc
                    acc = acc * wi % q
                    iacc = iacc * iwi % q
            mu, s1 = m.barrett32_consts(q)
            c32 = (1 << 32) % q
            consts[j] = (q, mu, s1, c32, m.shoup_ratio32(c32, q),
                         (-_K) % q, 0, 0)

        # All plan tables are NUMPY: a jnp constant made here would be
        # cached as a leaked tracer if the plan were built lazily under
        # an outer jit trace (CLAUDE.md round-2 gotcha); _transform
        # converts per-trace.
        self.s1_m = _absorbed_digits(m2, moduli)
        self.s2_m = _absorbed_digits(m1, moduli)
        self.iA_m = _absorbed_digits(im1, moduli)
        self.iB_m = _absorbed_digits(im2, moduli)

        def shoup_arr(arr):
            flat = arr.reshape(k, -1)
            return np.array(
                [[m.shoup_ratio32(int(x), int(qq)) for x in row]
                 for row, qq in zip(flat, moduli)],
                dtype=np.uint32).reshape(arr.shape)

        def mulmod_arr(arr, c_per_limb):
            flat = arr.reshape(k, -1).astype(np.uint64)
            cs = np.array(c_per_limb, np.uint64)
            qs = np.array(moduli, np.uint64)
            return ((flat * cs[:, None]) % qs[:, None]).astype(
                np.uint32).reshape(arr.shape)

        def twiddle_quint(arr):
            t32 = mulmod_arr(arr, [(1 << 32) % q for q in moduli])
            # -t*K mod q (the assembled-shift correction, see header)
            tk = mulmod_arr(arr, [(-_K) % q for q in moduli])
            return (arr, shoup_arr(arr), t32, shoup_arr(t32), tk)

        # fwd mid twiddle in the S1 pre-transpose layout (i1, j2);
        # inverse mid twiddle in the A output layout (j2, i1)
        self.tw_f = twiddle_quint(tw1)
        self.tw_i = twiddle_quint(
            np.ascontiguousarray(itw1.transpose(0, 2, 1)))
        self.consts = consts
        self.q_host = np.array(moduli, np.uint32)
        # generic (mu, s1) views for pointwise ops
        self.c0_host = consts[:, 1].copy()
        self.c1_host = consts[:, 2].copy()

    # -- stage dispatch ------------------------------------------------------

    def _bb(self, rows: int, target_bytes: int | None = None) -> int:
        """Rows per block. Two bounds:
        - the x block (bb * N bytes) target — 1 MB (bb=32 at N=8192)
          measured fastest on the v5e;
        - the i32 MXU partial stacks, which dominate scoped VMEM at
          ~bb * (n1 + n2) * NP*LANES * 4 bytes (verified: the model
          predicts 17.4 MB for the bb=64/N=1024 case Mosaic rejected
          at 18.38 MB) — capped at 12 MB so both stages' stacks +
          double-buffered blocks fit the 16 MB scoped-vmem limit.
        Override with SUNSCREEN_TPU_PMNTT_BB_KB for tuning."""
        import os
        if target_bytes is None:
            target_bytes = int(os.environ.get(
                "SUNSCREEN_TPU_PMNTT_BB_KB", "1024")) << 10
        row_bytes = self.n * 4
        # Measured calibration (round 5, real chip): the INVERSE
        # transform at N=8192 rows=96 bb=24 OOMs scoped vmem at
        # 16.45 MB — ~0.69 MB/row, 1.75x the plain 4-byte stack model
        # (multi-step grids double-buffer the in/out blocks on top of
        # the i32 partial stacks). Budget 10 MB at 6 B/lane keeps every
        # observed shape compiling (N=8192 -> bb<=17, which the
        # divisibility walk lands on 16).
        stack_row_bytes = (self.n1 + self.n2) * NP * LANES * 6
        vmem_cap = max(1, (10 << 20) // stack_row_bytes)
        b = max(1, min(rows, target_bytes // row_bytes, vmem_cap))
        while rows % b:
            b -= 1
        return b

    @functools.partial(jax.jit, static_argnames=("self", "inverse"))
    def _transform(self, x, inverse: bool):
        """x [rows, k, N] -> [rows, k, N]. ONE fused kernel for the
        whole transform: both stages share a VMEM residency, so the
        cost is a single HBM read + write. Layout moves ride the block
        index maps (k <-> row) and in-kernel tile transposes."""
        rows, k, n = x.shape
        n1, n2 = self.n1, self.n2
        bb = self._bb(rows)
        interp = _interpret()
        consts = jnp.asarray(self.consts)
        x4 = x.reshape(rows, k, n2, n1)

        def mb(pair):
            return jnp.asarray(pair[0]), jnp.asarray(pair[1])

        if not inverse:
            f = _make_transform(False, n, k, rows, bb, n1, interp)
            z = f(consts, x4, *mb(self.s1_m), *mb(self.s2_m),
                  *map(jnp.asarray, self.tw_f))    # [rows, k, j2, j1]
            return z.reshape(rows, k, n)

        f = _make_transform(True, n, k, rows, bb, n1, interp)
        v = f(consts, x4, *mb(self.iA_m), *mb(self.iB_m),
              *map(jnp.asarray, self.tw_i))        # [rows, k, i2, i1]
        return v.reshape(rows, k, n)

    def _apply(self, x, inverse: bool):
        x = x.astype(self.word)   # byte split is word-width-dependent
        lead = x.shape[:-2]
        rows = 1
        for d in lead:
            rows *= d
        out = self._transform(x.reshape(rows, len(self.moduli), self.n),
                              inverse=inverse)
        return out.reshape(x.shape)

    def fwd(self, x):
        """[..., k, N] coefficients -> NTT domain (flat (j2, j1))."""
        return self._apply(x, inverse=False)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _transform_broadcast(self, x):
        rows, n = x.shape
        n1, n2 = self.n1, self.n2
        k = len(self.moduli)
        bb = self._bb(rows)
        f = _make_transform(False, n, k, rows, bb, n1, _interpret(),
                            broadcast=True)
        z = f(jnp.asarray(self.consts), x.reshape(rows, 1, n2, n1),
              *(jnp.asarray(t) for t in self.s1_m),
              *(jnp.asarray(t) for t in self.s2_m),
              *map(jnp.asarray, self.tw_f))
        return z.reshape(rows, k, n)

    def fwd_broadcast(self, x):
        """[..., N] u32 (ONE poly per row, any u32 values) ->
        [..., k, N]: forward-transforms the SAME coefficients under
        every limb modulus without ever materializing the k-fold
        broadcast in HBM (keyswitch raw-digit path)."""
        x = x.astype(self.word)
        lead = x.shape[:-1]
        rows = 1
        for d in lead:
            rows *= d
        out = self._transform_broadcast(x.reshape(rows, self.n))
        return out.reshape(*lead, len(self.moduli), self.n)

    def inv(self, x):
        """NTT domain -> [..., k, N] natural coefficient order."""
        return self._apply(x, inverse=True)

    # -- fused inverse variants (convolution / keyswitch prologues) ----------

    def _fbb(self, rows: int) -> int:
        """Rows per block for the fused inverse kernels: they hold 2-4
        extra input tiles plus one transform's partial stacks, so the
        default block is 4x smaller than the plain transform's."""
        import os
        tb = int(os.environ.get("SUNSCREEN_TPU_PMNTT_FBB_KB", "256")) << 10
        return self._bb(rows, target_bytes=tb)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _inv_tensor3_impl(self, a, b):
        rows = a.shape[0]
        k = len(self.moduli)
        n1, n2 = self.n1, self.n2
        f = _make_inv_tensor3(self.n, k, rows, self._fbb(rows), n1,
                              _interpret())
        z = f(jnp.asarray(self.consts),
              a.reshape(rows, 2, k, n2, n1),
              b.reshape(rows, 2, k, n2, n1),
              *(jnp.asarray(t) for t in self.iA_m),
              *(jnp.asarray(t) for t in self.iB_m),
              *map(jnp.asarray, self.tw_i))
        return z.reshape(rows, 3, k, self.n)

    def inv_tensor3(self, a_hat, b_hat):
        """a_hat, b_hat [..., 2, k, N] (NTT domain) -> [..., 3, k, N]
        coefficient-domain BFV tensor (a0b0, a0b1+a1b0, a1b1): the
        component convolution fused into the inverse transform, so the
        NTT-domain tensor never round-trips HBM."""
        a_hat = a_hat.astype(self.word)
        b_hat = b_hat.astype(self.word)
        lead = a_hat.shape[:-3]
        rows = 1
        for d in lead:
            rows *= d
        k = len(self.moduli)
        out = self._inv_tensor3_impl(
            a_hat.reshape(rows, 2, k, self.n),
            b_hat.reshape(rows, 2, k, self.n))
        return out.reshape(*lead, 3, k, self.n)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _inv_ks_impl(self, d_hat, k0, k1):
        rows, kdig, k, n = d_hat.shape
        n1, n2 = self.n1, self.n2
        f = _make_inv_ks(self.n, k, kdig, rows, self._fbb(rows), n1,
                         _interpret())
        z = f(jnp.asarray(self.consts),
              d_hat.reshape(rows, kdig, k, n2, n1),
              k0.reshape(kdig, k, n2, n1),
              k1.reshape(kdig, k, n2, n1),
              *(jnp.asarray(t) for t in self.iA_m),
              *(jnp.asarray(t) for t in self.iB_m),
              *map(jnp.asarray, self.tw_i))
        return z.reshape(rows, 2, k, n)

    def inv_ks(self, d_hat, k0, k1):
        """d_hat [..., kdig, k, N], keys k0/k1 [kdig, k, N] (all NTT
        domain) -> [..., 2, k, N] coefficient domain: the keyswitch
        digit contraction (sum_i d_i * key_i mod q) fused into the
        inverse transform of both key components."""
        d_hat = d_hat.astype(self.word)
        lead = d_hat.shape[:-3]
        kdig = d_hat.shape[-3]
        rows = 1
        for d in lead:
            rows *= d
        k = len(self.moduli)
        out = self._inv_ks_impl(
            d_hat.reshape(rows, kdig, k, self.n),
            k0.astype(self.word), k1.astype(self.word))
        return out.reshape(*lead, 2, k, self.n)

    @functools.partial(jax.jit, static_argnames=("self", "full"))
    def _fwd_tensor3_impl(self, x, full: bool):
        rows = x.shape[0]
        k = len(self.moduli)
        n1, n2 = self.n1, self.n2
        f = _make_fwd_tensor3(self.n, k, rows, self._fbb(rows), n1,
                              _interpret(), full)
        z = f(jnp.asarray(self.consts),
              x.reshape(rows, 4, k, n2, n1),
              *(jnp.asarray(t) for t in self.s1_m),
              *(jnp.asarray(t) for t in self.s2_m),
              *map(jnp.asarray, self.tw_f),
              *(jnp.asarray(t) for t in self.iA_m),
              *(jnp.asarray(t) for t in self.iB_m),
              *map(jnp.asarray, self.tw_i))
        return z.reshape(rows, 3, k, self.n)

    def fwd_tensor3(self, ext, full: bool = False):
        """ext [..., 4, k, N] coefficient-domain extended operand pair
        (a0, a1, b0, b1, values < q per limb) -> [..., 3, k, N] BFV
        tensor: NTT domain when full=False, coefficient domain (the
        three inverse transforms fused in too) when full=True. The
        operands' forward NTT image never exists in HBM."""
        ext = ext.astype(self.word)
        lead = ext.shape[:-3]
        rows = 1
        for d in lead:
            rows *= d
        k = len(self.moduli)
        out = self._fwd_tensor3_impl(
            ext.reshape(rows, 4, k, self.n), full)
        return out.reshape(*lead, 3, k, self.n)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _ks_full_impl(self, d, k0, k1):
        rows, kdig, n = d.shape
        k = len(self.moduli)
        n1, n2 = self.n1, self.n2
        f = _make_ks_full(self.n, k, kdig, rows, self._fbb(rows), n1,
                          _interpret())
        z = f(jnp.asarray(self.consts),
              d.reshape(rows, kdig, n2, n1),
              k0.reshape(kdig, k, n2, n1),
              k1.reshape(kdig, k, n2, n1),
              *(jnp.asarray(t) for t in self.s1_m),
              *(jnp.asarray(t) for t in self.s2_m),
              *map(jnp.asarray, self.tw_f),
              *(jnp.asarray(t) for t in self.iA_m),
              *(jnp.asarray(t) for t in self.iB_m),
              *map(jnp.asarray, self.tw_i))
        return z.reshape(rows, 2, k, n)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _ks_full_limbs_impl(self, d, k0, k1):
        rows, kdig, k, n = d.shape
        n1, n2 = self.n1, self.n2
        f = _make_ks_full(self.n, k, kdig, rows, self._fbb(rows), n1,
                          _interpret(), per_limb=True)
        z = f(jnp.asarray(self.consts),
              d.reshape(rows, kdig, k, n2, n1),
              k0.reshape(kdig, k, n2, n1),
              k1.reshape(kdig, k, n2, n1),
              *(jnp.asarray(t) for t in self.s1_m),
              *(jnp.asarray(t) for t in self.s2_m),
              *map(jnp.asarray, self.tw_f),
              *(jnp.asarray(t) for t in self.iA_m),
              *(jnp.asarray(t) for t in self.iB_m),
              *map(jnp.asarray, self.tw_i))
        return z.reshape(rows, 2, k, n)

    def ks_full_limbs(self, d, k0, k1):
        """Per-limb-residue keyswitch megakernel: d [..., kdig, k, N]
        coefficient-domain residues (e.g. the TFHE signed-digit RNS
        images), keys [kdig, k, N] NTT domain -> [..., 2, k, N]
        coefficient domain, ONE Pallas call (see ks_full; this variant
        reads each limb's own digit residues instead of broadcasting a
        single u32 row)."""
        d = d.astype(self.word)
        lead = d.shape[:-3]
        kdig = d.shape[-3]
        rows = 1
        for dd in lead:
            rows *= dd
        k = len(self.moduli)
        out = self._ks_full_limbs_impl(
            d.reshape(rows, kdig, k, self.n),
            k0.astype(self.word), k1.astype(self.word))
        return out.reshape(*lead, 2, k, self.n)

    def ks_full(self, d, k0, k1):
        """Whole keyswitch core in ONE kernel: raw u32 digits d
        [..., kdig, N] (coefficient domain, ANY u32 values — e.g. the
        q-limb rows of the poly being switched) and NTT-domain keys
        k0/k1 [kdig, k, N] -> [..., 2, k, N] coefficient-domain inner
        products sum_i NTT^-1(NTT(d_i) * key_i mod q). Neither the
        broadcast digit stack nor its NTT image ever exists in HBM
        (vs fwd_broadcast + inv_ks: saves 2 x rows*kdig*k*N*4 bytes of
        traffic per call)."""
        d = d.astype(self.word)
        lead = d.shape[:-2]
        kdig = d.shape[-2]
        rows = 1
        for dd in lead:
            rows *= dd
        k = len(self.moduli)
        out = self._ks_full_impl(d.reshape(rows, kdig, self.n),
                                 k0.astype(self.word),
                                 k1.astype(self.word))
        return out.reshape(*lead, 2, k, self.n)

    # -- pointwise -----------------------------------------------------------

    def pointwise_mul(self, a, b):
        """Exact (a * b) mod q per limb on NTT-domain stacks [..., k, N]."""
        k = len(self.moduli)
        return m.w_mul_mod(a, b, jnp.asarray(self.q_host).reshape(k, 1),
                           jnp.asarray(self.c0_host).reshape(k, 1),
                           jnp.asarray(self.c1_host).reshape(k, 1))

    def negacyclic_mul(self, a, b):
        return self.inv(self.pointwise_mul(self.fwd(a), self.fwd(b)))


@lru_cache(maxsize=64)
def get_plan(n: int, moduli: tuple[int, ...]) -> PallasMatmulNttPlan:
    return PallasMatmulNttPlan(n, moduli)
