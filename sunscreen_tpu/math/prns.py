"""Fused Pallas RNS conversion kernels for the u32 engine.

The round-3 phase profile (benchmarks/PERF_NOTES.md) shows the RNS
glue — base extension, scale-and-round, base conversion — costing more
than the NTTs once the NTT stages were fused: each phase is a chain of
~30 unfused XLA passes of synthesized 32-bit arithmetic. These kernels
compute a whole conversion (normalize -> exact 128-bit fixed-point
alpha/r -> theta/omega limb contraction -> per-modulus reduction) in
ONE VMEM residency per block, coefficients on lanes.

Bit-exact replacements for `math/rns.py`'s `BaseConverter.convert` and
`ScaleAndRound.apply` (HPS machinery; SEAL analogue:
`util::BaseConverter::fast_convert_array` / `RNSTool::fastbconv_sk` —
reference engine surface, SURVEY.md §2.4), pinned by
tests/test_prns.py. u32 engine only (all moduli < 2^30).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sunscreen_tpu.math import modular as m

U32 = jnp.uint32

_NB = 2048  # lane-block (coefficients per grid step)


# ---------------------------------------------------------------------------
# in-kernel u32 primitives
# ---------------------------------------------------------------------------


def _mul32(a, b):
    """Full 32x32 -> (hi, lo) u32 product via 16-bit halves."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    mid = (p00 >> 16) + (p01 & 0xFFFF) + (p10 & 0xFFFF)
    hi = a1 * b1 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    lo = (p00 & 0xFFFF) | ((mid & 0xFFFF) << 16)
    return hi, lo


def _mulhi32(a, b):
    return _mul32(a, b)[0]


def _shoup2q(x, w, wsh, q):
    return w * x - _mulhi32(x, wsh) * q


def _norm2q(r, q):
    return jnp.where(r >= q, r - q, r)


def _reduce32(x, q, mu, s1):
    qhat = _mulhi32(x >> s1, mu)
    r = x - qhat * q
    q2 = q + q
    r = jnp.where(r >= q2, r - q2, r)
    return jnp.where(r >= q, r - q, r)


def _reduce64(hi, lo, q, mu, s1, c32, c32_sh):
    """(hi*2^32 + lo) mod q for arbitrary u32 words."""
    r = (_norm2q(_shoup2q(hi, c32, c32_sh, q), q)
         + _reduce32(lo, q, mu, s1))
    return _norm2q(r, q)


def _addc(acc_hi, acc_lo, lo):
    """64-bit accumulate of a u32 addend into an (hi, lo) pair."""
    nl = acc_lo + lo
    carry = jnp.where(nl < lo, jnp.uint32(1), jnp.uint32(0))
    return acc_hi + carry, nl


def _fp_int(ys, fpw, nb, add_half: bool):
    """Integer part of the exact fixed-point dot sum_i y_i * fp_i /
    2^128 (+ 1/2 if add_half) as (int_hi, int_lo) u32 words. ys: list
    of u32 [nb] arrays; fpw(i, w) -> the w-th (LSW-first) u32 word of
    fp_i (an SMEM scalar). Columns base 2^32; col w takes product-lo of
    fp word w and product-hi of word w-1; each column accumulated as a
    64-bit (hi, lo) pair, then one carry-propagation pass."""
    ch = [jnp.zeros((nb,), U32) for _ in range(6)]
    cl = [jnp.zeros((nb,), U32) for _ in range(6)]
    for i, y in enumerate(ys):
        for w in range(4):
            hi, lo = _mul32(y, fpw(i, w))
            ch[w], cl[w] = _addc(ch[w], cl[w], lo)
            ch[w + 1], cl[w + 1] = _addc(ch[w + 1], cl[w + 1], hi)
    if add_half:
        ch[3], cl[3] = _addc(ch[3], cl[3], jnp.full((nb,), 1 << 31, U32))
    carry = jnp.zeros((nb,), U32)
    t = [None] * 6
    for w in range(6):
        s = cl[w] + carry
        ovf = jnp.where(s < carry, jnp.uint32(1), jnp.uint32(0))
        t[w] = s
        carry = ch[w] + ovf
    return t[5], t[4]


# ---------------------------------------------------------------------------
# kernel factory
# ---------------------------------------------------------------------------


def _rns_kernel(ks: int, kd: int, mode: str, centered: bool,
                nb: int, include_src: bool = False):
    """Kernel body. SMEM refs:
    src_c [ks, 8]:  q, inv_punc, inv_punc_sh, fp0..fp3 (LSW first), 0
    dst_c [kd, 8]:  d, mu, s1, c32, c32_sh, w0 (=c_mod_d | 0), w0_sh, 0
    mat   [ks, 2*kd]: theta/omega then their shoup ratios
    x block [1, ks, nb] u32 -> out [1, kd, nb] u32 (include_src:
    [1, ks+kd, nb] with the raw source limbs copied through first —
    saves the XLA concat pass in base-extension).
    mode: 'convert' (corr = -alpha * c_mod_d) or 'scale' (corr = +r).
    """

    def kernel(src_r, dst_r, mat_r, x_r, o_r):
        if include_src:
            for i in range(ks):
                o_r[0, i] = x_r[0, i]
        # normalize: y_i = x_i * inv_punc_i mod q_i
        ys = []
        for i in range(ks):
            q = src_r[i, 0]
            y = _norm2q(_shoup2q(x_r[0, i], src_r[i, 1], src_r[i, 2],
                                 q), q)
            ys.append(y)

        # exact fixed-point dot (integer part): alpha < k fits int_lo;
        # scale's r fits (int_hi, int_lo)
        int_hi, int_lo = _fp_int(ys, lambda i, w: src_r[i, 3 + w], nb,
                                 centered or mode == "scale")

        # limb contraction per destination modulus: raw 64-bit
        # accumulation (k * q * theta < 2^64 for k <= 16, q,theta < 2^30)
        for j in range(kd):
            d = dst_r[j, 0]
            mu = dst_r[j, 1]
            s1 = dst_r[j, 2]
            c32 = dst_r[j, 3]
            c32_sh = dst_r[j, 4]
            ahi = jnp.zeros((nb,), U32)
            alo = jnp.zeros((nb,), U32)
            for i in range(ks):
                hi, lo = _mul32(ys[i], mat_r[i, j])
                ahi, alo = _addc(ahi, alo, lo)
                ahi = ahi + hi
            acc = _reduce64(ahi, alo, d, mu, s1, c32, c32_sh)
            if mode == "convert":
                # corr = alpha * (C mod d);  alpha = int_lo < k
                chi, clo = _mul32(int_lo, dst_r[j, 5])
                corr = _reduce64(chi, clo, d, mu, s1, c32, c32_sh)
                r = acc + d - corr
                r = _norm2q(r, d)
            else:
                # r_int = int_hi*2^32 + int_lo, reduced mod d
                rint = _reduce64(int_hi, int_lo, d, mu, s1, c32,
                                 c32_sh)
                r = _norm2q(acc + rint, d)
            o_r[0, (ks + j) if include_src else j] = r

    return kernel


def _pack_src(base) -> np.ndarray:
    """[ks, 8] u32: q, inv_punc, inv_punc_sh, 4 fixed-point words (LSW
    first) — which words depends on the op; filled by callers."""
    ks = base.k
    out = np.zeros((ks, 8), np.uint32)
    out[:, 0] = np.asarray(base.q_dev, np.uint64).astype(np.uint32)
    out[:, 1] = np.asarray(base.inv_punc_dev).astype(np.uint32)
    out[:, 2] = np.asarray(base.inv_punc_shoup_dev).astype(np.uint32)
    return out


def _fp_words(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """u64 (hi, lo) pairs -> [k, 4] u32 words, least significant first."""
    k = hi.shape[0]
    out = np.empty((k, 4), np.uint32)
    out[:, 0] = (lo & 0xFFFFFFFF).astype(np.uint32)
    out[:, 1] = (lo >> np.uint64(32)).astype(np.uint32)
    out[:, 2] = (hi & 0xFFFFFFFF).astype(np.uint32)
    out[:, 3] = (hi >> np.uint64(32)).astype(np.uint32)
    return out


def _pack_dst(base, w0: np.ndarray | None) -> np.ndarray:
    """[kd, 8] u32: d, mu, s1, c32, c32_sh, w0, w0_sh, 0."""
    kd = base.k
    out = np.zeros((kd, 8), np.uint32)
    for j, d in enumerate(base.moduli):
        mu, s1 = m.barrett32_consts(d)
        c32 = (1 << 32) % d
        out[j, :5] = (d, mu, s1, c32, m.shoup_ratio32(c32, d))
        if w0 is not None:
            out[j, 5] = int(w0[j])
            out[j, 6] = m.shoup_ratio32(int(w0[j]), d)
    return out


class FusedRnsOp:
    """One fused conversion (convert or scale) between two u32 bases."""

    def __init__(self, src, dst, mode: str, centered: bool,
                 mat: np.ndarray, fp_hi, fp_lo,
                 w0: np.ndarray | None = None):
        assert mode in ("convert", "scale")
        self.ks, self.kd = src.k, dst.k
        self.mode, self.centered = mode, centered
        # NUMPY attributes, converted per-trace in __call__: ops are
        # built lazily, possibly while an OUTER jit is tracing — a jnp
        # constant created here would be cached as a leaked tracer
        # (CLAUDE.md round-2 gotcha).
        self.src_c = self._with_fp(_pack_src(src), fp_hi, fp_lo)
        self.dst_c = _pack_dst(dst, w0)
        # raw 64-bit limb accumulation needs no per-entry shoup ratios
        self.mat = mat.astype(np.uint32)

    @staticmethod
    def _with_fp(src_c, fp_hi, fp_lo):
        src_c[:, 3:7] = _fp_words(np.asarray(fp_hi, np.uint64),
                                  np.asarray(fp_lo, np.uint64))
        return src_c

    @partial(jax.jit, static_argnames=("self", "include_src"))
    def __call__(self, x, include_src: bool = False):
        """x [..., ks, N] u32 -> [..., kd, N] u32; include_src ->
        [..., ks+kd, N] with the raw source limbs first (the fused
        base-extension output, no XLA concat)."""
        lead = x.shape[:-2]
        n = x.shape[-1]
        rows = 1
        for d in lead:
            rows *= d
        xr = x.reshape(rows, self.ks, n)
        nb = min(_NB, n)
        assert n % nb == 0
        interp = jax.default_backend() == "cpu"
        kern = _rns_kernel(self.ks, self.kd, self.mode, self.centered,
                           nb, include_src)
        ko = self.ks + self.kd if include_src else self.kd

        def imap_x(r, c):
            return (r, jnp.int32(0), c)

        def imap_const(r, c):
            return (jnp.int32(0), jnp.int32(0))

        out = pl.pallas_call(
            kern,
            grid=(rows, n // nb),
            in_specs=[
                pl.BlockSpec((self.ks, 8), imap_const,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((self.kd, 8), imap_const,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((self.ks, self.kd), imap_const,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, self.ks, nb), imap_x,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, ko, nb), imap_x,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, ko, n), U32),
            interpret=interp,
        )(jnp.asarray(self.src_c), jnp.asarray(self.dst_c),
          jnp.asarray(self.mat), xr)
        return out.reshape(*lead, ko, n)


def _mod_consts(moduli) -> np.ndarray:
    out = np.zeros((len(moduli), 8), np.uint32)
    for j, q in enumerate(moduli):
        mu, s1 = m.barrett32_consts(q)
        c32 = (1 << 32) % q
        out[j, :5] = (q, mu, s1, c32, m.shoup_ratio32(c32, q))
    return out


class FusedTensor3:
    """BFV tensor convolution of two 2-component NTT-domain operands in
    one pass: out = (a0*b0, a0*b1 + a1*b0, a1*b1) mod q per limb
    (the component loop in `bfv.ops.multiply`)."""

    def __init__(self, moduli):
        self.k = len(moduli)
        self.consts = _mod_consts(moduli)  # numpy (lazy-build safety)

    @partial(jax.jit, static_argnames=("self",))
    def __call__(self, a, b):
        """a, b: [..., 2, k, N] u32 -> [..., 3, k, N]."""
        lead = a.shape[:-3]
        n = a.shape[-1]
        rows = 1
        for d in lead:
            rows *= d
        k = self.k
        ar = a.reshape(rows, 2, k, n)
        br = b.reshape(rows, 2, k, n)
        nb = min(_NB, n)
        assert n % nb == 0

        def kernel(c_r, a_r, b_r, o_r):
            for j in range(k):
                q = c_r[j, 0]
                cs = tuple(c_r[j, i] for i in range(1, 5))
                a0, a1 = a_r[0, 0, j], a_r[0, 1, j]
                b0, b1 = b_r[0, 0, j], b_r[0, 1, j]

                def red(hi, lo, q=q, cs=cs):
                    return _reduce64(hi, lo, q, *cs)

                h0, l0 = _mul32(a0, b0)
                o_r[0, 0, j] = red(h0, l0)
                h1, l1 = _mul32(a0, b1)
                h2, l2 = _mul32(a1, b0)
                hs, ls = _addc(h1 + h2, l1, l2)
                o_r[0, 1, j] = red(hs, ls)
                h3, l3 = _mul32(a1, b1)
                o_r[0, 2, j] = red(h3, l3)

        def imap(r, c):
            return (r, jnp.int32(0), jnp.int32(0), c)

        def imap_const(r, c):
            return (jnp.int32(0), jnp.int32(0))

        out = pl.pallas_call(
            kernel,
            grid=(rows, n // nb),
            in_specs=[
                pl.BlockSpec((k, 8), imap_const,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 2, k, nb), imap,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, k, nb), imap,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 3, k, nb), imap,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 3, k, n), U32),
            interpret=jax.default_backend() == "cpu",
        )(jnp.asarray(self.consts), ar, br)
        return out.reshape(*lead, 3, k, n)


class FusedKsInner:
    """Keyswitch inner products in one pass: for both key components,
    acc_j = (sum_i d_hat[i, j] * key[i, j]) mod q_j — the digit-axis
    contraction of `bfv.ops.keyswitch` (raw 64-bit accumulation:
    k * q^2 < 2^64 for k <= 16, q < 2^30)."""

    def __init__(self, moduli):
        self.kk = len(moduli)
        self.consts = _mod_consts(moduli)  # numpy (lazy-build safety)

    @partial(jax.jit, static_argnames=("self",))
    def __call__(self, d_hat, k0, k1):
        """d_hat: [..., k, kk, N]; k0/k1: [k, kk, N] ->
        [..., 2, kk, N] (both key components stacked in ONE output, so
        the downstream inverse NTT needs no XLA stack pass)."""
        lead = d_hat.shape[:-3]
        kdig = d_hat.shape[-3]
        n = d_hat.shape[-1]
        rows = 1
        for d in lead:
            rows *= d
        kk = self.kk
        dr = d_hat.reshape(rows, kdig, kk, n)
        nb = min(_NB, n)
        assert n % nb == 0

        def kernel(c_r, d_r, k0_r, k1_r, o_r):
            for j in range(kk):
                q = c_r[j, 0]
                cs = tuple(c_r[j, i] for i in range(1, 5))
                for comp, kr in ((0, k0_r), (1, k1_r)):
                    ahi = jnp.zeros((nb,), U32)
                    alo = jnp.zeros((nb,), U32)
                    for i in range(kdig):
                        hi, lo = _mul32(d_r[0, i, j], kr[i, j])
                        ahi, alo = _addc(ahi, alo, lo)
                        ahi = ahi + hi
                    o_r[0, comp, j] = _reduce64(ahi, alo, q, *cs)

        def imap_d(r, c):
            return (r, jnp.int32(0), jnp.int32(0), c)

        def imap_key(r, c):
            return (jnp.int32(0), jnp.int32(0), c)

        def imap_const(r, c):
            return (jnp.int32(0), jnp.int32(0))

        out = pl.pallas_call(
            kernel,
            grid=(rows, n // nb),
            in_specs=[
                pl.BlockSpec((kk, 8), imap_const,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, kdig, kk, nb), imap_d,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kdig, kk, nb), imap_key,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((kdig, kk, nb), imap_key,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 2, kk, nb), imap_d,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 2, kk, n), U32),
            interpret=jax.default_backend() == "cpu",
        )(jnp.asarray(self.consts), dr, k0, k1)
        return out.reshape(*lead, 2, kk, n)


class FusedModDown:
    """One-pass special-prime rescale (rns.ModDown for the u32 engine):
    xp' = xp + p/2 mod p; out_j = (x_j + (p/2 mod q_j) - xp' mod q_j)
    * p^{-1} mod q_j."""

    def __init__(self, md):
        qb = md.q_base
        self.k = qb.k
        # convert WHOLE arrays to numpy before indexing: a jnp getitem
        # executed while an outer jit is tracing lifts the constant
        # into the trace (CLAUDE.md round-2 gotcha)
        half_mod_q = np.asarray(md.half_mod_q)
        inv_p = np.asarray(md.inv_p)
        inv_p_sh = np.asarray(md.inv_p_sh)
        c = np.zeros((qb.k, 8), np.uint32)
        for j, q in enumerate(qb.moduli):
            mu, s1 = m.barrett32_consts(q)
            c[j] = (q, mu, s1, int(half_mod_q[j]), int(inv_p[j]),
                    int(inv_p_sh[j]), 0, 0)
        self.consts = c  # numpy (lazy-build safety)
        p = int(md.p_dev)
        mu_p, s1_p = m.barrett32_consts(p)
        self.p_consts = np.array(
            [[p, mu_p, s1_p, p >> 1, 0, 0, 0, 0]], np.uint32)

    @partial(jax.jit, static_argnames=("self",))
    def __call__(self, x_q, x_p):
        lead = x_q.shape[:-2]
        n = x_q.shape[-1]
        rows = 1
        for d in lead:
            rows *= d
        xq = x_q.reshape(rows, self.k, n)
        xp = x_p.reshape(rows, 1, n)
        nb = min(_NB, n)
        assert n % nb == 0
        k = self.k

        def kernel(c_r, pc_r, xq_r, xp_r, o_r):
            p = pc_r[0, 0]
            mu_p = pc_r[0, 1]
            s1_p = pc_r[0, 2]
            half = pc_r[0, 3]
            v = xp_r[0, 0] + half
            v = jnp.where(v >= p, v - p, v)
            for j in range(k):
                q = c_r[j, 0]
                mu = c_r[j, 1]
                s1 = c_r[j, 2]
                xpj = _reduce32(v, q, mu, s1)
                num = xq_r[0, j] + c_r[j, 3]
                num = jnp.where(num >= q, num - q, num)
                num = num + q - xpj
                num = jnp.where(num >= q, num - q, num)
                o_r[0, j] = _norm2q(
                    _shoup2q(num, c_r[j, 4], c_r[j, 5], q), q)
            del mu_p, s1_p

        def imap_x(r, c):
            return (r, jnp.int32(0), c)

        def imap_const(r, c):
            return (jnp.int32(0), jnp.int32(0))

        out = pl.pallas_call(
            kernel,
            grid=(rows, n // nb),
            in_specs=[
                pl.BlockSpec((k, 8), imap_const,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8), imap_const,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, k, nb), imap_x,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nb), imap_x,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, k, nb), imap_x,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, k, n), U32),
            interpret=jax.default_backend() == "cpu",
        )(jnp.asarray(self.consts), jnp.asarray(self.p_consts), xq, xp)
        return out.reshape(*lead, self.k, n)


class FusedScaleConvert:
    """Scale-and-round (base Q∪B -> B) CHAINED with the centered base
    conversion (B -> Q) in one VMEM pass: out = [round(t*x/Q)]_Q for x
    in the tensor base. The scaled-aux intermediate of
    `bfv.ops.multiply` never exists in HBM. Bit-exact composition of
    `rns.ScaleAndRound.apply` + `rns.BaseConverter.convert(centered=
    True)` (pinned by tests/test_prns.py)."""

    def __init__(self, sc, conv):
        assert sc.dst.moduli == conv.src.moduli
        self.ks, self.km, self.kd = sc.src.k, sc.dst.k, conv.dst.k
        # numpy attributes only (lazy-build safety, see FusedRnsOp)
        a_c = _pack_src(sc.src)
        a_c[:, 3:7] = _fp_words(np.asarray(sc.phi_hi, np.uint64),
                                np.asarray(sc.phi_lo, np.uint64))
        self.a_c = a_c
        b = conv.src
        b_c = np.zeros((self.km, 16), np.uint32)
        for j, q in enumerate(b.moduli):
            mu, s1 = m.barrett32_consts(q)
            c32 = (1 << 32) % q
            b_c[j, :5] = (q, mu, s1, c32, m.shoup_ratio32(c32, q))
        b_c[:, 5] = np.asarray(b.inv_punc_dev).astype(np.uint32)
        b_c[:, 6] = np.asarray(b.inv_punc_shoup_dev).astype(np.uint32)
        b_c[:, 8:12] = _fp_words(np.asarray(b.inv_q_fp_hi, np.uint64),
                                 np.asarray(b.inv_q_fp_lo, np.uint64))
        self.b_c = b_c
        self.d_c = _pack_dst(conv.dst,
                             np.asarray(conv.c_mod_d, np.uint64))
        self.omega = np.asarray(sc.omega, np.uint64).astype(np.uint32)
        self.theta = np.asarray(conv.theta, np.uint64).astype(np.uint32)

    @partial(jax.jit, static_argnames=("self",))
    def __call__(self, x):
        """x [..., ks, N] u32 (tensor base Q∪B) -> [..., kd, N] u32
        (base Q)."""
        ks, km, kd = self.ks, self.km, self.kd
        lead = x.shape[:-2]
        n = x.shape[-1]
        rows = 1
        for d in lead:
            rows *= d
        xr = x.reshape(rows, ks, n)
        nb = min(_NB, n)
        assert n % nb == 0

        def kernel(a_r, b_r, d_r, om_r, th_r, x_r, o_r):
            # -- scale: y_i = normalize(x_i); s_j over B ------------------
            ys = []
            for i in range(ks):
                q = a_r[i, 0]
                ys.append(_norm2q(
                    _shoup2q(x_r[0, i], a_r[i, 1], a_r[i, 2], q), q))
            ihi, ilo = _fp_int(ys, lambda i, w: a_r[i, 3 + w], nb, True)
            zs = []
            for j in range(km):
                d = b_r[j, 0]
                cs = tuple(b_r[j, i] for i in range(1, 5))
                ahi = jnp.zeros((nb,), U32)
                alo = jnp.zeros((nb,), U32)
                for i in range(ks):
                    hi, lo = _mul32(ys[i], om_r[i, j])
                    ahi, alo = _addc(ahi, alo, lo)
                    ahi = ahi + hi
                acc = _reduce64(ahi, alo, d, *cs)
                rint = _reduce64(ihi, ilo, d, *cs)
                s = _norm2q(acc + rint, d)
                # -- convert prologue: z_j = s_j * inv_punc_j mod b_j ----
                zs.append(_norm2q(
                    _shoup2q(s, b_r[j, 5], b_r[j, 6], d), d))
            # -- centered convert B -> Q --------------------------------
            _, alo2 = _fp_int(zs, lambda j, w: b_r[j, 8 + w], nb, True)
            for jq in range(kd):
                d = d_r[jq, 0]
                cs = tuple(d_r[jq, i] for i in range(1, 5))
                ahi = jnp.zeros((nb,), U32)
                alo = jnp.zeros((nb,), U32)
                for j in range(km):
                    hi, lo = _mul32(zs[j], th_r[j, jq])
                    ahi, alo = _addc(ahi, alo, lo)
                    ahi = ahi + hi
                acc = _reduce64(ahi, alo, d, *cs)
                chi, clo = _mul32(alo2, d_r[jq, 5])   # alpha < km
                corr = _reduce64(chi, clo, d, *cs)
                o_r[0, jq] = _norm2q(acc + d - corr, d)

        def imap_x(r, c):
            return (r, jnp.int32(0), c)

        def imap_const(r, c):
            return (jnp.int32(0), jnp.int32(0))

        out = pl.pallas_call(
            kernel,
            grid=(rows, n // nb),
            in_specs=[
                pl.BlockSpec((ks, 8), imap_const,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((km, 16), imap_const,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((kd, 8), imap_const,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((ks, km), imap_const,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((km, kd), imap_const,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, ks, nb), imap_x,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, kd, nb), imap_x,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, kd, n), U32),
            interpret=jax.default_backend() == "cpu",
        )(jnp.asarray(self.a_c), jnp.asarray(self.b_c),
          jnp.asarray(self.d_c), jnp.asarray(self.omega),
          jnp.asarray(self.theta), xr)
        return out.reshape(*lead, kd, n)


def fused_mod_down(md) -> FusedModDown:
    """Build the fused kernel for a `rns.ModDown` (u32 engine)."""
    return FusedModDown(md)


def fused_converter(conv) -> FusedRnsOp:
    """Build the fused kernel for a `rns.BaseConverter` (centered)."""
    src = conv.src
    theta = np.asarray(conv.theta, np.uint64).astype(np.uint32)
    c_mod_d = np.asarray(conv.c_mod_d, np.uint64)
    return FusedRnsOp(src, conv.dst, "convert", True, theta,
                      np.asarray(src.inv_q_fp_hi),
                      np.asarray(src.inv_q_fp_lo), w0=c_mod_d)


def fused_scaler(sc) -> FusedRnsOp:
    """Build the fused kernel for a `rns.ScaleAndRound`."""
    omega = np.asarray(sc.omega, np.uint64).astype(np.uint32)
    return FusedRnsOp(sc.src, sc.dst, "scale", False, omega,
                      np.asarray(sc.phi_hi), np.asarray(sc.phi_lo))
