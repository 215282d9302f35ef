"""MXU (matmul-based) negacyclic NTT: four-step decomposition with
exact u8-limb integer matmuls.

TPU-native alternative to the butterfly NTT in `math/ntt.py` (which
replaces SEAL's Harvey NTT — see `seal_fhe/SEAL` consumed at
`sunscreen_runtime/src/run.rs:166-336`). Rationale: on TPU the
butterfly form spends its time in emulated-u64 elementwise passes,
while the systolic MXU does 10^14+ int8 MACs/s. The four-step split
N = n1*n2 turns the transform into two small dense DFT matmuls plus a
single elementwise twiddle:

    X[j2 + n2*j1] = sum_{i1} w^{n2 i1 j1} * ( psi^{i1} w^{i1 j2} *
                     sum_{i2} psi^{n1 i2} w^{n1 i2 j2} x[i1 + n1*i2] )

with w = psi^2 the N-th root (negacyclic pre-twiddle psi^i FOLDED into
the step-1 matrix and the mid twiddle, so no separate elementwise
pass; same for psi^{-i}/N on the inverse).

Exactness: operands are split into 8-bit limbs by BITCASTING u64 ->
[..., 8] u8 (a relayout — measured 0.9 ms/6 MB for the shift-based
split on the v5e, ~90% of total runtime, vs ~0 for bitcast). Each limb
pair feeds an int8->int32 MXU matmul (partial sums < 255^2 * n1 <
2^25, no overflow), limb-weighted partials accumulate into a 128-bit
(hi, lo) pair via 32-bit-aligned slots, and one Barrett-128 per
element reduces mod q. Outputs are NATURAL order (no bit-reversal) —
the NTT-domain layout differs from `NttPlan`'s bit-reversed
convention, so a context must use one plan kind consistently
(ciphertexts at rest are coefficient-domain, so this is a
process-local choice).

Bounds: q < 2^57 keeps the recombined value < n1*q^2 < q*2^64 (the
Barrett-128 precondition); the default 56-bit limb cap
(`bfv/params.py`) is inside.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.math import modular as m
from sunscreen_tpu.math import primes

U64 = jnp.uint64
I32 = jnp.int32


def _split_factors(n: int) -> tuple[int, int]:
    """n = n1 * n2 with n1 >= n2, both powers of two."""
    log = n.bit_length() - 1
    l1 = (log + 1) // 2
    n1 = 1 << l1
    return n1, n // n1


def _u8_limbs_host(mat: np.ndarray, n_limbs: int) -> np.ndarray:
    """[..., r, c] uint64 -> [n_limbs, ..., r, c] uint8 little-endian."""
    out = np.empty((n_limbs,) + mat.shape, dtype=np.uint8)
    for a in range(n_limbs):
        out[a] = (mat >> (8 * a)) & 0xFF
    return out


def _build_big(m_small: np.ndarray, n_limbs: int, wb: int) -> np.ndarray:
    """[k, n_in, n_out] u64 DFT matrix -> block-convolution operand
    [k, n_in*wb, n_c*n_out] u8 with big[:, i*wb + a, c*n_out + j] =
    byte_b(M[i, j]) where b = c - a (zero outside 0..nl-1; rows for
    byte indices a >= nl are zero). `wb` = engine word bytes (8 for the
    u64 engine, 4 for the u32 engine).

    The A side is bitcast word -> [..., n_in, wb] u8 and reshaped to a
    single fused contraction axis [..., n_in*wb] (a pure view — no
    strided byte slices), so ONE MXU einsum computes ALL
    limb-convolution partials P_c = sum_{a+b=c} A_a M_b. The earlier
    49-separate-dots form wrote 49 full-size i32 arrays through HBM
    (~390 B/element, the measured bottleneck).
    """
    k, n_in, n_out = m_small.shape
    limbs = _u8_limbs_host(m_small, n_limbs)          # [nl, k, n_in, n_out]
    n_c = 2 * n_limbs - 1
    big = np.zeros((k, n_in * wb, n_c * n_out), dtype=np.uint8)
    for a in range(min(n_limbs, wb)):
        for c in range(n_c):
            b = c - a
            if 0 <= b < n_limbs:
                big[:, a::wb, c * n_out:(c + 1) * n_out] = limbs[b]
    return big


def _mod_matmul(a_word, m_big, q, r_hi, r_lo, n_limbs: int, n_out: int,
                spec: str, word):
    """Exact modular matrix transform on the MXU with NO explicit
    transposes: `spec` is an einsum over the bitcast operand
    `a8[..., k, <x>, <y>, l]` and `m_big[k, n_in, 8, n_c*n_out]`,
    contracting the transform axis together with the byte axis `l` and
    emitting output dims in whatever order the NEXT stage wants (the
    MXU absorbs the data reordering that u64 transposes — measured
    ~0.7 ms/6 MB on the v5e — would otherwise cost).

    The output's `p` dim (size n_c*n_out) is reshaped to (n_c, n_out)
    and the limb-convolution partials P_c (exact in int32: partial sums
    < n_in * nl * 255^2 < 2^31) recombine into a 128-bit (hi, lo) pair
    via 32-bit-aligned slots, then one Barrett-128 per element.
    """
    n_c = 2 * n_limbs - 1
    a8 = jax.lax.bitcast_convert_type(a_word, jnp.uint8)
    wb = a8.shape[-1] if a_word.ndim < a8.ndim else 8
    mb = m_big.reshape(m_big.shape[0], m_big.shape[1] // wb, wb,
                       m_big.shape[2])
    p = jnp.einsum(spec, a8, mb, preferred_element_type=I32)
    # `p` has the n_c*n_out axis at position -2 (specs emit "...p<f>")
    # or -1 (specs emit "...<f>p")
    p_axis = -2 if spec.endswith(("pj", "pi")) else -1
    if p_axis == -2:
        pp = p.reshape(*p.shape[:-2], n_c, n_out, p.shape[-1])
        c_index = lambda c: pp[..., c, :, :]   # noqa: E731
    else:
        pp = p.reshape(*p.shape[:-1], n_c, n_out)
        c_index = lambda c: pp[..., c, :]      # noqa: E731
    slots = [None] * 4
    for c in range(n_c):
        s, sh = divmod(8 * c, 32)
        term = c_index(c).astype(U64) << U64(sh)
        slots[s] = term if slots[s] is None else slots[s] + term
    zero = jnp.zeros(slots[0].shape, U64)
    slots = [zero if s is None else s for s in slots]
    # y = slot0 + slot1*2^32 + slot2*2^64 + slot3*2^96, exact: each
    # slot < 2^55 (<=4 terms each < 2^(27+24)) and slot3 < y/2^96 < 2^25.
    lo = slots[0] + ((slots[1] & U64(0xFFFFFFFF)) << U64(32))
    carry = jnp.where(lo < slots[0], U64(1), U64(0))
    hi = (slots[1] >> U64(32)) + carry + slots[2] + (slots[3] << U64(32))
    return m.barrett_reduce_128(hi, lo, q, r_hi, r_lo).astype(word)


class MatmulNttPlan:
    """Negacyclic NTT over RNS limb stacks via MXU matmuls.

    Same call surface as `ntt.NttPlan` (fwd/inv/pointwise_mul/
    negacyclic_mul on [..., k, N]); NTT domain is natural-order.
    """

    mode = "matmul"

    def __init__(self, n: int, moduli: tuple[int, ...]):
        assert n & (n - 1) == 0
        self.n = n
        self.moduli = tuple(moduli)
        k = len(moduli)
        n1, n2 = _split_factors(n)
        self.n1, self.n2 = n1, n2
        max_bits = max(q.bit_length() for q in moduli)
        assert max_bits <= 57, "q too large for exact u8-limb matmul"
        nl = (max_bits + 7) // 8
        self.n_limbs = nl
        self.word = m.word_dtype_for(moduli)
        wnp = np.uint32 if self.word == m.U32 else np.uint64
        self.word_bytes = 4 if self.word == m.U32 else 8

        tw1 = np.empty((k, n1, n2), dtype=wnp)
        tw1_sh = np.empty((k, n1, n2), dtype=wnp)
        itw1 = np.empty((k, n1, n2), dtype=wnp)
        itw1_sh = np.empty((k, n1, n2), dtype=wnp)
        m2 = np.empty((k, n2, n2), dtype=np.uint64)
        m1 = np.empty((k, n1, n1), dtype=np.uint64)
        im2 = np.empty((k, n2, n2), dtype=np.uint64)
        im1 = np.empty((k, n1, n1), dtype=np.uint64)
        ratio_hi = np.empty((k,), dtype=np.uint64)
        ratio_lo = np.empty((k,), dtype=np.uint64)

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
            # step-1 matrix with the psi^(n1*i2) pre-twiddle folded in:
            # M2'[i2, j2] = psi^(n1 i2) * w^(n1 i2 j2)
            m2[j] = _vandermonde(w_n1, n2, q, row_scale_base=psi_n1)
            # inverse final matrix with psi^(-n1*i2)/N folded in:
            # iM2'[j2, i2] = ninv * ipsi^(n1 i2) * iw^(n1 i2 j2)
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
            tw1_sh[j] = _shoup_arr(tw1[j], q, self.word)
            itw1_sh[j] = _shoup_arr(itw1[j], q, self.word)
            rh, rl = m.barrett_ratio(q)
            ratio_hi[j] = rh
            ratio_lo[j] = rl

        wb = self.word_bytes
        self.q = jnp.asarray(np.array(moduli, dtype=wnp))
        self.q64 = jnp.asarray(np.array(moduli, dtype=np.uint64))
        self.tw1 = jnp.asarray(tw1)
        self.tw1_sh = jnp.asarray(tw1_sh)
        self.itw1 = jnp.asarray(itw1)
        self.itw1_sh = jnp.asarray(itw1_sh)
        self.m2_big = jnp.asarray(_build_big(m2, nl, wb))
        self.m1_big = jnp.asarray(_build_big(m1, nl, wb))
        self.im2_big = jnp.asarray(_build_big(im2, nl, wb))
        self.im1_big = jnp.asarray(_build_big(im1, nl, wb))
        self.ratio_hi = jnp.asarray(ratio_hi)
        self.ratio_lo = jnp.asarray(ratio_lo)
        consts = [m.w_consts_host(q, self.word) for q in moduli]
        self.c0 = jnp.asarray(np.array([c[0] for c in consts], dtype=wnp))
        self.c1 = jnp.asarray(np.array([c[1] for c in consts], dtype=wnp))

    # -- helpers -------------------------------------------------------------

    def _q3(self):
        """u64 Barrett views for the 128-bit recombination."""
        k = len(self.moduli)
        return (self.q64.reshape(k, 1, 1), self.ratio_hi.reshape(k, 1, 1),
                self.ratio_lo.reshape(k, 1, 1))

    def _qw3(self):
        """Word views for the Shoup twiddle pass."""
        k = len(self.moduli)
        return self.q.reshape(k, 1, 1)

    def _tw(self, x, w, w_sh, q):
        return m.reduce_2q(m.w_shoup_mul(x, w, w_sh, q), q)

    # -- transforms ----------------------------------------------------------

    def fwd(self, x):
        """[..., k, N] natural coeff order -> NTT domain.

        NTT-domain layout: X'[j2 + n2*j1] = DFT[j2 + n2*j1] — i.e.
        natural evaluation order laid out as [j1, j2] (opaque to
        consumers: only pointwise ops touch the domain, `inv` undoes
        it). No explicit transposes: the initial reshape views x as
        [i2, i1] and step 1 contracts i2 (the MAJOR axis) directly."""
        n, n1, n2 = self.n, self.n1, self.n2
        x = x.astype(self.word)   # byte split is word-width-dependent
        a = x.reshape(*x.shape[:-1], n2, n1)          # [i2, i1]
        q3, rh3, rl3 = self._q3()
        # Y[i1, j2] = sum_{i2} A[i2, i1] M2'[i2, j2]
        y = _mod_matmul(a, self.m2_big, q3, rh3, rl3, self.n_limbs, n2,
                        spec="...kjil,kjlp->...kip",
                        word=self.word)               # [i1, (c,j2)]
        y = self._tw(y, self.tw1, self.tw1_sh, self._qw3())  # [i1, j2]
        # Z[j1, j2] = sum_{i1} M1[j1, i1] Y[i1, j2]
        z = _mod_matmul(y, self.m1_big, q3, rh3, rl3, self.n_limbs, n1,
                        spec="...kijl,kilp->...kpj",
                        word=self.word)               # [(c,j1), j2]
        return z.reshape(*z.shape[:-2], n)

    def inv(self, x):
        """NTT domain (see `fwd`) -> [..., k, N] natural coeff order."""
        n, n1, n2 = self.n, self.n1, self.n2
        x = x.astype(self.word)   # byte split is word-width-dependent
        z = x.reshape(*x.shape[:-1], n1, n2)          # [j1, j2]
        q3, rh3, rl3 = self._q3()
        # U[i1, j2] = sum_{j1} iM1[i1, j1] Z[j1, j2]
        u = _mod_matmul(z, self.im1_big, q3, rh3, rl3, self.n_limbs, n1,
                        spec="...kijl,kilp->...kpj",
                        word=self.word)               # [(c,i1), j2]
        u = self._tw(u, self.itw1, self.itw1_sh, self._qw3())  # [i1, j2]
        # V[i2, i1] = sum_{j2} U[i1, j2] iM2'[j2, i2]  (emitted
        # transposed so the final reshape is the natural coeff order)
        v = _mod_matmul(u, self.im2_big, q3, rh3, rl3, self.n_limbs, n2,
                        spec="...kijl,kjlp->...kpi",
                        word=self.word)               # [(c,i2), i1]
        return v.reshape(*v.shape[:-2], n)

    # -- pointwise helpers ---------------------------------------------------

    def pointwise_mul(self, a, b):
        """Exact (a * b) mod q per limb on NTT-domain arrays [..., k, N]."""
        k = len(self.moduli)
        return m.w_mul_mod(a, b, self.q.reshape(k, 1),
                           self.c0.reshape(k, 1),
                           self.c1.reshape(k, 1))

    def negacyclic_mul(self, a, b):
        """Full negacyclic polynomial product of coefficient-domain
        inputs."""
        return self.inv(self.pointwise_mul(self.fwd(a), self.fwd(b)))


def _shoup_arr(ws: np.ndarray, q: int, word) -> np.ndarray:
    flat = ws.reshape(-1)
    wnp = np.uint32 if word == m.U32 else np.uint64
    out = np.array([m.w_shoup_host(int(w), q, word) for w in flat],
                   dtype=wnp)
    return out.reshape(ws.shape)


def _vandermonde(root: int, size: int, q: int, row_scale_base: int = 1,
                 scale_all: int = 1) -> np.ndarray:
    """V[a, b] = scale_all * row_scale_base^a * root^(a*b) mod q."""
    out = np.empty((size, size), dtype=np.uint64)
    scale = scale_all % q
    for a in range(size):
        step = pow(root, a, q)
        acc = scale
        for b in range(size):
            out[a, b] = acc
            acc = acc * step % q
        scale = scale * row_scale_base % q
    return out


@lru_cache(maxsize=64)
def get_plan(n: int, moduli: tuple[int, ...]) -> MatmulNttPlan:
    return MatmulNttPlan(n, moduli)
