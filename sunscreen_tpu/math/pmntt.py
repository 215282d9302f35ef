"""Fused MXU+VPU negacyclic NTT for the u32 engine (moduli < 2^30).

The round-3 perf probes (benchmarks/PERF_NOTES.md) established on the
v5e:

- XLA-level int8 einsums for the four-step DFT ran at only ~10 TMAC/s
  with 150-450 s compiles, while the IDENTICAL dot issued from inside a
  Pallas kernel runs at ~400 TMAC/s (u8) with sub-second compiles;
- the i32-diagonal recombination costs ~6-10 VPU ops per element, so it
  must happen while the partials are still in VMEM — the staged form
  (einsum -> HBM -> kernel) paid an extra 154 MB round trip per stage
  and sublane-strided plane reads.

So each four-step stage is ONE Pallas kernel: the u8 byte-convolution
dot on the MXU feeds i32 diagonal partials that are recombined
(3-word accumulate + Shoup/Barrett mod-q + optional mid twiddle) in
the same VMEM residency. Reference replacement: SEAL's Harvey NTT
core (`seal_fhe/SEAL` engine consumed by every Evaluator op —
SURVEY.md §2.4).

Layout (N = n1 * 128, dup = 128/n1 so every stage is uniform):

  stage matrices are [k, 512, NC*128] u8: 512 contraction bytes
  (contracted dim x 4 word bytes, pairs of `dup` adjacent rows
  block-diagonally when the contracted dim is n1 < 128), NC*128 output
  lanes (c-major diagonal slices, each a 128-lane tile). Kernel blocks:
  x [bb, n1, 512] u8, out [bb, n1, 128] u32.

  fwd:  x[i1 + n1*i2]: transpose -> rows (r, i1), vectors (i2, byte)
        stage 1 -> flat (i1, j2), mid psi-twiddle fused
        transpose -> rows (r, j2-group), vectors (dup, i1, byte)
        stage 2 -> NTT domain flat (j2*n1 + j1)
  inv:  domain rows group dup j2's CONTIGUOUSLY (no entry transpose)
        stage A (contract j1) -> flat (j2, i1), inverse twiddle fused
        transpose; stage B (contract j2, psi^-1/N folded) ->
        flat (i1, i2) -> one last transpose to natural order.

All arithmetic exact: u8 byte-limb dots -> i32 diagonals
(512 * 255^2 < 2^25), recombined as a 3-word (h, m, l) u32 accumulator
(y < 2^74), reduced with Shoup multiplies by 2^64/2^32 mod q plus one
Barrett — validated against python-int oracles in tests/test_pmntt.py.
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
from sunscreen_tpu.math.mntt import _u8_limbs_host, _vandermonde

U32 = jnp.uint32
I32 = jnp.int32
LANES = 128
WB = 4          # u32 word bytes
NL = 4          # u8 limbs per word (moduli < 2^30 -> 4 bytes)
NC = 2 * NL - 1 # byte-convolution diagonals


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


def _recombine_body(read_c, q, mu, s1, c32, c32_sh, c64, c64_sh):
    """read_c(c) -> i32 diagonal partial c (any uniform shape). Planes
    read lazily so the live set stays small. Returns
    (sum_c P_c 2^(8c)) mod q as u32."""
    # (h, m, l) 3-word accumulator of y = sum P_c << 8c  (y < 2^74)
    l = read_c(0).astype(U32)
    mid = jnp.zeros_like(l)
    h = jnp.zeros_like(l)
    for c in range(1, NC):
        p = read_c(c).astype(U32)
        sh = 8 * c
        if sh < 32:
            a_l = p << jnp.uint32(sh)
            a_m = p >> jnp.uint32(32 - sh)
            nl_ = l + a_l
            cy = jnp.where(nl_ < l, jnp.uint32(1), jnp.uint32(0))
            l = nl_
            nm = mid + a_m + cy
            cy2 = jnp.where(nm < mid, jnp.uint32(1), jnp.uint32(0))
            mid = nm
            h = h + cy2
        else:
            a_m = p << jnp.uint32(sh - 32)
            a_h = p >> jnp.uint32(64 - sh)
            nm = mid + a_m
            cy2 = jnp.where(nm < mid, jnp.uint32(1), jnp.uint32(0))
            mid = nm
            h = h + cy2 + a_h
    # y mod q = (h*2^64 + mid*2^32 + l) mod q via two Shoup multiplies
    # by the constants (2^64 mod q), (2^32 mod q) plus one Barrett.
    r = (_norm2q(_shoup2q(h, c64, c64_sh, q), q)
         + _norm2q(_shoup2q(mid, c32, c32_sh, q), q)
         + _reduce32(l, q, mu, s1))
    q2 = q + q
    r = jnp.where(r >= q2, r - q2, r)
    return jnp.where(r >= q, r - q, r)


# ---------------------------------------------------------------------------
# fused stage kernel: MXU byte-convolution dot + recombine (+ twiddle)
# ---------------------------------------------------------------------------


def _make_stage(n: int, k: int, rows: int, bb: int, n1: int,
                twiddle: bool, interpret: bool):
    """pallas_call for one four-step stage. Inputs: consts [k, 8] SMEM;
    x [k*rows, n1, 512] u8; mat [k, 512, NC*128] u8; optional twiddle
    pair [k, n1, 128] u32. Output [k*rows, n1, 128] u32. Grid
    (limb, row-block); bb | rows."""
    rpb = rows // bb

    def kernel(*refs):
        if twiddle:
            consts_r, x_r, m_r, tw_r, twsh_r, o_r = refs
        else:
            consts_r, x_r, m_r, o_r = refs
            tw_r = twsh_r = None
        li = pl.program_id(0)
        q = consts_r[li, 0]
        mu = consts_r[li, 1]
        s1 = consts_r[li, 2]
        c32 = consts_r[li, 3]
        c32_sh = consts_r[li, 4]
        c64 = consts_r[li, 5]
        c64_sh = consts_r[li, 6]
        a = x_r[:].reshape(bb * n1, 512)
        p = jnp.dot(a, m_r[0], preferred_element_type=I32)
        r = _recombine_body(
            lambda c: p[:, c * LANES:(c + 1) * LANES],
            q, mu, s1, c32, c32_sh, c64, c64_sh)
        r = r.reshape(bb, n1, LANES)
        if twiddle:
            r = _norm2q(_shoup2q(r, tw_r[0], twsh_r[0], q), q)
        o_r[:] = r

    def imap_x(i, j):
        return (i * rpb + j, jnp.int32(0), jnp.int32(0))

    def imap_limb(i, j):
        return (i, jnp.int32(0), jnp.int32(0))

    def imap_consts(i, j):
        return (jnp.int32(0), jnp.int32(0))

    in_specs = [pl.BlockSpec((k, 8), imap_consts, memory_space=pltpu.SMEM),
                pl.BlockSpec((bb, n1, 512), imap_x,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 512, NC * LANES), imap_limb,
                             memory_space=pltpu.VMEM)]
    if twiddle:
        in_specs += [pl.BlockSpec((1, n1, LANES), imap_limb,
                                  memory_space=pltpu.VMEM)] * 2
    return pl.pallas_call(
        kernel,
        grid=(k, rpb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, n1, LANES), imap_x,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * rows, n1, LANES), U32),
        interpret=interpret,
    )


_INTERPRET = None


def _interpret() -> bool:
    global _INTERPRET
    if _INTERPRET is None:
        _INTERPRET = jax.default_backend() == "cpu"
    return _INTERPRET


def _pair_matrix(msmall: np.ndarray, n1: int, dup: int) -> np.ndarray:
    """[k, n1, n1] u64 DFT matrix -> block-diagonal paired byte operand
    [k, dup*n1*WB, NC*dup*n1]: rows (d, i, byte), cols (c, d, j); entry
    byte_{c-b}(M[i, j]) when the d's match, 0 otherwise."""
    k = msmall.shape[0]
    limbs = _u8_limbs_host(msmall, NL)          # [NL, k, n1, n1]
    out = np.zeros((k, dup, n1, WB, NC, dup, n1), np.uint8)
    for d in range(dup):
        for b in range(WB):
            for c in range(NC):
                lb = c - b
                if 0 <= lb < NL:
                    out[:, d, :, b, c, d, :] = limbs[lb]
    return out.reshape(k, dup * n1 * WB, NC * dup * n1)


class PallasMatmulNttPlan:
    """Negacyclic NTT over u32 RNS limb stacks: fused MXU-dot +
    recombination Pallas stages. Same call surface as the other plans
    (fwd/inv/pointwise_mul/negacyclic_mul on [..., k, N]); NTT domain
    is the plan-private flat (j2*n1 + j1) four-step order."""

    mode = "pallas"

    def __init__(self, n: int, moduli: tuple[int, ...]):
        assert n & (n - 1) == 0 and n >= 256, "pallas plan needs N >= 256"
        assert n <= 16384, "pallas plan pairs rows; N <= 16384"
        assert max(q.bit_length() for q in moduli) <= 30
        assert min(q.bit_length() for q in moduli) >= 17
        self.n = n
        self.moduli = tuple(moduli)
        self.word = U32
        k = len(moduli)
        n2 = LANES
        n1 = n // n2
        dup = LANES // n1 if n1 < LANES else 1
        self.n1, self.n2, self.dup = n1, n2, dup

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
            c64 = (1 << 64) % q
            consts[j] = (q, mu, s1, c32, m.shoup_ratio32(c32, q),
                         c64, m.shoup_ratio32(c64, q), 0)

        def byte_op(msrc, n_in):
            """[k, n_in, n_out] -> [k, n_in*WB, NC*n_out] (rows
            (i, byte), cols (c, j)) for the 128-wide stages."""
            limbs = _u8_limbs_host(msrc, NL)    # [NL, k, n_in, n_out]
            n_out = msrc.shape[2]
            out = np.zeros((k, n_in, WB, NC, n_out), np.uint8)
            for b in range(WB):
                for c in range(NC):
                    lb = c - b
                    if 0 <= lb < NL:
                        out[:, :, b, c, :] = limbs[lb]
            return out.reshape(k, n_in * WB, NC * n_out)

        self.s1_m = jnp.asarray(byte_op(m2, n2))
        self.s2_m = jnp.asarray(_pair_matrix(m1, n1, dup))
        self.iA_m = jnp.asarray(_pair_matrix(im1, n1, dup))
        self.iB_m = jnp.asarray(byte_op(im2, n2))

        def shoup_arr(arr):
            flat = arr.reshape(k, -1)
            return np.array(
                [[m.shoup_ratio32(int(x), int(qq)) for x in row]
                 for row, qq in zip(flat, moduli)],
                dtype=np.uint32).reshape(arr.shape)

        # fwd mid twiddle in the stage-1 output layout (i1, j2)
        self.tw_f = jnp.asarray(tw1)
        self.tw_f_sh = jnp.asarray(shoup_arr(tw1))
        # inverse mid twiddle in the stage-A output layout: row g,
        # lane (d, i1) corresponds to (i1, j2 = g*dup + d)
        itw_pair = np.empty((k, n1, LANES), np.uint32)
        for g in range(n1):
            for d in range(dup):
                for i1 in range(n1):
                    itw_pair[:, g, d * n1 + i1] = \
                        itw1[:, i1, g * dup + d]
        self.tw_i = jnp.asarray(itw_pair)
        self.tw_i_sh = jnp.asarray(shoup_arr(itw_pair))
        self.consts = jnp.asarray(consts)
        self.q = jnp.asarray(np.array(moduli, np.uint32))
        # generic (mu, s1) views for pointwise ops
        self.c0 = jnp.asarray(consts[:, 1].copy())
        self.c1 = jnp.asarray(consts[:, 2].copy())

    # -- stage dispatch ------------------------------------------------------

    def _bb(self, rows: int, target_bytes: int = 256 << 10) -> int:
        """Rows per block: the x block (bb * N bytes) target; the i32
        partial stack (bb * n1 * NC*128 * 4 = 7 * bb * N) dominates the
        kernel's VMEM so keep bb * N around 256 KB (~2 MB partials)."""
        row_bytes = self.n * 4
        b = max(1, min(rows, target_bytes // row_bytes))
        while rows % b:
            b -= 1
        return b

    @functools.partial(jax.jit, static_argnames=("self", "inverse"))
    def _transform(self, x, inverse: bool):
        """x [rows, k, N] -> [rows, k, N]. Internally k-major; u32 XLA
        transposes between stages (measured cheap) keep every kernel's
        contraction bytes adjacent and its c-slices 128-lane aligned."""
        rows, k, n = x.shape
        n1, n2, dup = self.n1, self.n2, self.dup
        bb = self._bb(rows)
        interp = _interpret()
        kr = k * rows

        def u8(v):
            return jax.lax.bitcast_convert_type(v, jnp.uint8).reshape(
                kr, n1, 512)

        if not inverse:
            # rows (r, i1), vectors (i2, byte)
            a = jnp.transpose(x.reshape(rows, k, n2, n1), (1, 0, 3, 2))
            f1 = _make_stage(n, k, rows, bb, n1, twiddle=True,
                             interpret=interp)
            y = f1(self.consts, u8(a), self.s1_m, self.tw_f,
                   self.tw_f_sh)                   # [kr, i1, j2]
            # rows (r, j2-group), vectors (d, i1, byte)
            yt = jnp.transpose(y, (0, 2, 1)).reshape(kr, n1, dup * n1)
            f2 = _make_stage(n, k, rows, bb, n1, twiddle=False,
                             interpret=interp)
            z = f2(self.consts, u8(yt), self.s2_m)  # flat (j2, j1)
            return jnp.transpose(z.reshape(k, rows, n), (1, 0, 2))

        # inverse: domain flat (j2*n1 + j1) — dup j2's are contiguous
        zz = jnp.transpose(x, (1, 0, 2)).reshape(kr, n1, dup * n1)
        fA = _make_stage(n, k, rows, bb, n1, twiddle=True,
                         interpret=interp)
        u = fA(self.consts, u8(zz), self.iA_m, self.tw_i,
               self.tw_i_sh)                       # flat (j2, i1)
        ut = jnp.transpose(u.reshape(kr, n2, n1), (0, 2, 1))
        fB = _make_stage(n, k, rows, bb, n1, twiddle=False,
                         interpret=interp)
        v = fB(self.consts, u8(ut), self.iB_m)     # flat (i1, i2)
        vt = jnp.transpose(v.reshape(kr, n1, n2), (0, 2, 1))
        return jnp.transpose(vt.reshape(k, rows, n), (1, 0, 2))

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

    def inv(self, x):
        """NTT domain -> [..., k, N] natural coefficient order."""
        return self._apply(x, inverse=True)

    # -- pointwise -----------------------------------------------------------

    def pointwise_mul(self, a, b):
        """Exact (a * b) mod q per limb on NTT-domain stacks [..., k, N]."""
        k = len(self.moduli)
        return m.w_mul_mod(a, b, self.q.reshape(k, 1),
                           self.c0.reshape(k, 1), self.c1.reshape(k, 1))

    def negacyclic_mul(self, a, b):
        return self.inv(self.pointwise_mul(self.fwd(a), self.fwd(b)))


@lru_cache(maxsize=64)
def get_plan(n: int, moduli: tuple[int, ...]) -> PallasMatmulNttPlan:
    return PallasMatmulNttPlan(n, moduli)
