"""Hybrid MXU/Pallas negacyclic NTT for the u32 engine (moduli < 2^30).

The round-3 perf probes (benchmarks/PERF_NOTES.md) pinned the per-poly
cost of each four-step lowering on the v5e:

- `mntt` (pure-XLA MXU): the int8 einsums run at 80-340 TMAC/s, but the
  u64 slot-recombination + Barrett-128 between them does NOT fuse
  (~30 unfused HBM passes) and dominates;
- `pntt` (pure-Pallas VPU): one HBM pass, but 13 butterfly stages of
  synthesized 32-bit multiplies run ~10x above the roofline;
- a Pallas u32 diagonal-recombination kernel runs AT the HBM roofline
  (0.35 us/poly, measured exact).

So this plan composes the fast halves: XLA einsums feed exact u8-limb
byte-convolution partials to the MXU (as `mntt`, reference replacement:
SEAL's Harvey NTT core, `seal_fhe/SEAL` engine consumed by every
Evaluator op — SURVEY.md §2.4), and a fused Pallas kernel performs the
i32-diagonal recombination, the mod-q Barrett reduction, and the
mid-twiddle Shoup multiply in ONE VMEM pass between them.

Layout choice: the split is n2 = 128 (LANES), n1 = N/128, so both
recombination kernels see full 128-lane tiles:

  fwd:  x[i1 + n1*i2] viewed [i2, i1]
        step 1: einsum over i2 -> [i1, (c, j2)]   (c inner, 128 lanes)
        recombine + psi/mid twiddle -> [i1, j2]
        step 2: einsum over i1 -> [(c, j1), j2]   (c outer, 128 lanes)
        recombine -> [j1, j2] -> NTT domain X[j2 + n2*j1]
  inv:  mirror, with 1/N folded into the final inverse matrix and the
        last recombine writing the [i2, i1] transpose in-kernel.

All arithmetic is exact: u8 byte-limbs -> int32 MXU partials
(n_in * 4 * 255^2 < 2^25 per diagonal), diagonals recombined as a
3-word (h, m, l) u32 accumulator (y < 2^74), reduced with Shoup
multiplies by 2^64 mod q / 2^32 mod q plus one Barrett — validated
against python-int oracles in tests/test_pmntt.py.
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
from sunscreen_tpu.math.mntt import _build_big, _vandermonde

U32 = jnp.uint32
I32 = jnp.int32
LANES = 128
WB = 4          # u32 word bytes
NL = 4          # u8 limbs per word (moduli < 2^30 -> 4 bytes)
NC = 2 * NL - 1 # byte-convolution diagonals


# ---------------------------------------------------------------------------
# in-kernel u32 primitives (shared shapes with math/pntt.py; traced)
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


# ---------------------------------------------------------------------------
# fused recombine (+ twiddle) kernel
# ---------------------------------------------------------------------------


def _recombine_body(view_c, q, mu, s1, c32, c32_sh, c64, c64_sh):
    """view_c: list of NC i32 planes [bb, G, 128] (diagonal partials).
    Returns (sum_c P_c 2^(8c)) mod q as u32 [bb, G, 128]."""
    P = [p.astype(U32) for p in view_c]
    # (h, m, l) 3-word accumulator of y = sum P_c << 8c  (y < 2^74)
    l = P[0]
    mid = jnp.zeros_like(l)
    h = jnp.zeros_like(l)
    for c in range(1, NC):
        sh = 8 * c
        if sh < 32:
            a_l = P[c] << jnp.uint32(sh)
            a_m = P[c] >> jnp.uint32(32 - sh)
            nl_ = l + a_l
            cy = jnp.where(nl_ < l, jnp.uint32(1), jnp.uint32(0))
            l = nl_
            nm = mid + a_m + cy
            cy2 = jnp.where(nm < mid, jnp.uint32(1), jnp.uint32(0))
            mid = nm
            h = h + cy2
        else:
            a_m = P[c] << jnp.uint32(sh - 32)
            a_h = P[c] >> jnp.uint32(64 - sh)
            nm = mid + a_m
            cy2 = jnp.where(nm < mid, jnp.uint32(1), jnp.uint32(0))
            mid = nm
            h = h + cy2 + a_h
    # y mod q = (h*2^64 + mid*2^32 + l) mod q via two Shoup multiplies
    # by the constants (2^64 mod q), (2^32 mod q) — valid for any u32
    # multiplicand — plus one Barrett for the low word.
    r = (_norm2q(_shoup2q(h, c64, c64_sh, q), q)
         + _norm2q(_shoup2q(mid, c32, c32_sh, q), q)
         + _reduce32(l, q, mu, s1))
    q2 = q + q
    r = jnp.where(r >= q2, r - q2, r)
    return jnp.where(r >= q, r - q, r)


def _make_recombine(n: int, k: int, rows: int, bb: int, twiddle: bool,
                    transpose_pair: tuple[int, int] | None,
                    interpret: bool):
    """pallas_call over flat diagonal stacks — the measured-at-roofline
    form (benchmarks/PERF_NOTES.md round-3 probes): input
    [k*rows, NC, n] i32 (c OUTERMOST of the tiled dims, so every
    diagonal plane is a contiguous sublane slab), output [k*rows, n]
    u32. Blocks span `bb` rows of ONE limb (requires bb | rows); the
    limb index is recovered from the grid position for the per-limb
    SMEM constants and twiddle block. `transpose_pair=(a, b)` reshapes
    the flat output row [n] as [a, b] and writes the [b, a] transpose
    (in-VMEM, for the NTT-domain/natural-order layouts)."""

    rpb = rows // bb  # row-blocks per limb; grid is (limb, row-block)
    # so the limb index is program_id(0) directly — in-kernel division
    # lowers through i64 `_where` selects that Mosaic cannot legalize
    # under x64 (CLAUDE.md round-2 gotcha).

    def kernel(*refs):
        if twiddle:
            consts_r, x_r, tw_r, twsh_r, o_r = refs
        else:
            consts_r, x_r, o_r = refs
            tw_r = twsh_r = None
        li = pl.program_id(0)
        q = consts_r[li, 0]
        mu = consts_r[li, 1]
        s1 = consts_r[li, 2]
        c32 = consts_r[li, 3]
        c32_sh = consts_r[li, 4]
        c64 = consts_r[li, 5]
        c64_sh = consts_r[li, 6]
        x = x_r[:]
        planes = [x[:, c] for c in range(NC)]
        r = _recombine_body(planes, q, mu, s1, c32, c32_sh, c64, c64_sh)
        if twiddle:
            # twiddle refs are full [k, n] arrays (a (1, n) block is not
            # Mosaic-tileable when k % 8 != 0); select the limb row here
            r = _norm2q(_shoup2q(r, tw_r[li, :], twsh_r[li, :], q), q)
        if transpose_pair is not None:
            a, b = transpose_pair
            r = jnp.swapaxes(r.reshape(bb, a, b), -1, -2).reshape(bb, n)
        o_r[:, 0, :] = r

    def imap_x(i, j):
        return (i * rpb + j, jnp.int32(0), jnp.int32(0))

    def imap_row(i, j):
        # output rows carry a unit middle axis so the block's last two
        # dims ((1, n)) equal the array's — a flat (bb<8, n) block is
        # not Mosaic-tileable
        return (i * rpb + j, jnp.int32(0), jnp.int32(0))

    def imap_consts(i, j):
        return (jnp.int32(0), jnp.int32(0))

    in_specs = [pl.BlockSpec((k, 8), imap_consts, memory_space=pltpu.SMEM),
                pl.BlockSpec((bb, NC, n), imap_x,
                             memory_space=pltpu.VMEM)]
    if twiddle:
        in_specs += [pl.BlockSpec((k, n), imap_consts,
                                  memory_space=pltpu.VMEM)] * 2
    call = pl.pallas_call(
        kernel,
        grid=(k, rpb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, 1, n), imap_row,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * rows, 1, n), U32),
        interpret=interpret,
    )

    def run(*args):
        return call(*args).reshape(k * rows, n)

    return run


_INTERPRET = None


def _interpret() -> bool:
    global _INTERPRET
    if _INTERPRET is None:
        _INTERPRET = jax.default_backend() == "cpu"
    return _INTERPRET


class PallasMatmulNttPlan:
    """Negacyclic NTT over u32 RNS limb stacks: MXU einsums + fused
    Pallas recombination. Same call surface as the other plans
    (fwd/inv/pointwise_mul/negacyclic_mul on [..., k, N]); NTT domain is
    the plan-private [j1, j2] four-step order.
    """

    mode = "pallas"

    def __init__(self, n: int, moduli: tuple[int, ...]):
        assert n & (n - 1) == 0 and n >= 256, "pallas plan needs N >= 256"
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
        tw1_sh = np.empty((k, n1, n2), dtype=np.uint32)
        itw1 = np.empty((k, n1, n2), dtype=np.uint32)
        itw1_sh = np.empty((k, n1, n2), dtype=np.uint32)
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
            # step-1 matrix with psi^(n1 i2) pre-twiddle folded in
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
            for arr, sh in ((tw1, tw1_sh), (itw1, itw1_sh)):
                flat = arr[j].reshape(-1)
                sh[j] = np.array(
                    [m.shoup_ratio32(int(x), q) for x in flat],
                    dtype=np.uint32).reshape(n1, n2)
            mu, s1 = m.barrett32_consts(q)
            c32 = (1 << 32) % q
            c64 = (1 << 64) % q
            consts[j] = (q, mu, s1, c32, m.shoup_ratio32(c32, q),
                         c64, m.shoup_ratio32(c64, q), 0)

        self.m2_big = jnp.asarray(
            _build_big(m2, NL, WB).reshape(k, n2, WB, NC * n2))
        self.m1_big = jnp.asarray(
            _build_big(m1, NL, WB).reshape(k, n1, WB, NC * n1))
        self.im2_big = jnp.asarray(
            _build_big(im2, NL, WB).reshape(k, n2, WB, NC * n2))
        self.im1_big = jnp.asarray(
            _build_big(im1, NL, WB).reshape(k, n1, WB, NC * n1))
        # twiddles stored in the FLAT layouts their consumers see:
        # fwd stage-A output is flat (j2*n1 + i1), inv's is (i1*n2 + j2)
        self.tw_f = jnp.asarray(
            np.transpose(tw1, (0, 2, 1)).reshape(k, n).copy())
        self.tw_f_sh = jnp.asarray(
            np.transpose(tw1_sh, (0, 2, 1)).reshape(k, n).copy())
        self.tw_i = jnp.asarray(itw1.reshape(k, n))
        self.tw_i_sh = jnp.asarray(itw1_sh.reshape(k, n))
        self.consts = jnp.asarray(consts)
        self.q = jnp.asarray(np.array(moduli, np.uint32))
        # generic (mu, s1) views for pointwise ops
        self.c0 = jnp.asarray(consts[:, 1].copy())
        self.c1 = jnp.asarray(consts[:, 2].copy())

    # -- recombine dispatch --------------------------------------------------

    # 2 MB input blocks (8 rows at N=8192) matched the HBM roofline in
    # the round-3 probes; blocks must stay within one limb (bb | rows)
    # so the per-limb constants are uniform per grid step.
    def _bb(self, rows: int, target_bytes: int = 2 << 20) -> int:
        row_bytes = NC * self.n * 4
        b = max(1, min(rows, target_bytes // row_bytes))
        while rows % b:
            b -= 1
        return b

    @functools.partial(jax.jit, static_argnames=("self", "inverse"))
    def _transform(self, x, inverse: bool):
        """x [rows, k, N] -> [rows, k, N].

        Internally k-major so every einsum is a clean batched matmul
        with ADJACENT (contract, byte) axes — the non-adjacent forms
        measured 10-20x slower (XLA relayouts the whole byte tensor) —
        and every einsum output reshapes for free into the
        [k*rows, NC, N] flat c-outer stack the recombine kernel
        consumes at HBM roofline. NTT domain: flat (j2*n1 + j1)."""
        rows, k, n = x.shape
        n1, n2 = self.n1, self.n2
        bb = self._bb(rows)
        interp = _interpret()

        if not inverse:
            # [r, k, (i2, i1)] -> [k, r, i1, i2]
            a = jnp.transpose(x.reshape(rows, k, n2, n1), (1, 0, 3, 2))
            a8 = jax.lax.bitcast_convert_type(a, jnp.uint8)
            p1 = jnp.einsum("krijl,kjlp->krpi", a8, self.m2_big,
                            preferred_element_type=I32)  # [(c, j2), i1]
            f1 = _make_recombine(n, k, rows, bb, twiddle=True,
                                 transpose_pair=None, interpret=interp)
            y = f1(self.consts, p1.reshape(k * rows, NC, n),
                   self.tw_f, self.tw_f_sh)              # flat (j2, i1)
            y8 = jax.lax.bitcast_convert_type(
                y.reshape(k, rows, n2, n1), jnp.uint8)
            p2 = jnp.einsum("krjil,kilp->krpj", y8, self.m1_big,
                            preferred_element_type=I32)  # [(c, j1), j2]
            f2 = _make_recombine(n, k, rows, bb, twiddle=False,
                                 transpose_pair=(n1, n2),
                                 interpret=interp)
            z = f2(self.consts, p2.reshape(k * rows, NC, n))
            return jnp.transpose(z.reshape(k, rows, n), (1, 0, 2))

        # inverse: domain flat (j2*n1 + j1) -> [k, r, j2, j1]
        zz = jnp.transpose(x, (1, 0, 2)).reshape(k, rows, n2, n1)
        z8 = jax.lax.bitcast_convert_type(zz, jnp.uint8)
        p1 = jnp.einsum("krjil,kilp->krpj", z8, self.im1_big,
                        preferred_element_type=I32)      # [(c, i1), j2]
        f1 = _make_recombine(n, k, rows, bb, twiddle=True,
                             transpose_pair=None, interpret=interp)
        u = f1(self.consts, p1.reshape(k * rows, NC, n),
               self.tw_i, self.tw_i_sh)                  # flat (i1, j2)
        u8 = jax.lax.bitcast_convert_type(
            u.reshape(k, rows, n1, n2), jnp.uint8)
        p2 = jnp.einsum("krijl,kjlp->krpi", u8, self.im2_big,
                        preferred_element_type=I32)      # [(c, i2), i1]
        f2 = _make_recombine(n, k, rows, bb, twiddle=False,
                             transpose_pair=None, interpret=interp)
        v = f2(self.consts, p2.reshape(k * rows, NC, n))
        return jnp.transpose(v.reshape(k, rows, n), (1, 0, 2))

    def _apply(self, x, inverse: bool):
        lead = x.shape[:-2]
        rows = 1
        for d in lead:
            rows *= d
        out = self._transform(x.reshape(rows, len(self.moduli), self.n),
                              inverse=inverse)
        return out.reshape(x.shape)

    def fwd(self, x):
        """[..., k, N] coefficients -> NTT domain ([j1, j2] order)."""
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
