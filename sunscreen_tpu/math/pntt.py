"""Fused Pallas TPU negacyclic NTT for the u32 engine (moduli < 2^30).

Round-2 measurements (benchmarks/PERF_NOTES.md) showed the NTT stage
loops are HBM-bound: XLA does not fuse the modular-multiply chains, so
every butterfly stage round-trips HBM (13 stages x 2 passes per
transform). This plan runs the ENTIRE transform per polynomial inside
one Pallas kernel with the poly resident in VMEM — one HBM read + one
write per transform instead of ~26 passes. Replaces the same hot loop
as SEAL's Harvey NTT core (`seal_fhe/SEAL` native engine; consumed by
every Evaluator op — SURVEY.md §2.4).

Algorithm: four-step decomposition chosen for the TPU's vector unit —
no lane-strided slices (Mosaic cannot lower them) and no gathers:

  view a[N] as X[R, C] with C = 128 lanes, i = r*C + c
  fwd:
    1. negacyclic row NTT over r (psi_R = psi^C): log2(R) radix-2
       stages; every slice is a contiguous SUBLANE half (the block
       structure [mm, 2, t, C] reshapes major/sublane dims only)
    2. elementwise mid-twiddle psi^(c*(2*s+1)) (s = row's frequency)
    3. 2D transpose [R, C] -> [C, R] (TPU transpose unit)
    4. cyclic column NTT over c as log2(C) DIF stages (again contiguous
       sublane halves after the transpose)
  NTT domain = [t', s'] layout, bit-reversed in both axes — a fixed
  permutation, so pointwise products still give negacyclic convolution
  (coefficient-domain results are bit-exact vs the other NTT modes;
  NTT-domain arrays, incl. keys, are mode-specific).

All modular arithmetic is exact u32: Shoup multiplies via 16-bit-half
mulhi (6 native 32-bit multiplies per butterfly) and Barrett (mu, s1)
long reduction for pointwise products (math/modular.py u32 engine).
Scheme validated against python-int oracles in tests/test_bfv_u32.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sunscreen_tpu.math import modular as m
from sunscreen_tpu.math import primes

U32 = jnp.uint32
LANES = 128


def _bitrev(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


# ---------------------------------------------------------------------------
# in-kernel u32 modular primitives (traced; constants are python ints)
# ---------------------------------------------------------------------------


def _mulhi32(a, b):
    """High 32 bits of the exact u32 x u32 product via 16-bit halves."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    mid = (p00 >> 16) + (p01 & 0xFFFF) + (p10 & 0xFFFF)
    return a1 * b1 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)


def _mul32_full(a, b):
    """(hi, lo) of the exact u32 x u32 product."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    mid = (p00 >> 16) + (p01 & 0xFFFF) + (p10 & 0xFFFF)
    lo = (p00 & 0xFFFF) | ((mid & 0xFFFF) << 16)
    hi = a1 * b1 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    return hi, lo


def _shoup(x, w, wsh, q):
    """(x * w) mod q canonical, x < 2q, w < q < 2^30 (Harvey/Shoup,
    beta = 2^32; mirrors modular.mul_mod_shoup32 + reduce_2q)."""
    hi = _mulhi32(x, wsh)
    r = w * x - hi * q  # u32 wrap; in [0, 2q)
    return jnp.where(r >= q, r - q, r)


def _addm(a, b, q):
    s = a + b
    return jnp.where(s >= q, s - q, s)


def _subm(a, b, q):
    d = a - b + q
    return jnp.where(d >= q, d - q, d)


def _mulmod32(a, b, q, mu, s1):
    """(a * b) mod q exact, a, b < q < 2^30 (Barrett; mirrors
    modular.mul_mod32). q/mu/s1 may be broadcastable vectors (per-limb
    constants); requires 1 <= s1 <= 31, i.e. 2^17 <= q < 2^30."""
    hi, lo = _mul32_full(a, b)
    x_sh = (hi << (jnp.uint32(32) - s1)) | (lo >> s1)  # x >> s1 fits u32
    qhat = _mulhi32(x_sh, mu)
    r = lo - qhat * q  # wrap-exact: true remainder-ish < 4q < 2^32
    q2 = q + q
    r = jnp.where(r >= q2, r - q2, r)
    return jnp.where(r >= q, r - q, r)


# ---------------------------------------------------------------------------
# kernel bodies (one (limb, batch-block) grid step; tables per limb)
# ---------------------------------------------------------------------------


def _fwd_body(x, wa, wa_sh, mid, mid_sh, wb, wb_sh, q, log_r, log_c):
    """x [B, R, C] coefficient order -> [B, C, R] NTT domain."""
    B = x.shape[0]
    R, C = 1 << log_r, 1 << log_c
    # phase A: negacyclic row NTT (LN merged psi twiddles, DIT)
    for s in range(log_r):
        mm = 1 << s
        t = R >> (s + 1)
        xv = x.reshape(B, mm, 2, t, C)
        u = xv[:, :, 0]
        v0 = xv[:, :, 1]
        tw = wa[s].reshape(1, mm, t, C)
        tw_sh = wa_sh[s].reshape(1, mm, t, C)
        v = _shoup(v0, tw, tw_sh, q)
        x = jnp.stack((_addm(u, v, q), _subm(u, v, q)),
                      axis=2).reshape(B, R, C)
    # mid twiddle (psi^(c*(2s+1)) in bit-reversed row order)
    x = _shoup(x, mid.reshape(1, R, C), mid_sh.reshape(1, R, C), q)
    # transpose to [B, C, R]
    x = jnp.swapaxes(x, -1, -2)
    # phase B: cyclic column NTT over c (DIF, natural -> bit-reversed)
    for s in range(log_c):
        nb = 1 << s
        h = C >> (s + 1)
        xv = x.reshape(B, nb, 2, h, R)
        u = xv[:, :, 0]
        v = xv[:, :, 1]
        tw = wb[s].reshape(1, nb, h, R)
        tw_sh = wb_sh[s].reshape(1, nb, h, R)
        a = _addm(u, v, q)
        b = _shoup(_subm(u, v, q), tw, tw_sh, q)
        x = jnp.stack((a, b), axis=2).reshape(B, C, R)
    return x


def _inv_body(x, iwb, iwb_sh, imid, imid_sh, iwa, iwa_sh, q, log_r, log_c):
    """x [B, C, R] NTT domain -> [B, R, C] coefficient order (the exact
    mirror of `_fwd_body`; 1/N folded into the inverse mid twiddle)."""
    B = x.shape[0]
    R, C = 1 << log_r, 1 << log_c
    for s in reversed(range(log_c)):
        nb = 1 << s
        h = C >> (s + 1)
        xv = x.reshape(B, nb, 2, h, R)
        u = xv[:, :, 0]
        vt = xv[:, :, 1]
        tw = iwb[s].reshape(1, nb, h, R)
        tw_sh = iwb_sh[s].reshape(1, nb, h, R)
        v = _shoup(vt, tw, tw_sh, q)
        x = jnp.stack((_addm(u, v, q), _subm(u, v, q)),
                      axis=2).reshape(B, C, R)
    x = jnp.swapaxes(x, -1, -2)
    x = _shoup(x, imid.reshape(1, R, C), imid_sh.reshape(1, R, C), q)
    for s in reversed(range(log_r)):
        mm = 1 << s
        t = R >> (s + 1)
        xv = x.reshape(B, mm, 2, t, C)
        y0 = xv[:, :, 0]
        y1 = xv[:, :, 1]
        u = _addm(y0, y1, q)
        d = _subm(y0, y1, q)
        tw = iwa[s].reshape(1, mm, t, C)
        tw_sh = iwa_sh[s].reshape(1, mm, t, C)
        x = jnp.stack((u, _shoup(d, tw, tw_sh, q)),
                      axis=2).reshape(B, R, C)
    return x


_INTERPRET = None


def _interpret() -> bool:
    global _INTERPRET
    if _INTERPRET is None:
        _INTERPRET = jax.default_backend() == "cpu"
    return _INTERPRET


class PallasNttPlan:
    """Fused-VMEM negacyclic NTT plan for u32 moduli (q < 2^30).

    Same interface as `ntt.NttPlan` / `mntt.MatmulNttPlan`:
    fwd/inv/pointwise_mul/negacyclic_mul over [..., k, N] stacks.
    NTT-domain layout is plan-specific ([t', s'] four-step order).
    """

    def __init__(self, n: int, moduli: tuple[int, ...]):
        assert n & (n - 1) == 0 and n >= 128, "N must be a power of 2 >=128"
        assert max(q.bit_length() for q in moduli) <= 30, \
            "pallas NTT requires u32-engine moduli (q < 2^30)"
        self.n = n
        self.moduli = tuple(moduli)
        self.word = U32
        self.mode = "pallas"
        k = len(moduli)
        C = min(LANES, n // 2) if n < 2 * LANES else LANES
        R = n // C
        self.R, self.C = R, C
        lr, lc = R.bit_length() - 1, C.bit_length() - 1
        self.log_r, self.log_c = lr, lc

        # host-side table build (python ints; validated by the numpy
        # prototype and tests/test_bfv_u32.py)
        wa = np.zeros((k, max(lr, 1), max(R // 2, 1), C), np.uint32)
        wa_sh = np.zeros_like(wa)
        iwa = np.zeros_like(wa)
        iwa_sh = np.zeros_like(wa)
        mid = np.zeros((k, R, C), np.uint32)
        mid_sh = np.zeros_like(mid)
        imid = np.zeros_like(mid)
        imid_sh = np.zeros_like(mid)
        wb = np.zeros((k, lc, C // 2, R), np.uint32)
        wb_sh = np.zeros_like(wb)
        iwb = np.zeros_like(wb)
        iwb_sh = np.zeros_like(wb)
        qs = np.zeros((k, 1), np.uint32)
        mus = np.zeros((k, 1), np.uint32)
        s1s = np.zeros((k, 1), np.int32)

        for j, q in enumerate(moduli):
            assert q % (2 * n) == 1, f"q={q} not NTT-friendly for N={n}"
            psi = primes.min_root_of_unity(2 * n, q)
            psi_r = pow(psi, C, q)          # 2R-th root for the row phase
            w_c = pow(psi, 2 * R, q)        # C-th root for the col phase
            sh = functools.partial(m.shoup_ratio32, q=q)

            # phase A: LN DIT tables psi_rev[i] = psi_r^bitrev(i, lr),
            # expanded per element of the v half [mm, t, C]
            pr = [pow(psi_r, _bitrev(i, lr), q) for i in range(R)]
            for s in range(lr):
                mm = 1 << s
                t = R >> (s + 1)
                for bi in range(mm):
                    w = pr[mm + bi]
                    iw = pow(w, -1, q)
                    wa[j, s, bi * t:(bi + 1) * t, :] = w
                    wa_sh[j, s, bi * t:(bi + 1) * t, :] = sh(w)
                    iwa[j, s, bi * t:(bi + 1) * t, :] = iw
                    iwa_sh[j, s, bi * t:(bi + 1) * t, :] = sh(iw)

            # mid twiddle in bit-reversed row order; 1/N folded into inv
            n_inv = pow(n, -1, q)
            for sp in range(R):
                sfreq = _bitrev(sp, lr) if lr else 0
                base = pow(psi, 2 * sfreq + 1, q)
                ibase = pow(base, -1, q)
                wrow = 1
                iwrow = n_inv
                for c in range(C):
                    mid[j, sp, c] = wrow
                    mid_sh[j, sp, c] = sh(wrow)
                    imid[j, sp, c] = iwrow
                    imid_sh[j, sp, c] = sh(iwrow)
                    wrow = wrow * base % q
                    iwrow = iwrow * ibase % q

            # phase B: cyclic DIF tables w_c^((1<<s)*jj) per stage
            for s in range(lc):
                nb = 1 << s
                h = C >> (s + 1)
                for bi in range(nb):
                    for jj in range(h):
                        w = pow(w_c, (1 << s) * jj, q)
                        iw = pow(w, -1, q)
                        wb[j, s, bi * h + jj, :] = w
                        wb_sh[j, s, bi * h + jj, :] = sh(w)
                        iwb[j, s, bi * h + jj, :] = iw
                        iwb_sh[j, s, bi * h + jj, :] = sh(iw)

            qs[j] = q

        # per-limb Barrett (mu, s1) carried as lane-replicated vectors in
        # the pointwise kernel (vector shifts; mixed 26..30-bit limbs are
        # the norm for default_u32 chains). Shifts by (32 - s1) require
        # s1 >= 1 <=> q >= 2^17 — always true for NTT-friendly moduli at
        # N >= 128 of the sizes the engine generates.
        for j, q in enumerate(moduli):
            assert q.bit_length() >= 17, "u32 pallas plan needs q >= 2^17"
            mu, s1 = m.barrett32_consts(q)
            mus[j] = mu
            s1s[j] = s1

        self.tabs = tuple(jnp.asarray(t) for t in (
            wa, wa_sh, mid, mid_sh, wb, wb_sh,
            iwb, iwb_sh, imid, imid_sh, iwa, iwa_sh))
        self.q = jnp.asarray(np.array(moduli, np.uint32))
        self.q_col = jnp.asarray(qs)
        self.mu_col = jnp.asarray(mus)
        self.q_lanes = jnp.asarray(np.repeat(qs, LANES, axis=1))
        self.mu_lanes = jnp.asarray(np.repeat(mus, LANES, axis=1))
        self.s1_lanes = jnp.asarray(
            np.repeat(s1s.astype(np.uint32), LANES, axis=1))
        # barrett consts for the generic w_mul_mod fallback path (these
        # use the per-limb shift convention of modular.barrett32_consts)
        self.c0 = jnp.asarray(
            np.array([m.barrett32_consts(q)[0] for q in moduli], np.uint32))
        self.c1 = jnp.asarray(
            np.array([m.barrett32_consts(q)[1] for q in moduli], np.uint32))

    # -- pallas dispatch -----------------------------------------------------

    def _blk(self, rows: int, row_bytes: int | None = None,
             target_bytes: int = 512 << 10) -> int:
        """Batch-block size bounded by `target_bytes` per operand block
        (in + out + stage temporaries + tables must fit 16 MB VMEM)."""
        target = max(1, target_bytes // (row_bytes or self.n * 4))
        b = min(rows, target)
        while rows % b:
            b -= 1
        return b

    @functools.partial(jax.jit, static_argnames=("self", "inverse"))
    def _transform(self, x, inverse: bool):
        """x [rows, k, N] -> [rows, k, N] (flat NTT-domain layout)."""
        rows, k, n = x.shape
        R, C = self.R, self.C
        # measured on v5e: Mosaic's stack for the unrolled stage chain
        # holds ~48 live row-copies, so a 512 KB block OOMs the 16 MB
        # scoped vmem at N=8192; 128 KB keeps ~6 MB of stack headroom
        bb = self._blk(rows, target_bytes=128 << 10)
        grid = (k, rows // bb)
        shape3 = (x.shape[0],) + (k,) + ((C, R) if inverse else (R, C))
        x = x.reshape(shape3)

        if inverse:
            tabs = self.tabs[6:]
        else:
            tabs = self.tabs[:6]

        def imap_x(l, b):
            return (jnp.asarray(b, jnp.int32), jnp.asarray(l, jnp.int32),
                    jnp.int32(0), jnp.int32(0))

        def imap_tab(ndim):
            def f(l, b):
                return (jnp.asarray(l, jnp.int32),
                        ) + (jnp.int32(0),) * (ndim - 1)
            return f

        def kernel(q_r, x_r, t0, t1, t2, t3, t4, t5, o_r):
            q = q_r[pl.program_id(0), 0]
            if inverse:
                out = _inv_body(x_r[:, 0], t2[0], t3[0], t4[0], t5[0],
                                t0[0], t1[0], q, self.log_r, self.log_c)
            else:
                out = _fwd_body(x_r[:, 0], t0[0], t1[0], t2[0], t3[0],
                                t4[0], t5[0], q, self.log_r, self.log_c)
            o_r[:, 0] = out

        in_dims = (bb, 1) + shape3[2:]
        out_shape3 = (x.shape[0], k) + ((R, C) if inverse else (C, R))
        # order tables so kernel args are (wa-like, mid, wb) fwd and
        # (iwa, imid, iwb) inv with matching index maps
        if inverse:
            t_order = (tabs[4], tabs[5], tabs[0], tabs[1], tabs[2], tabs[3])
        else:
            t_order = tabs
        tab_specs = [pl.BlockSpec((1,) + t.shape[1:], imap_tab(t.ndim),
                                  memory_space=pltpu.VMEM)
                     for t in t_order]
        # explicit i32 index maps everywhere: auto-generated maps emit
        # i64 under x64 mode and Mosaic fails with "failed to legalize
        # func.return" (CLAUDE.md round-2 gotcha)
        def imap_zero(l, b):
            return (jnp.int32(0), jnp.int32(0))

        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(self.q_col.shape, imap_zero,
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec(in_dims, imap_x,
                                   memory_space=pltpu.VMEM)] + tab_specs,
            out_specs=pl.BlockSpec((bb, 1) + out_shape3[2:], imap_x,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape3, U32),
            interpret=_interpret(),
        )(self.q_col, x, *t_order)
        return out.reshape(rows, k, n)

    def _apply(self, x, inverse: bool):
        x = x.astype(self.word)   # plane split is word-width-dependent
        lead = x.shape[:-2]
        rows = 1
        for d in lead:
            rows *= d
        out = self._transform(x.reshape(rows, len(self.moduli), self.n),
                              inverse=inverse)
        return out.reshape(x.shape)

    def fwd(self, x):
        """[..., k, N] coefficients -> NTT domain (four-step order)."""
        return self._apply(x, inverse=False)

    def inv(self, x):
        """NTT domain -> [..., k, N] coefficients."""
        return self._apply(x, inverse=True)

    # -- pointwise -----------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self",))
    def _pmul(self, a, b):
        """Blocks keep the FULL [k, N] trailing dims (Mosaic requires the
        last two block dims be tile-divisible or whole); per-limb (q, mu)
        ride along as lane-replicated VMEM rows broadcast from lane 0."""
        rows, k, n = a.shape
        bb = self._blk(rows, row_bytes=k * n * 4)
        grid = (rows // bb,)

        def imap_x(bi):
            return (jnp.asarray(bi, jnp.int32), jnp.int32(0), jnp.int32(0))

        def imap_tab(bi):
            return (jnp.int32(0), jnp.int32(0))

        def kernel(q_r, mu_r, s1_r, a_r, b_r, o_r):
            q = q_r[:, 0:1].reshape(1, k, 1)
            mu = mu_r[:, 0:1].reshape(1, k, 1)
            s1 = s1_r[:, 0:1].reshape(1, k, 1)
            o_r[:] = _mulmod32(a_r[:], b_r[:], q, mu, s1)

        spec = pl.BlockSpec((bb, k, n), imap_x, memory_space=pltpu.VMEM)
        tspec = pl.BlockSpec((k, LANES), imap_tab, memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=grid,
            in_specs=[tspec, tspec, tspec, spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(a.shape, U32),
            interpret=_interpret(),
        )(self.q_lanes, self.mu_lanes, self.s1_lanes, a, b)

    def pointwise_mul(self, a, b):
        """Exact (a*b) mod q per limb on NTT-domain stacks [..., k, N]."""
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        lead = shape[:-2]
        rows = 1
        for d in lead:
            rows *= d
        k, n = shape[-2:]
        out = self._pmul(a.reshape(rows, k, n), b.reshape(rows, k, n))
        return out.reshape(shape)

    def negacyclic_mul(self, a, b):
        """Negacyclic poly product of coefficient-domain stacks."""
        return self.inv(self.pointwise_mul(self.fwd(a), self.fwd(b)))
