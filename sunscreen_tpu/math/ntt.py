"""Negacyclic number-theoretic transforms over RNS limb stacks.

TPU-native replacement for SEAL's Harvey NTT (`seal_fhe/SEAL` native core;
consumed by every Evaluator op, SURVEY.md §2.4) and the reference TFHE's
negacyclic FFT (`sunscreen_tfhe/src/math/fft/negacyclic/mod.rs`).

Layout: polynomials are arrays `[..., k, N]` — RNS-limb-major, coefficient
minor, any number of leading batch axes. One `NttPlan` transforms *all*
limbs of *all* batched polynomials in a single fused XLA computation: the
stage loop is unrolled at trace time (log2 N stages of pure elementwise
ops), so there is no per-node dispatch — the entire transform fuses.

Math: decimation-in-time Cooley-Tukey with the 2N-th root ψ folded into
the twiddles (Longa–Naehrig), natural-order input → bit-reversed output.
The inverse runs the exact mirror (Gentleman–Sande) with elementwise
inverse twiddles and a final N^{-1} scale, so `inv(fwd(x)) == x` and
pointwise products correspond to negacyclic convolution. All twiddle
multiplies use Shoup precomputation (2 wide mults per butterfly).
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.math import modular as m
from sunscreen_tpu.math import primes

U64 = jnp.uint64

# Compact mode trades ~2-3x runtime for ~log2(N)x smaller XLA graphs
# (each transform becomes one fori_loop body instead of log2(N) unrolled
# stages) — useful when cold-compile latency dominates, e.g. through a
# tunneled TPU. Opt in with SUNSCREEN_TPU_COMPACT_NTT=1.
COMPACT_NTT = os.environ.get("SUNSCREEN_TPU_COMPACT_NTT", "") == "1"


def _bit_reverse(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def _shoup_table(ws: list[int], q: int) -> np.ndarray:
    return np.array([(w << 64) // q for w in ws], dtype=np.uint64)


class NttPlan:
    """Precomputed negacyclic NTT tables for a stack of moduli.

    Transforms arrays of shape [..., k, N] where k == len(moduli).
    """

    def __init__(self, n: int, moduli: tuple[int, ...]):
        assert n & (n - 1) == 0, "N must be a power of two"
        self.n = n
        self.log_n = n.bit_length() - 1
        self.moduli = tuple(moduli)
        k = len(moduli)

        psi_rev = np.empty((k, n), dtype=np.uint64)
        psi_rev_sh = np.empty((k, n), dtype=np.uint64)
        ipsi_rev = np.empty((k, n), dtype=np.uint64)
        ipsi_rev_sh = np.empty((k, n), dtype=np.uint64)
        n_inv = np.empty((k,), dtype=np.uint64)
        n_inv_sh = np.empty((k,), dtype=np.uint64)
        ratio_hi = np.empty((k,), dtype=np.uint64)
        ratio_lo = np.empty((k,), dtype=np.uint64)

        for j, q in enumerate(moduli):
            assert q % (2 * n) == 1, f"q={q} is not NTT-friendly for N={n}"
            psi = primes.min_root_of_unity(2 * n, q)
            pows = [1] * n
            for i in range(1, n):
                pows[i] = pows[i - 1] * psi % q
            fw = [pows[_bit_reverse(i, self.log_n)] for i in range(n)]
            iw = [pow(w, -1, q) for w in fw]
            psi_rev[j] = np.array(fw, dtype=np.uint64)
            psi_rev_sh[j] = _shoup_table(fw, q)
            ipsi_rev[j] = np.array(iw, dtype=np.uint64)
            ipsi_rev_sh[j] = _shoup_table(iw, q)
            ninv = pow(n, -1, q)
            n_inv[j] = ninv
            n_inv_sh[j] = (ninv << 64) // q
            rh, rl = m.barrett_ratio(q)
            ratio_hi[j] = rh
            ratio_lo[j] = rl

        self.q = jnp.asarray(np.array(moduli, dtype=np.uint64))      # (k,)
        self.psi_rev = jnp.asarray(psi_rev)
        self.psi_rev_sh = jnp.asarray(psi_rev_sh)
        self.ipsi_rev = jnp.asarray(ipsi_rev)
        self.ipsi_rev_sh = jnp.asarray(ipsi_rev_sh)
        self.n_inv = jnp.asarray(n_inv)
        self.n_inv_sh = jnp.asarray(n_inv_sh)
        self.ratio_hi = jnp.asarray(ratio_hi)
        self.ratio_lo = jnp.asarray(ratio_lo)

    # -- compact (fori_loop) stage tables -----------------------------------

    def _stage_tables(self):
        """Lazily built per-stage flat butterfly tables for the compact
        path: U/V index arrays [log_n, N/2] and twiddle (+Shoup) tables
        [log_n, k, N/2]. Output ordering is IDENTICAL to the unrolled
        path (same algorithm, loop form only)."""
        if getattr(self, "_stages", None) is not None:
            return self._stages
        n, log_n, k = self.n, self.log_n, len(self.moduli)
        half = n // 2
        U = np.empty((log_n, half), dtype=np.int32)
        V = np.empty((log_n, half), dtype=np.int32)
        W = np.empty((log_n, k, half), dtype=np.uint64)
        WS = np.empty((log_n, k, half), dtype=np.uint64)
        IW = np.empty((log_n, k, half), dtype=np.uint64)
        IWS = np.empty((log_n, k, half), dtype=np.uint64)
        psi = np.asarray(self.psi_rev)
        psi_sh = np.asarray(self.psi_rev_sh)
        ipsi = np.asarray(self.ipsi_rev)
        ipsi_sh = np.asarray(self.ipsi_rev_sh)
        for s in range(log_n):
            mm = 1 << s
            t = n >> (s + 1)
            p = 0
            for j in range(mm):
                base = j * 2 * t
                for i in range(t):
                    U[s, p] = base + i
                    V[s, p] = base + t + i
                    W[s, :, p] = psi[:, mm + j]
                    WS[s, :, p] = psi_sh[:, mm + j]
                    IW[s, :, p] = ipsi[:, mm + j]
                    IWS[s, :, p] = ipsi_sh[:, mm + j]
                    p += 1
        self._stages = tuple(jnp.asarray(a)
                             for a in (U, V, W, WS, IW, IWS))
        return self._stages

    def fwd_compact(self, x):
        """`fwd` as one lax.fori_loop (identical output ordering)."""
        U, V, W, WS, _, _ = self._stage_tables()
        k = len(self.moduli)
        q = self.q.reshape(k, 1)

        def body(s, x):
            u = jnp.take(x, U[s], axis=-1)
            v = m.reduce_2q(m.mul_mod_shoup(
                jnp.take(x, V[s], axis=-1), W[s], WS[s], q), q)
            x = x.at[..., U[s]].set(m.add_mod(u, v, q))
            return x.at[..., V[s]].set(m.sub_mod(u, v, q))

        return jax.lax.fori_loop(0, self.log_n, body, x)

    def inv_compact(self, x):
        """`inv` as one lax.fori_loop (identical output ordering)."""
        U, V, _, _, IW, IWS = self._stage_tables()
        k = len(self.moduli)
        q = self.q.reshape(k, 1)

        def body(i, x):
            s = self.log_n - 1 - i
            y0 = jnp.take(x, U[s], axis=-1)
            y1 = jnp.take(x, V[s], axis=-1)
            u = m.add_mod(y0, y1, q)
            d = m.sub_mod(y0, y1, q)
            v = m.reduce_2q(m.mul_mod_shoup(d, IW[s], IWS[s], q), q)
            x = x.at[..., U[s]].set(u)
            return x.at[..., V[s]].set(v)

        x = jax.lax.fori_loop(0, self.log_n, body, x)
        q2 = self.q.reshape(k, 1)
        return m.reduce_2q(
            m.mul_mod_shoup(x, self.n_inv.reshape(k, 1),
                            self.n_inv_sh.reshape(k, 1), q2), q2)

    # -- transforms --------------------------------------------------------

    def fwd(self, x):
        """Forward negacyclic NTT: [..., k, N] natural -> bit-reversed."""
        if COMPACT_NTT:
            return self.fwd_compact(x)
        n, k = self.n, len(self.moduli)
        batch = x.shape[:-2]
        q3 = self.q.reshape(k, 1, 1)
        for s in range(self.log_n):
            mm = 1 << s
            t = n >> (s + 1)
            xv = x.reshape(*batch, k, mm, 2, t)
            u = xv[..., 0, :]
            v0 = xv[..., 1, :]
            S = self.psi_rev[:, mm:2 * mm].reshape(k, mm, 1)
            Ssh = self.psi_rev_sh[:, mm:2 * mm].reshape(k, mm, 1)
            v = m.reduce_2q(m.mul_mod_shoup(v0, S, Ssh, q3), q3)
            x = jnp.stack(
                (m.add_mod(u, v, q3), m.sub_mod(u, v, q3)), axis=-2
            ).reshape(*batch, k, n)
        return x

    def inv(self, x):
        """Inverse negacyclic NTT: bit-reversed -> natural order."""
        if COMPACT_NTT:
            return self.inv_compact(x)
        n, k = self.n, len(self.moduli)
        batch = x.shape[:-2]
        q3 = self.q.reshape(k, 1, 1)
        for s in reversed(range(self.log_n)):
            mm = 1 << s
            t = n >> (s + 1)
            xv = x.reshape(*batch, k, mm, 2, t)
            y0 = xv[..., 0, :]
            y1 = xv[..., 1, :]
            u = m.add_mod(y0, y1, q3)
            d = m.sub_mod(y0, y1, q3)
            iS = self.ipsi_rev[:, mm:2 * mm].reshape(k, mm, 1)
            iSsh = self.ipsi_rev_sh[:, mm:2 * mm].reshape(k, mm, 1)
            v = m.reduce_2q(m.mul_mod_shoup(d, iS, iSsh, q3), q3)
            x = jnp.stack((u, v), axis=-2).reshape(*batch, k, n)
        q2 = self.q.reshape(k, 1)
        return m.reduce_2q(
            m.mul_mod_shoup(x, self.n_inv.reshape(k, 1),
                            self.n_inv_sh.reshape(k, 1), q2), q2)

    # -- pointwise helpers --------------------------------------------------

    def pointwise_mul(self, a, b):
        """Exact (a * b) mod q per limb on NTT-domain arrays [..., k, N]."""
        k = len(self.moduli)
        return m.mul_mod(a, b, self.q.reshape(k, 1),
                         self.ratio_hi.reshape(k, 1),
                         self.ratio_lo.reshape(k, 1))

    def negacyclic_mul(self, a, b):
        """Full negacyclic polynomial product of coefficient-domain inputs."""
        return self.inv(self.pointwise_mul(self.fwd(a), self.fwd(b)))


@lru_cache(maxsize=64)
def get_plan(n: int, moduli: tuple[int, ...]) -> NttPlan:
    return NttPlan(n, moduli)
