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

# NTT lowering mode:
#   "unrolled" — log2(N) traced stages of reshapes (fastest CPU compile
#                known-good; big XLA graphs)
#   "compact"  — one constant-geometry (Pease) fori_loop stage; ~log2(N)x
#                smaller graphs, compiles on TPU (the round-1
#                gather/scatter loop form did not)
#   "matmul"   — four-step MXU decomposition (math/mntt.py); requires
#                q < 2^57
# Default: SUNSCREEN_TPU_NTT env var, else legacy SUNSCREEN_TPU_COMPACT_NTT,
# else backend-specific (chosen from real-TPU measurements: matmul on
# tpu-like backends, unrolled on cpu).
COMPACT_NTT = os.environ.get("SUNSCREEN_TPU_COMPACT_NTT", "") == "1"


def resolve_mode(mode: str | None = None) -> str:
    if mode:
        return mode
    env = os.environ.get("SUNSCREEN_TPU_NTT", "")
    if env:
        return env
    if COMPACT_NTT:
        return "compact"
    # TPU default is the fused Pallas plan (fastest AND quickest
    # compiles as of round 3); get_plan degrades it to matmul/unrolled
    # automatically outside its envelope (u64 moduli, tiny N/t-rings)
    return "pallas" if jax.default_backend() != "cpu" else "unrolled"


def _bit_reverse(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def _shoup_table(ws: list[int], q: int, word=None) -> np.ndarray:
    from sunscreen_tpu.math.modular import U32, w_shoup_host
    wnp = np.uint32 if word == U32 else np.uint64
    return np.array([w_shoup_host(w, q, word) for w in ws], dtype=wnp)


class NttPlan:
    """Precomputed negacyclic NTT tables for a stack of moduli.

    Transforms arrays of shape [..., k, N] where k == len(moduli).
    """

    def __init__(self, n: int, moduli: tuple[int, ...],
                 mode: str = "unrolled"):
        assert n & (n - 1) == 0, "N must be a power of two"
        assert mode in ("unrolled", "compact")
        self.n = n
        self.log_n = n.bit_length() - 1
        self.moduli = tuple(moduli)
        self.mode = mode
        k = len(moduli)
        self.word = m.word_dtype_for(moduli)
        wnp = np.uint32 if self.word == m.U32 else np.uint64

        psi_rev = np.empty((k, n), dtype=wnp)
        psi_rev_sh = np.empty((k, n), dtype=wnp)
        ipsi_rev = np.empty((k, n), dtype=wnp)
        ipsi_rev_sh = np.empty((k, n), dtype=wnp)
        n_inv = np.empty((k,), dtype=wnp)
        n_inv_sh = np.empty((k,), dtype=wnp)
        c0 = np.empty((k,), dtype=wnp)
        c1 = np.empty((k,), dtype=wnp)

        for j, q in enumerate(moduli):
            assert q % (2 * n) == 1, f"q={q} is not NTT-friendly for N={n}"
            psi = primes.min_root_of_unity(2 * n, q)
            pows = [1] * n
            for i in range(1, n):
                pows[i] = pows[i - 1] * psi % q
            fw = [pows[_bit_reverse(i, self.log_n)] for i in range(n)]
            iw = [pow(w, -1, q) for w in fw]
            psi_rev[j] = np.array(fw, dtype=wnp)
            psi_rev_sh[j] = _shoup_table(fw, q, self.word)
            ipsi_rev[j] = np.array(iw, dtype=wnp)
            ipsi_rev_sh[j] = _shoup_table(iw, q, self.word)
            ninv = pow(n, -1, q)
            n_inv[j] = ninv
            n_inv_sh[j] = m.w_shoup_host(ninv, q, self.word)
            ch, cl = m.w_consts_host(q, self.word)
            c0[j] = ch
            c1[j] = cl

        self.q = jnp.asarray(np.array(moduli, dtype=wnp))      # (k,)
        self.psi_rev = jnp.asarray(psi_rev)
        self.psi_rev_sh = jnp.asarray(psi_rev_sh)
        self.ipsi_rev = jnp.asarray(ipsi_rev)
        self.ipsi_rev_sh = jnp.asarray(ipsi_rev_sh)
        self.n_inv = jnp.asarray(n_inv)
        self.n_inv_sh = jnp.asarray(n_inv_sh)
        self.c0 = jnp.asarray(c0)
        self.c1 = jnp.asarray(c1)

    # -- compact (Pease constant-geometry) stage tables ---------------------

    def _stage_tables(self):
        """Per-stage twiddle tables [log_n, k, N/2] for the
        constant-geometry (Pease) loop form.

        Derivation: run the standard in-place DIT network through the
        fixed dataflow "read pairs (p, p+N/2), butterfly, write
        interleaved (2p, 2p+1)". Tracking which in-place index each
        physical slot holds (`logical`), the stage-s pairing invariant
        logical[p+N/2] == logical[p] + t holds at every stage, and the
        final layout is the identity — so the loop form is bit-identical
        to the unrolled path with NO gather/scatter inside the loop
        (this is what lets Mosaic/XLA-TPU compile it; the round-1
        take/at-set form never finished compiling on TPU)."""
        if getattr(self, "_stages", None) is not None:
            return self._stages
        n, log_n, k = self.n, self.log_n, len(self.moduli)
        half = n // 2
        wnp = np.uint32 if self.word == m.U32 else np.uint64
        W = np.empty((log_n, k, half), dtype=wnp)
        WS = np.empty((log_n, k, half), dtype=wnp)
        IW = np.empty((log_n, k, half), dtype=wnp)
        IWS = np.empty((log_n, k, half), dtype=wnp)
        psi = np.asarray(self.psi_rev)
        psi_sh = np.asarray(self.psi_rev_sh)
        ipsi = np.asarray(self.ipsi_rev)
        ipsi_sh = np.asarray(self.ipsi_rev_sh)
        logical = np.arange(n, dtype=np.int64)
        for s in range(log_n):
            mm = 1 << s
            t = n >> (s + 1)
            a = logical[:half]
            assert np.array_equal(logical[half:], a + t), \
                "Pease pairing invariant broken"
            idx = mm + a // (2 * t)          # psi_rev index per butterfly
            W[s] = psi[:, idx]
            WS[s] = psi_sh[:, idx]
            IW[s] = ipsi[:, idx]
            IWS[s] = ipsi_sh[:, idx]
            nxt = np.empty(n, dtype=np.int64)
            nxt[0::2] = a
            nxt[1::2] = a + t
            logical = nxt
        assert np.array_equal(logical, np.arange(n)), \
            "Pease network must land in-place"
        # cache HOST arrays: converting to device arrays here would leak
        # tracers when first called under jit. Callers jnp.asarray per
        # trace (constant-folded by XLA).
        self._stages = (W, WS, IW, IWS)
        return self._stages

    def fwd_compact(self, x):
        """`fwd` as one lax.fori_loop over a constant-geometry stage
        (bit-identical output). Each stage: split halves, butterfly,
        interleave — static slices/reshapes only; the stage's twiddles
        are a dynamic-slice of a precomputed [log_n, k, N/2] table."""
        W, WS, _, _ = self._stage_tables()
        W, WS = jnp.asarray(W), jnp.asarray(WS)
        n, k = self.n, len(self.moduli)
        half = n // 2
        q = self.q.reshape(k, 1)

        def body(s, x):
            u = x[..., :half]
            v = m.reduce_2q(m.w_shoup_mul(
                x[..., half:], W[s], WS[s], q), q)
            a = m.add_mod(u, v, q)
            b = m.sub_mod(u, v, q)
            return jnp.stack((a, b), axis=-1).reshape(*x.shape[:-1], n)

        return jax.lax.fori_loop(0, self.log_n, body, x,
                                 unroll=False)

    def inv_compact(self, x):
        """`inv` as one lax.fori_loop (bit-identical output): the exact
        mirror of `fwd_compact` — deinterleave, inverse butterfly,
        concatenate halves."""
        _, _, IW, IWS = self._stage_tables()
        IW, IWS = jnp.asarray(IW), jnp.asarray(IWS)
        n, k = self.n, len(self.moduli)
        half = n // 2
        q = self.q.reshape(k, 1)

        def body(i, x):
            s = self.log_n - 1 - i
            xv = x.reshape(*x.shape[:-1], half, 2)
            y0 = xv[..., 0]
            y1 = xv[..., 1]
            u = m.add_mod(y0, y1, q)
            d = m.sub_mod(y0, y1, q)
            v = m.reduce_2q(m.w_shoup_mul(d, IW[s], IWS[s], q), q)
            return jnp.concatenate((u, v), axis=-1)

        x = jax.lax.fori_loop(0, self.log_n, body, x, unroll=False)
        q2 = self.q.reshape(k, 1)
        return m.reduce_2q(
            m.w_shoup_mul(x, self.n_inv.reshape(k, 1),
                          self.n_inv_sh.reshape(k, 1), q2), q2)

    # -- transforms --------------------------------------------------------

    def fwd(self, x):
        """Forward negacyclic NTT: [..., k, N] natural -> bit-reversed."""
        # plans are word-typed; a u64 array of u32-engine residues is a
        # representation mismatch that silently corrupts the shoup math
        x = x.astype(self.word)
        if self.mode == "compact":
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
            v = m.reduce_2q(m.w_shoup_mul(v0, S, Ssh, q3), q3)
            x = jnp.stack(
                (m.add_mod(u, v, q3), m.sub_mod(u, v, q3)), axis=-2
            ).reshape(*batch, k, n)
        return x

    def inv(self, x):
        """Inverse negacyclic NTT: bit-reversed -> natural order."""
        x = x.astype(self.word)
        if self.mode == "compact":
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
            v = m.reduce_2q(m.w_shoup_mul(d, iS, iSsh, q3), q3)
            x = jnp.stack((u, v), axis=-2).reshape(*batch, k, n)
        q2 = self.q.reshape(k, 1)
        return m.reduce_2q(
            m.w_shoup_mul(x, self.n_inv.reshape(k, 1),
                          self.n_inv_sh.reshape(k, 1), q2), q2)

    # -- pointwise helpers --------------------------------------------------

    def pointwise_mul(self, a, b):
        """Exact (a * b) mod q per limb on NTT-domain arrays [..., k, N]."""
        k = len(self.moduli)
        return m.w_mul_mod(a, b, self.q.reshape(k, 1),
                           self.c0.reshape(k, 1),
                           self.c1.reshape(k, 1))

    def negacyclic_mul(self, a, b):
        """Full negacyclic polynomial product of coefficient-domain inputs."""
        return self.inv(self.pointwise_mul(self.fwd(a), self.fwd(b)))


@lru_cache(maxsize=64)
def _plan_cached(n: int, moduli: tuple[int, ...], mode: str):
    if mode == "matmul":
        from sunscreen_tpu.math import mntt
        return mntt.MatmulNttPlan(n, moduli)
    if mode == "pallas":
        from sunscreen_tpu.math import pmntt
        return pmntt.PallasMatmulNttPlan(n, moduli)
    if mode == "pallas_vpu":
        from sunscreen_tpu.math import pntt
        return pntt.PallasNttPlan(n, moduli)
    return NttPlan(n, moduli, mode)


def get_plan(n: int, moduli: tuple[int, ...], mode: str | None = None):
    """Shared plan cache. `mode` None -> `resolve_mode()` default.
    Fallbacks for out-of-envelope moduli: "matmul" requires q < 2^57
    (MXU limb bound) else "compact"; "pallas" (hybrid MXU einsum +
    fused Pallas recombination, math/pmntt.py) and "pallas_vpu"
    (all-VPU fused butterflies, math/pntt.py) require the u32 engine
    (q < 2^30) and N >= 256/128, else they degrade to the matmul
    rule."""
    mode = resolve_mode(mode)
    if mode == "pallas" and (max(q.bit_length() for q in moduli) > 30
                             or n < 256):
        mode = "matmul"
    if mode == "pallas_vpu" and (max(q.bit_length() for q in moduli) > 30
                                 or n < 128):
        mode = "matmul"
    if mode == "pallas_vpu" and min(q.bit_length() for q in moduli) < 17:
        mode = "unrolled"
    if mode == "pallas" and min(q.bit_length() for q in moduli) < 17:
        # tiny plain-ring moduli (t ~ 2^14..2^16): not hot; the unrolled
        # lowering handles any word/width on every backend
        mode = "unrolled"
    if mode == "matmul" and max(q.bit_length() for q in moduli) > 57:
        mode = "compact"
    return _plan_cached(n, tuple(moduli), mode)
