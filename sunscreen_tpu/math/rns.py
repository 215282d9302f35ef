"""RNS (residue number system) machinery: base conversion and scaling.

TPU-native replacement for the RNS tool chain inside SEAL's BFV evaluator
(`seal_fhe/SEAL` native core: `util/rns.cpp` BaseConverter / RNSTool —
consumed by every multiply/relinearize/mod-switch in
`seal_fhe/src/evaluator.rs:12-279`) and for the CRT helpers in
`sunscreen_math` (`src/ring/mod.rs`). See SURVEY.md §2.4 and §7 step 1.

Algorithmic stance (TPU-first): SEAL uses the BEHZ integer RNS variant;
OpenFHE's HPS variant uses double-precision floats. TPUs have neither
native u64 nor native f64, so we use the HPS *structure* with an exact
**128-bit fixed-point** correction path built from 32-bit column sums —
fully vectorized, jit-friendly, and with rigorously bounded error:

  Every value x known in base C = {c_1..c_k} satisfies
      x = sum_i y_i * (C/c_i) - alpha * C,      y_i = [x_i * (C/c_i)^{-1}]_{c_i}
  with alpha = floor(sum_i y_i / c_i).  All our conversions/scalings reduce
  to (a) modular dot products sum_i y_i * theta_i mod d_j with precomputed
  theta tables, and (b) the fixed-point sum sum_i y_i * phi_i where phi_i
  is a real constant in [0, 1) stored as 128 fractional bits.  The
  fixed-point error is < k * 2^-64 — absorbed as negligible noise (<< 1
  coefficient unit) exactly where HPS absorbs its float rounding error.

Layouts: polynomials are [..., k, N] uint64 (limb-major), matching
`sunscreen_tpu.math.ntt`.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.math import modular as m

U64 = jnp.uint64
_M32 = jnp.uint64(0xFFFFFFFF)
_S32 = jnp.uint64(32)


def _u64(x: int) -> np.uint64:
    return np.uint64(x & 0xFFFFFFFFFFFFFFFF)


class RnsBase:
    """A fixed set of coprime moduli plus all host-side precomputations.

    Mirrors the role of SEAL's `util::RNSBase` (decompose/compose and the
    punctured-product tables used by fast base conversion).
    """

    def __init__(self, moduli: tuple[int, ...]):
        assert len(set(moduli)) == len(moduli), "moduli must be distinct"
        self.moduli = tuple(int(q) for q in moduli)
        self.k = len(moduli)
        self.product = 1
        for q in self.moduli:
            self.product *= q
        # punctured products Q/q_i and their inverses mod q_i
        self.punctured = [self.product // q for q in self.moduli]
        self.inv_punctured = [
            pow(p % q, -1, q) for p, q in zip(self.punctured, self.moduli)
        ]
        # engine word: u32 iff every modulus < 2^30 (see modular.py u32
        # section — halves HBM traffic and replaces synthesized u64
        # chains with native 32-bit products on TPU)
        self.word = m.word_dtype_for(self.moduli)
        wnp = np.uint32 if self.word == m.U32 else np.uint64
        self.q_dev = jnp.asarray(np.array(self.moduli, dtype=wnp))
        self.inv_punc_dev = jnp.asarray(
            np.array(self.inv_punctured, dtype=wnp))
        self.inv_punc_shoup_dev = jnp.asarray(np.array(
            [m.w_shoup_host(v, q, self.word)
             for v, q in zip(self.inv_punctured, self.moduli)], dtype=wnp))
        consts = [m.w_consts_host(q, self.word) for q in self.moduli]
        self.c0_dev = jnp.asarray(np.array([c[0] for c in consts],
                                           dtype=wnp))
        self.c1_dev = jnp.asarray(np.array([c[1] for c in consts],
                                           dtype=wnp))
        # always-u64 views for wide paths (uniform sampling via 128-bit
        # Barrett, fixed-point dots)
        self.q64_dev = jnp.asarray(np.array(self.moduli, dtype=np.uint64))
        ratios = [m.barrett_ratio(q) for q in self.moduli]
        self.ratio_hi_dev = jnp.asarray(
            np.array([r[0] for r in ratios], dtype=np.uint64))
        self.ratio_lo_dev = jnp.asarray(
            np.array([r[1] for r in ratios], dtype=np.uint64))
        # ceil(2^128 / q_i) fractional words for the alpha fixed-point sum:
        # 1/q_i as 128 fractional bits. Stored rounded UP so the fixed-point
        # error is strictly positive: floor(sum) is then exact for every
        # x in [0, C*(1 - k*2^-66)), and values within k*2^-66 of C (i.e.
        # tiny *negative* centered values) convert as their centered lift —
        # the desirable behavior for noise-like inputs. (HPS's double-
        # precision path has the same one-sided convention.)
        fr = [((1 << 128) + q - 1) // q for q in self.moduli]
        self.inv_q_fp_hi = jnp.asarray(
            np.array([_u64(v >> 64) for v in fr], dtype=np.uint64))
        self.inv_q_fp_lo = jnp.asarray(
            np.array([_u64(v) for v in fr], dtype=np.uint64))

    # -- host-side exact CRT (tests, key material, encodings) ---------------

    def compose(self, residues) -> list[int]:
        """CRT-compose [k, N] residues (numpy/python) to N python ints in
        [0, product)."""
        arr = np.asarray(residues, dtype=np.uint64)
        assert arr.shape[0] == self.k
        out = []
        for col in arr.T:
            x = 0
            for i, (r, q) in enumerate(zip(col.tolist(), self.moduli)):
                x += (int(r) * self.inv_punctured[i] % q) * self.punctured[i]
            out.append(x % self.product)
        return out

    def decompose(self, values) -> np.ndarray:
        """N python ints -> [k, N] uint64 residues."""
        vals = [int(v) % self.product for v in values]
        out = np.empty((self.k, len(vals)), dtype=np.uint64)
        for i, q in enumerate(self.moduli):
            out[i] = np.array([v % q for v in vals], dtype=np.uint64)
        return out

    # -- device helpers ------------------------------------------------------

    def normalize_digits(self, x):
        """y_i = [x_i * (C/c_i)^{-1}]_{c_i} for x of shape [..., k, N]."""
        k = self.k
        q = self.q_dev.reshape(k, 1)
        y = m.w_shoup_mul(x, self.inv_punc_dev.reshape(k, 1),
                          self.inv_punc_shoup_dev.reshape(k, 1), q)
        return m.reduce_2q(y, q)

    def reduce_u64(self, x, modulus_index: int):
        """Barrett-reduce arbitrary u64 values modulo moduli[i]
        (always-u64 path; returns u64)."""
        return m.barrett_reduce_64(
            x, self.q64_dev[modulus_index],
            self.ratio_hi_dev[modulus_index], self.ratio_lo_dev[modulus_index])


def fixed_point_dot(y, phi_hi, phi_lo, add_half: bool):
    """Exact fixed-point inner product over the limb axis.

    Computes S = sum_i y[..., i, :] * phi_i where phi_i is the real number
    (phi_hi_i * 2^64 + phi_lo_i) / 2^128 in [0, 1). Returns
    ((int_hi, int_lo), (frac_hi, frac_lo)): the 128-bit integer part of
    S (+ 1/2 if add_half) and the 128 fractional bits *before* the half
    was added (for noise measurement).

    Strategy: each product y*phi is three u64 words; we split every word
    into 32-bit halves and accumulate per-column sums over the limb axis
    (each column sum < k * 2^33 — exact in u64 for k <= 2^30), then do one
    carry-propagation pass. Fully vectorized, no loops over elements.
    Accepts u32-engine inputs (widened on entry).
    """
    y = y.astype(U64)
    k = y.shape[-2]
    ph = phi_hi.reshape(k, 1)
    plo = phi_lo.reshape(k, 1)
    h0, l0 = m.mul_wide(y, plo)   # worth 2^0   (in 2^-128-scaled units)
    h1, l1 = m.mul_wide(y, ph)    # worth 2^64
    # columns in base 2^32 of the 2^-128-scaled total
    c0 = jnp.sum(l0 & _M32, axis=-2)
    c1 = jnp.sum(l0 >> _S32, axis=-2)
    c2 = jnp.sum((h0 & _M32) + (l1 & _M32), axis=-2)
    c3 = jnp.sum((h0 >> _S32) + (l1 >> _S32), axis=-2)
    c4 = jnp.sum(h1 & _M32, axis=-2)
    c5 = jnp.sum(h1 >> _S32, axis=-2)
    # fractional words before rounding
    t0 = c0
    t1 = c1 + (t0 >> _S32)
    t2 = c2 + (t1 >> _S32)
    t3 = c3 + (t2 >> _S32)
    frac_lo = (t0 & _M32) | ((t1 & _M32) << _S32)
    frac_hi = (t2 & _M32) | ((t3 & _M32) << _S32)
    if add_half:
        t3 = t3 + (U64(1) << jnp.uint64(31))
    t4 = c4 + (t3 >> _S32)
    t5 = c5 + (t4 >> _S32)
    int_lo = (t4 & _M32) | ((t5 & _M32) << _S32)
    int_hi = t5 >> _S32
    return (int_hi, int_lo), (frac_hi, frac_lo)


class BaseConverter:
    """Fast base conversion C -> D with exact fixed-point alpha correction.

    Replaces SEAL's `util::BaseConverter::fast_convert_array` + the
    floating-point correction of HPS. `centered=True` rounds alpha instead
    of flooring it, which converts the *centered* representative in
    (-C/2, C/2] — used on ciphertexts before tensoring and when mapping
    scaled products back to Q.
    """

    def __init__(self, src: RnsBase, dst: RnsBase):
        self.src, self.dst = src, dst
        ks, kd = src.k, dst.k
        wnp = np.uint32 if dst.word == m.U32 else np.uint64
        theta = np.empty((ks, kd), dtype=wnp)
        theta_sh = np.empty((ks, kd), dtype=wnp)
        c_mod_d = np.empty((kd,), dtype=wnp)
        for j, d in enumerate(dst.moduli):
            for i in range(ks):
                t = src.punctured[i] % d
                theta[i, j] = t
                theta_sh[i, j] = m.w_shoup_host(t, d, dst.word)
            c_mod_d[j] = src.product % d
        self.theta = jnp.asarray(theta)
        self.theta_sh = jnp.asarray(theta_sh)
        self.c_mod_d = jnp.asarray(c_mod_d)

    def _fused(self):
        """Fused Pallas kernel (u32 engine on TPU): one VMEM pass
        instead of ~30 unfused XLA passes (math/prns.py; disable with
        SUNSCREEN_TPU_FUSED_RNS=0). Only the centered variant is used
        on hot paths."""
        import os

        import jax
        if (self.dst.word != m.U32 or self.src.word != m.U32
                or jax.default_backend() != "tpu"
                or os.environ.get("SUNSCREEN_TPU_FUSED_RNS") == "0"):
            return None
        if not hasattr(self, "_fused_op"):
            from sunscreen_tpu.math import prns
            self._fused_op = prns.fused_converter(self)
        return self._fused_op

    def extend(self, x, centered: bool = True):
        """x: [..., k_src, N] -> [..., k_src + k_dst, N]: the source
        limbs followed by the converted ones (base extension). On the
        fused path the copy rides the kernel write — no XLA concat."""
        if centered and x.dtype == m.U32:
            fused = self._fused()
            if fused is not None:
                return fused(x, include_src=True)
        return jnp.concatenate([x, self.convert(x, centered=centered)],
                               axis=-2)

    def convert(self, x, centered: bool = False):
        """x: [..., k_src, N] -> [..., k_dst, N]."""
        src, dst = self.src, self.dst
        if centered and x.dtype == m.U32:
            fused = self._fused()
            if fused is not None:
                return fused(x)
        y = src.normalize_digits(x)
        (_, alpha), _ = fixed_point_dot(
            y, src.inv_q_fp_hi, src.inv_q_fp_lo, add_half=centered)
        alpha = alpha.astype(dst.word)  # alpha < k_src: word-safe
        outs = []
        for j in range(dst.k):
            d = dst.q_dev[j]
            th = self.theta[:, j].reshape(src.k, 1)
            th_sh = self.theta_sh[:, j].reshape(src.k, 1)
            terms = m.reduce_2q(m.w_shoup_mul(y.astype(dst.word), th,
                                              th_sh, d), d)
            acc = terms[..., 0, :]
            for i in range(1, src.k):
                acc = m.add_mod(acc, terms[..., i, :], d)
            corr = m.w_mul_mod(alpha, self.c_mod_d[j], d,
                               dst.c0_dev[j], dst.c1_dev[j])
            outs.append(m.sub_mod(acc, corr, d))
        return jnp.stack(outs, axis=-2)


class ScaleAndRound:
    """Exact-enough scale-and-round: x in base C (with Q | C) ->
    [round(t * x / Q)]_{d_j} for each d_j in the target base D.

    Requires every target modulus d_j to divide C/Q (then both the alpha*C
    wrap and the centered-representative wrap contribute multiples of
    t*(C/Q) ≡ 0 mod d_j, so no correction terms are needed at all — the
    reason HPS scales into the auxiliary base). This is the workhorse of
    BFV ct×ct multiplication (SEAL: `Evaluator::bfv_multiply`,
    `util::RNSTool::fastbconv_sk` pipeline).
    """

    def __init__(self, src: RnsBase, q_base: RnsBase, dst: RnsBase, t: int):
        # sanity: Q divides C, and every d | C/Q
        assert src.product % q_base.product == 0
        p_prime = src.product // q_base.product
        for d in dst.moduli:
            assert p_prime % d == 0, "target modulus must divide C/Q"
        ks, kd = src.k, dst.k
        Q = q_base.product
        wnp = np.uint32 if dst.word == m.U32 else np.uint64
        omega = np.empty((ks, kd), dtype=wnp)
        omega_sh = np.empty((ks, kd), dtype=wnp)
        phi_hi = np.empty((ks,), dtype=np.uint64)
        phi_lo = np.empty((ks,), dtype=np.uint64)
        for i in range(ks):
            num = t * src.punctured[i]          # t * (C/c_i)
            w = num // Q                        # integer part of t*(C/c_i)/Q
            fr = ((num % Q) << 128) // Q        # 128 fractional bits
            phi_hi[i] = _u64(fr >> 64)
            phi_lo[i] = _u64(fr)
            for j, d in enumerate(dst.moduli):
                wj = w % d
                omega[i, j] = wj
                omega_sh[i, j] = m.w_shoup_host(wj, d, dst.word)
        self.src, self.dst = src, dst
        self.omega = jnp.asarray(omega)
        self.omega_sh = jnp.asarray(omega_sh)
        self.phi_hi = jnp.asarray(phi_hi)
        self.phi_lo = jnp.asarray(phi_lo)

    def _fused(self):
        """Fused Pallas kernel (u32 engine on TPU, math/prns.py)."""
        import os

        import jax
        if (self.dst.word != m.U32 or self.src.word != m.U32
                or jax.default_backend() != "tpu"
                or os.environ.get("SUNSCREEN_TPU_FUSED_RNS") == "0"):
            return None
        if not hasattr(self, "_fused_op"):
            from sunscreen_tpu.math import prns
            self._fused_op = prns.fused_scaler(self)
        return self._fused_op

    def apply(self, x):
        """x: [..., k_src, N] -> [..., k_dst, N] = [round(t*x/Q)]_D."""
        src, dst = self.src, self.dst
        if x.dtype == m.U32:
            fused = self._fused()
            if fused is not None:
                return fused(x)
        y = src.normalize_digits(x)
        (r_hi, r_lo), _ = fixed_point_dot(
            y, self.phi_hi, self.phi_lo, add_half=True)
        outs = []
        for j in range(dst.k):
            d = dst.q_dev[j]
            om = self.omega[:, j].reshape(src.k, 1)
            om_sh = self.omega_sh[:, j].reshape(src.k, 1)
            terms = m.reduce_2q(m.w_shoup_mul(y.astype(dst.word), om,
                                              om_sh, d), d)
            acc = terms[..., 0, :]
            for i in range(1, src.k):
                acc = m.add_mod(acc, terms[..., i, :], d)
            if dst.word == m.U32:
                # u32 engine: r < k_src * 2^30 < 2^35 fits one u64 word
                r = m.w_reduce(r_lo, d, dst.c0_dev[j], dst.c1_dev[j])
            else:
                r = m.barrett_reduce_128(r_hi, r_lo, d,
                                         dst.ratio_hi_dev[j],
                                         dst.ratio_lo_dev[j])
            outs.append(m.add_mod(acc, r, d))
        return jnp.stack(outs, axis=-2)


class DecryptScaler:
    """[round(t * x / Q)]_t from x in base Q, plus invariant-noise words.

    Decryption's scale-and-round (SEAL: `util::RNSTool::decrypt_scale_and_
    round`). The alpha*t wrap vanishes mod t, so the result is
    [sum_i y_i*floor-part + round(sum_i y_i*frac-part)] mod t, and the
    128 fractional bits give the invariant noise |v| directly (budget =
    -log2(2|v|), `seal_fhe/src/encryptor_decryptor.rs:588+` semantics).
    """

    def __init__(self, q_base: RnsBase, t: int):
        self.q_base = q_base
        self.t = t
        k = q_base.k
        Q = q_base.product
        omega = np.empty((k,), dtype=np.uint64)
        phi_hi = np.empty((k,), dtype=np.uint64)
        phi_lo = np.empty((k,), dtype=np.uint64)
        for i in range(k):
            num = t * q_base.punctured[i]
            omega[i] = (num // Q) % t
            fr = ((num % Q) << 128) // Q
            phi_hi[i] = _u64(fr >> 64)
            phi_lo[i] = _u64(fr)
        self.omega = jnp.asarray(omega)
        self.phi_hi = jnp.asarray(phi_hi)
        self.phi_lo = jnp.asarray(phi_lo)
        self.t_dev = U64(t)
        rh, rl = m.barrett_ratio(t)
        self.t_ratio = (U64(rh), U64(rl))

    def apply(self, x):
        """x: [..., k, N] -> ([..., N] mod-t result, (frac_hi, frac_lo))."""
        qb = self.q_base
        y = qb.normalize_digits(x).astype(U64)  # u32-engine safe (widen)
        (r_hi, r_lo), frac = fixed_point_dot(
            y, self.phi_hi, self.phi_lo, add_half=True)
        t = self.t_dev
        rh, rl = self.t_ratio
        om = self.omega.reshape(qb.k, 1)
        # omega < t and y < q_i: reduce y mod t first, then mul_mod
        terms = m.mul_mod(m.barrett_reduce_64(y, t, rh, rl), om, t, rh, rl)
        acc = terms[..., 0, :]
        for i in range(1, qb.k):
            acc = m.add_mod(acc, terms[..., i, :], t)
        # r < k*2^62 can exceed t*2^64 for tiny t: reduce the high word
        # first so barrett_reduce_128's input < t*2^64 precondition holds.
        r_hi_red = m.barrett_reduce_64(r_hi, t, rh, rl)
        r = m.barrett_reduce_128(r_hi_red, r_lo, t, rh, rl)
        return m.add_mod(acc, r, t), frac


class ModDown:
    """round(x / p) mod Q for x in base Q ∪ {p} (special-prime rescale).

    The final step of hybrid keyswitching (SEAL: `util::RNSTool::
    divide_and_round_q_last_inplace`): add floor(p/2), subtract the last
    limb's residue (exact single-limb base conversion), multiply by
    p^{-1} mod q_i.
    """

    def __init__(self, q_base: RnsBase, p: int):
        self.q_base = q_base
        self.p = p
        half = p >> 1
        wnp = np.uint32 if q_base.word == m.U32 else np.uint64
        inv_p = np.array([pow(p % q, -1, q) for q in q_base.moduli],
                         dtype=wnp)
        inv_p_sh = np.array(
            [m.w_shoup_host(int(v), q, q_base.word)
             for v, q in zip(inv_p, q_base.moduli)], dtype=wnp)
        self.inv_p = jnp.asarray(inv_p)
        self.inv_p_sh = jnp.asarray(inv_p_sh)
        self.half = q_base.word(half) if p < (1 << 30) else U64(half)
        self.half_mod_q = jnp.asarray(
            np.array([half % q for q in q_base.moduli], dtype=wnp))
        self.p_dev = q_base.word(p) if p < (1 << 30) else U64(p)

    def _fused(self):
        """Fused Pallas kernel (u32 engine on TPU, math/prns.py)."""
        import os

        import jax
        if (self.q_base.word != m.U32 or int(self.p) >= (1 << 30)
                or jax.default_backend() != "tpu"
                or os.environ.get("SUNSCREEN_TPU_FUSED_RNS") == "0"):
            return None
        if not hasattr(self, "_fused_op"):
            from sunscreen_tpu.math import prns
            self._fused_op = prns.fused_mod_down(self)
        return self._fused_op

    def apply(self, x_q, x_p):
        """x_q: [..., k, N], x_p: [..., N] -> [..., k, N]."""
        qb = self.q_base
        if x_q.dtype == m.U32:
            fused = self._fused()
            if fused is not None:
                return fused(x_q, x_p)
        k = qb.k
        q = qb.q_dev.reshape(k, 1)
        xp = m.add_mod(x_p, self.half, self.p_dev)
        # exact single-limb conversion: reduce xp mod each q_i
        xp_mod_q = m.w_reduce(
            xp[..., None, :], q, qb.c0_dev.reshape(k, 1),
            qb.c1_dev.reshape(k, 1))
        num = m.sub_mod(
            m.add_mod(x_q, self.half_mod_q.reshape(k, 1), q), xp_mod_q, q)
        out = m.w_shoup_mul(num, self.inv_p.reshape(k, 1),
                            self.inv_p_sh.reshape(k, 1), q)
        return m.reduce_2q(out, q)


@lru_cache(maxsize=64)
def get_base(moduli: tuple[int, ...]) -> RnsBase:
    return RnsBase(moduli)
