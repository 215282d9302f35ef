"""Exact negacyclic torus-polynomial products via CRT NTT.

TPU-native replacement for the reference's f64 negacyclic FFT
(`sunscreen_tfhe/src/math/fft/negacyclic/mod.rs` + AVX2 SIMD path):
TPUs have no native f64, so external products run EXACTLY — small
signed gadget digits times mod-2^64 torus polynomials through a
two-prime CRT NTT, with an exact fixed-point-corrected conversion back
to Z/2^64. No precision analysis needed: results are bit-exact for
|product coefficients| < C/2 ~ 2^123.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.math import modular as m
from sunscreen_tpu.math import ntt, primes, rns

U64 = jnp.uint64


class TorusNttPlan:
    """Negacyclic multiply of signed-int polys by torus polys, exact
    mod 2^64."""

    def __init__(self, n: int, k: int = 2):
        self.n = n
        mods = tuple(primes.gen_ntt_primes(62, k, n))
        self.base = rns.RnsBase(mods)
        self.plan = ntt.get_plan(n, mods)
        # (C/c_i) mod 2^64 and C mod 2^64 for wrapping reconstruction
        self.theta = jnp.asarray(np.array(
            [p & 0xFFFFFFFFFFFFFFFF for p in self.base.punctured],
            dtype=np.uint64)).reshape(k, 1)
        self.c_mod = U64(self.base.product & 0xFFFFFFFFFFFFFFFF)

    def torus_to_rns(self, t):
        """u64 torus [..., N] -> [..., k, N] residues."""
        k = self.base.k
        q = self.base.q_dev.reshape(k, 1)
        return m.barrett_reduce_64(
            t[..., None, :], q,
            self.base.ratio_hi_dev.reshape(k, 1),
            self.base.ratio_lo_dev.reshape(k, 1))

    def signed_to_rns(self, d):
        """signed int64 digits [..., N] -> [..., k, N] residues."""
        from sunscreen_tpu.math import sampling
        return sampling.signed_to_rns(d, self.base.q_dev)

    def fwd(self, x_rns):
        return self.plan.fwd(x_rns)

    def pointwise(self, a, b):
        return self.plan.pointwise_mul(a, b)

    def add(self, a, b):
        k = self.base.k
        return m.add_mod(a, b, self.base.q_dev.reshape(k, 1))

    def to_torus(self, x_rns):
        """[..., k, N] residues of a centered value |X| < C/2 ->
        exact u64 (mod 2^64)."""
        y = self.base.normalize_digits(x_rns)
        (_, alpha), _ = rns.fixed_point_dot(
            y, self.base.inv_q_fp_hi, self.base.inv_q_fp_lo,
            add_half=True)
        total = jnp.sum(y * self.theta, axis=-2)  # wrapping mod 2^64
        return total - alpha * self.c_mod

    def negacyclic_mul_signed_torus(self, digits, torus_poly):
        """Exact negacyclic (digits * torus_poly) mod 2^64.
        digits: int64 [..., N] small; torus_poly: u64 [..., N]."""
        a = self.fwd(self.signed_to_rns(digits))
        b = self.fwd(self.torus_to_rns(torus_poly))
        prod = self.plan.inv(self.pointwise(a, b))
        return self.to_torus(prod)


class TorusNttPlanU32:
    """u32-engine torus plan: four sub-30-bit CRT primes through the
    fused Pallas MXU NTT (math/pmntt.py), with the keyswitch-shaped
    digit contraction fused into the inverse transform (inv_ks).

    This is the TPU-fast replacement for TorusNttPlan's two 62-bit
    primes: each transform is ONE Pallas kernel (MXU dots + in-VMEM
    recombination) instead of ~30 unfused XLA u64-emulation passes, and
    the external-product digit contraction never round-trips HBM.
    Exactness: C = prod(moduli) > 2^116, so any centered product with
    |X| < C/2 * (1 - 2^-27) reconstructs exactly mod 2^64 — external
    products bound |X| < (k+1) * l * N * 2^(radix_log-1) * 2^64
    <= 2^98 at the production configs (N=1024, l=2, radix_log=23).

    Reconstruction uses 60-bit one-sided fixed point (g_i =
    ceil(2^60/c_i), each y_i*g_i < 2^61, the k-term sum < 2^63): the
    wrap count alpha = floor(sum y_i/c_i + 1/2) is exact under the same
    one-sided argument as rns.RnsBase's 128-bit path (error in
    [0, 2^-28)), at a quarter of the passes."""

    def __init__(self, n: int, k: int = 4):
        from sunscreen_tpu.math import pmntt
        mods = tuple(primes.gen_ntt_primes(30, k, n))
        self.n = n
        self.base = rns.RnsBase(mods)
        self.plan = pmntt.get_plan(n, mods)
        self.theta = jnp.asarray(np.array(
            [p & 0xFFFFFFFFFFFFFFFF for p in self.base.punctured],
            dtype=np.uint64)).reshape(k, 1)
        self.c_mod = U64(self.base.product & 0xFFFFFFFFFFFFFFFF)
        self.g60 = jnp.asarray(np.array(
            [((1 << 60) + q - 1) // q for q in mods],
            dtype=np.uint64)).reshape(k, 1)

    def torus_to_rns(self, t):
        """u64 torus [..., N] -> [..., k, N] u32 residues."""
        k = self.base.k
        return m.barrett_reduce_64(
            t[..., None, :], self.base.q64_dev.reshape(k, 1),
            self.base.ratio_hi_dev.reshape(k, 1),
            self.base.ratio_lo_dev.reshape(k, 1)).astype(jnp.uint32)

    def signed_to_rns(self, d):
        from sunscreen_tpu.math import sampling
        return sampling.signed_to_rns(d, self.base.q_dev)

    def fwd(self, x_rns):
        return self.plan.fwd(x_rns)

    def contract_inv(self, d_hat, k0, k1):
        """NTT-domain digit contraction against two key components,
        fused into the inverse transform: d_hat [..., kdig, k, N],
        k0/k1 [kdig, k, N] -> coefficient-domain [..., 2, k, N]."""
        return self.plan.inv_ks(d_hat, k0, k1)

    def ks_full(self, d_rns, k0, k1):
        """Whole per-step keyswitch in ONE Pallas call: coefficient-
        domain digit residues [..., kdig, k, N] -> [..., 2, k, N]
        (digit forward transforms + contraction + inverse fused).
        Inside the blind-rotate loop each step then pays ONE kernel
        launch instead of two — launch count, not MXU work, dominates
        the small-N step (PERF_NOTES round-5 TFHE note)."""
        return self.plan.ks_full_limbs(d_rns, k0, k1)

    def to_torus(self, x_rns):
        """[..., k, N] u32 residues of a centered value -> exact u64
        (mod 2^64); valid for |X| < C/2 * (1 - 2^-27)."""
        y = self.base.normalize_digits(x_rns).astype(U64)
        alpha = (jnp.sum(y * self.g60, axis=-2)
                 + (U64(1) << jnp.uint64(59))) >> jnp.uint64(60)
        total = jnp.sum(y * self.theta, axis=-2)  # wrapping mod 2^64
        return total - alpha * self.c_mod


@lru_cache(maxsize=8)
def get_torus_plan_u32(n: int, k: int = 4) -> TorusNttPlanU32:
    """Eager-constructed u32 torus plan (same tracer-leak discipline as
    get_torus_plan)."""
    import jax
    with jax.ensure_compile_time_eval():
        return TorusNttPlanU32(n, k)


@lru_cache(maxsize=32)
def get_torus_plan(n: int, k: int = 2) -> TorusNttPlan:
    """k=2 (C ~ 2^124) covers small-digit x torus products (external
    products, keyswitches). k=3 (C ~ 2^186) covers FULL torus x torus
    negacyclic products — needed by the GLWE mask.sk dot so UNIFORM
    (non-binary) secret keys stay exact (reference:
    `generate_uniform_glwe_sk`, high_level.rs:173).

    Construction is forced eager (ensure_compile_time_eval): a cache
    miss INSIDE a jit trace would otherwise capture the plan's device
    constants as tracers of that trace and poison every later use
    (the cached-jnp-constant leak — CLAUDE.md gotchas; surfaced when
    the k split gave encrypt and external-product DIFFERENT cache
    keys, so eager encrypts no longer pre-warmed the jitted path)."""
    import jax
    with jax.ensure_compile_time_eval():
        return TorusNttPlan(n, k)


def negacyclic_monomial_mul(poly, e, n: int):
    """X^e * poly for e in [0, 2N), traced e OK: gather with sign.
    poly: u64 [..., N]."""
    e = jnp.asarray(e, dtype=jnp.int64)
    idx = jnp.arange(n, dtype=jnp.int64)
    src = (idx - e) % (2 * n)
    neg = src >= n
    src = jnp.where(neg, src - n, src)
    gathered = jnp.take(poly, src, axis=-1)
    return jnp.where(neg, (-gathered.astype(jnp.int64)).astype(U64),
                     gathered)
