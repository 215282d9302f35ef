"""Randomness for lattice crypto: uniform mod-q, ternary, and CBD noise.

Replaces SEAL's samplers (`util/rlwe.cpp`: sample_poly_uniform /
sample_poly_ternary / Gaussian error with sigma=3.2 — the Sunscreen SEAL
fork builds with SEAL_USE_GAUSSIAN_NOISE=ON, `seal_fhe/build.rs`) and the
reference's `deterministic` test feature
(`sunscreen_runtime/src/runtime.rs:464-529`).

TPU-first: all sampling is jax.random (threefry) — deterministic per key,
reproducible across backends, fully vectorized. The error distribution is
a centered binomial CBD(21) with stddev sqrt(21/2) ≈ 3.24, matching the
reference's sigma ≈ 3.2 noise rate (bit-exact replication of SEAL's
Blake2-based PRNG stream is out of scope by design — see SURVEY.md §7
"Hard parts": deterministic RNG compat).
"""

from __future__ import annotations

import secrets

import jax
import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.math import modular as m

U64 = jnp.uint64

CBD_WEIGHT = 21  # CBD(21): variance 21/2, sigma ~ 3.24 (SEAL sigma = 3.2)


def fresh_key():
    """A PRNG key with full OS entropy (128-bit rbg key data).

    The default threefry impl's key is only 64 bits, which is too small
    a space for encryption randomness; the rbg impl carries 4x32-bit key
    words, all drawn here from `secrets.token_bytes`. This is the
    default randomness source for keygen/encrypt; passing an explicit
    integer seed instead is a deterministic TEST-ONLY mode (mirrors the
    reference's `deterministic` feature being opt-in,
    `sunscreen_runtime/src/runtime.rs:464-529`).
    """
    data = np.frombuffer(secrets.token_bytes(16), dtype=np.uint32)
    return jax.random.wrap_key_data(jnp.asarray(data), impl="rbg")


def key_from_seed(seed: int | None):
    """seed=None -> fresh OS-entropy key; int seed -> deterministic
    threefry key (test-only, insecure)."""
    return fresh_key() if seed is None else jax.random.key(seed)


def uniform_mod_q(key, shape, base):
    """Uniform residues in [0, q_i) per limb; shape excludes the limb axis.

    Draws 64+bitlen(q)-1 bits per element and Barrett-reduces: statistical
    distance < 2^-63 from uniform. `base` is an `rns.RnsBase`; the result
    is returned in the base's engine word (u32 downcast is exact — the
    value is already < q).
    """
    q_limbs, ratio_hi, ratio_lo = (base.q64_dev, base.ratio_hi_dev,
                                   base.ratio_lo_dev)
    k = q_limbs.shape[0]
    full_shape = shape[:-1] + (k, shape[-1])
    hi = jax.random.bits(key, full_shape, dtype=jnp.uint64)
    key2 = jax.random.fold_in(key, 1)
    lo = jax.random.bits(key2, full_shape, dtype=jnp.uint64)
    # mask hi so that hi*2^64+lo < q*2^64 (Barrett precondition): keep the
    # low bitlen(q)-1 bits -> hi < 2^(bitlen(q)-1) <= q. Build the all-ones
    # mask by bit-smearing q>>1.
    qk = q_limbs.reshape((1,) * (len(shape) - 1) + (k, 1))
    v = qk >> U64(1)
    for s in (1, 2, 4, 8, 16, 32):
        v = v | (v >> U64(s))
    hi = hi & v
    return m.barrett_reduce_128(
        hi, lo, qk,
        ratio_hi.reshape(qk.shape[-2:]),
        ratio_lo.reshape(qk.shape[-2:])).astype(base.word)


def ternary(key, shape):
    """Uniform in {-1, 0, 1}, returned as int8 signed values."""
    return (jax.random.randint(key, shape, 0, 3, dtype=jnp.int8) - 1)


def cbd(key, shape, weight: int = CBD_WEIGHT):
    """Centered binomial: popcount(a) - popcount(b) over `weight` bits each.

    Returns int32 in [-weight, weight], sigma = sqrt(weight/2).
    """
    a = jax.random.bits(key, shape, dtype=jnp.uint32)
    b = jax.random.bits(jax.random.fold_in(key, 1), shape, dtype=jnp.uint32)
    mask = jnp.uint32((1 << weight) - 1)
    pa = jax.lax.population_count(a & mask).astype(jnp.int32)
    pb = jax.lax.population_count(b & mask).astype(jnp.int32)
    return pa - pb


def signed_to_rns(x, q_limbs):
    """Lift small signed ints [..., N] (|x| < min q_i) to residues
    [..., k, N]."""
    k = q_limbs.shape[0]
    qk = q_limbs.reshape((k, 1))
    xu = x[..., None, :].astype(jnp.int64)
    pos = jnp.where(xu >= 0, xu, 0).astype(qk.dtype)
    neg = jnp.where(xu < 0, -xu, 0).astype(qk.dtype)
    return m.sub_mod(pos, neg, qk)
