"""Pallas u32-plane modular kernels pinned bit-exactly against the
u64 XLA reference and python-int oracles (interpret mode on CPU; the
same kernels compile on the TPU backend — verified on the v5e)."""

import numpy as np

import jax  # noqa: F401  (conftest pins cpu)
import jax.numpy as jnp

from sunscreen_tpu.math import modular as m
from sunscreen_tpu.math import pallas_mod as pm

RNG = np.random.default_rng(0xA11A5)

MODULI = ((1 << 50) - 27, (1 << 31) - 1, (1 << 56) - 5,
          0x3FFFFFFFFFFFFFE3)


def test_shoup_matches_reference_and_oracle():
    for q in MODULI:
        x = RNG.integers(0, q, size=(4, 256), dtype=np.uint64)
        w = RNG.integers(0, q, size=(4, 256), dtype=np.uint64)
        wsh = ((w.astype(object) << 64) // q).astype(np.uint64)
        got = np.asarray(pm.shoup_mul_mod(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(wsh), q))
        want = np.asarray(m.reduce_2q(m.mul_mod_shoup(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(wsh),
            jnp.uint64(q)), jnp.uint64(q)))
        np.testing.assert_array_equal(got, want)
        oracle = (x.astype(object) * w.astype(object)) % q
        np.testing.assert_array_equal(got.astype(object), oracle)


def test_mul_mod_matches_reference_and_oracle():
    for q in MODULI:
        a = RNG.integers(0, q, size=(4, 256), dtype=np.uint64)
        b = RNG.integers(0, q, size=(4, 256), dtype=np.uint64)
        rh, rl = m.barrett_ratio(q)
        got = np.asarray(pm.mul_mod(jnp.asarray(a), jnp.asarray(b), q))
        want = np.asarray(m.mul_mod(jnp.asarray(a), jnp.asarray(b),
                                    jnp.uint64(q), jnp.uint64(rh),
                                    jnp.uint64(rl)))
        np.testing.assert_array_equal(got, want)
        oracle = (a.astype(object) * b.astype(object)) % q
        np.testing.assert_array_equal(got.astype(object), oracle)


def test_lazy_input_range():
    """shoup accepts x in [0, 2q) like the u64 reference."""
    q = (1 << 50) - 27
    x = RNG.integers(0, 2 * q, size=(2, 256), dtype=np.uint64)
    w = RNG.integers(0, q, size=(2, 256), dtype=np.uint64)
    wsh = ((w.astype(object) << 64) // q).astype(np.uint64)
    got = np.asarray(pm.shoup_mul_mod(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(wsh), q))
    oracle = (x.astype(object) * w.astype(object)) % q
    np.testing.assert_array_equal(got.astype(object), oracle)


def test_broadcast_tables():
    """w tables broadcast over batch like the NTT twiddle use case."""
    q = (1 << 50) - 27
    x = RNG.integers(0, q, size=(3, 2, 128), dtype=np.uint64)
    w = RNG.integers(0, q, size=(2, 128), dtype=np.uint64)
    wsh = ((w.astype(object) << 64) // q).astype(np.uint64)
    got = np.asarray(pm.shoup_mul_mod(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(wsh), q))
    oracle = (x.astype(object) * w.astype(object)[None]) % q
    np.testing.assert_array_equal(got.astype(object), oracle)


def test_split_join_roundtrip():
    x = RNG.integers(0, 1 << 63, size=(5, 64), dtype=np.uint64)
    lo, hi = pm.split64(jnp.asarray(x))
    back = np.asarray(pm.join64(lo, hi))
    np.testing.assert_array_equal(back, x)
