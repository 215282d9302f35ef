"""Pallas kernel bit-exactness vs math.modular (interpret mode — real
TPU compilation exercised by benchmarks)."""

import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.math import modular as m
from sunscreen_tpu.math import pallas_kernels as pk
from sunscreen_tpu.math import primes


def test_pallas_mul_mod_matches_barrett():
    q = primes.gen_ntt_primes(50, 1, 128)[0]
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, q, (8, 128), dtype=np.uint64))
    b = jnp.asarray(rng.integers(0, q, (8, 128), dtype=np.uint64))
    fn = pk.make_pointwise_mul_mod(q, interpret=True)
    oh, ol = fn(*pk.split_u64(a), *pk.split_u64(b))
    got = pk.join_u64(oh, ol)
    rh, rl = m.barrett_ratio(q)
    expect = m.mul_mod(a, b, jnp.uint64(q), jnp.uint64(rh),
                       jnp.uint64(rl))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))


def test_pallas_mul_mod_62bit_modulus():
    q = primes.gen_ntt_primes(61, 1, 128)[0]
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, q, (8, 128), dtype=np.uint64))
    b = jnp.asarray(rng.integers(0, q, (8, 128), dtype=np.uint64))
    fn = pk.make_pointwise_mul_mod(q, interpret=True)
    got = pk.join_u64(*fn(*pk.split_u64(a), *pk.split_u64(b)))
    rh, rl = m.barrett_ratio(q)
    expect = m.mul_mod(a, b, jnp.uint64(q), jnp.uint64(rh),
                       jnp.uint64(rl))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))
