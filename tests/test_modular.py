"""Bit-exactness of the modular arithmetic core against python big ints.

Python ints are the golden oracle (the TPU analogue of the reference's
`seal_fhe/tests/assumptions.rs` strategy of pinning engine semantics)."""

import random

import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.math import modular as m
from sunscreen_tpu.math import primes

RNG = random.Random(0xC0FFEE)


def _rand_u64(n):
    return [RNG.getrandbits(64) for _ in range(n)]


def test_mul_wide_exact():
    a = _rand_u64(512) + [0, 1, 2**64 - 1]
    b = _rand_u64(512) + [2**64 - 1, 2**64 - 1, 2**64 - 1]
    aj = jnp.array(a, dtype=jnp.uint64)
    bj = jnp.array(b, dtype=jnp.uint64)
    hi, lo = m.mul_wide(aj, bj)
    hi = np.asarray(hi)
    lo = np.asarray(lo)
    for i, (x, y) in enumerate(zip(a, b)):
        p = x * y
        assert int(hi[i]) == p >> 64
        assert int(lo[i]) == p & ((1 << 64) - 1)


def test_add_sub_neg_mod():
    for qbits in (20, 30, 44, 60, 62):
        q = primes.gen_ntt_primes(qbits, 1, 1024)[0]
        a = [RNG.randrange(q) for _ in range(256)]
        b = [RNG.randrange(q) for _ in range(256)]
        qa = jnp.uint64(q)
        aj = jnp.array(a, dtype=jnp.uint64)
        bj = jnp.array(b, dtype=jnp.uint64)
        add = np.asarray(m.add_mod(aj, bj, qa))
        sub = np.asarray(m.sub_mod(aj, bj, qa))
        neg = np.asarray(m.neg_mod(aj, qa))
        np.testing.assert_array_equal(
            add, np.array([(x + y) % q for x, y in zip(a, b)], dtype=np.uint64))
        np.testing.assert_array_equal(
            sub, np.array([(x - y) % q for x, y in zip(a, b)], dtype=np.uint64))
        np.testing.assert_array_equal(
            neg, np.array([(-x) % q for x in a], dtype=np.uint64))


def test_barrett_mul_mod():
    for qbits in (20, 31, 44, 50, 61, 62):
        q = primes.gen_ntt_primes(qbits, 1, 2048)[0]
        r_hi, r_lo = m.barrett_ratio(q)
        a = [RNG.randrange(q) for _ in range(512)] + [0, q - 1]
        b = [RNG.randrange(q) for _ in range(512)] + [q - 1, q - 1]
        aj = jnp.array(a, dtype=jnp.uint64)
        bj = jnp.array(b, dtype=jnp.uint64)
        got = m.mul_mod(aj, bj, jnp.uint64(q), jnp.uint64(r_hi),
                        jnp.uint64(r_lo))
        want = np.array([(x * y) % q for x, y in zip(a, b)], dtype=np.uint64)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_barrett_reduce_64():
    q = primes.gen_ntt_primes(44, 1, 4096)[0]
    r_hi, r_lo = m.barrett_ratio(q)
    a = _rand_u64(512)
    aj = jnp.array(a, dtype=jnp.uint64)
    got = m.barrett_reduce_64(aj, jnp.uint64(q), jnp.uint64(r_hi),
                              jnp.uint64(r_lo))
    want = np.array([x % q for x in a], dtype=np.uint64)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_shoup_mul():
    for qbits in (30, 44, 61):
        q = primes.gen_ntt_primes(qbits, 1, 1024)[0]
        w = RNG.randrange(q)
        ws = m.shoup_ratio(w, q)
        x = [RNG.randrange(2 * q) for _ in range(512)]  # lazy domain
        xj = jnp.array(x, dtype=jnp.uint64)
        got = m.reduce_2q(
            m.mul_mod_shoup(xj, jnp.uint64(w), jnp.uint64(ws), jnp.uint64(q)),
            jnp.uint64(q))
        want = np.array([xi * w % q for xi in x], dtype=np.uint64)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_prime_gen_structure():
    ps = primes.gen_ntt_primes(44, 3, 8192)
    assert len(set(ps)) == 3
    for p in ps:
        assert p.bit_length() == 44
        assert p % (2 * 8192) == 1
        assert primes.is_prime(p)


def test_root_of_unity():
    q = primes.gen_ntt_primes(30, 1, 1024)[0]
    w = primes.min_root_of_unity(2048, q)
    assert pow(w, 2048, q) == 1
    assert pow(w, 1024, q) == q - 1  # primitive: w^(order/2) = -1
