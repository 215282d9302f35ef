"""NTT correctness pinned against python-int naive negacyclic convolution."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.math import ntt, primes

RNG = random.Random(0x5EED)


def naive_negacyclic_mul(a, b, q, n):
    """Schoolbook product in Z_q[X]/(X^N + 1) using python ints."""
    out = [0] * n
    for i, ai in enumerate(a):
        if ai == 0:
            continue
        for j, bj in enumerate(b):
            k = i + j
            if k < n:
                out[k] = (out[k] + ai * bj) % q
            else:
                out[k - n] = (out[k - n] - ai * bj) % q
    return out


def _rand_poly(n, q):
    return [RNG.randrange(q) for _ in range(n)]


def test_roundtrip_multiple_moduli():
    n = 1024
    mods = tuple(primes.gen_ntt_primes(30, 2, n) +
                 primes.gen_ntt_primes(50, 1, n) +
                 primes.gen_ntt_primes(61, 1, n))
    plan = ntt.get_plan(n, mods)
    x = np.array([[RNG.randrange(q) for _ in range(n)] for q in mods],
                 dtype=np.uint64)
    xj = jnp.asarray(x)
    back = np.asarray(plan.inv(plan.fwd(xj)))
    np.testing.assert_array_equal(back, x)


def test_negacyclic_product_matches_naive():
    n = 64
    mods = tuple(primes.gen_ntt_primes(44, 2, n))
    plan = ntt.get_plan(n, mods)
    a = [_rand_poly(n, q) for q in mods]
    b = [_rand_poly(n, q) for q in mods]
    got = np.asarray(plan.negacyclic_mul(
        jnp.asarray(np.array(a, dtype=np.uint64)),
        jnp.asarray(np.array(b, dtype=np.uint64))))
    for lim, q in enumerate(mods):
        want = naive_negacyclic_mul(a[lim], b[lim], q, n)
        np.testing.assert_array_equal(got[lim], np.array(want, np.uint64))


def test_batched_and_jitted():
    n = 256
    mods = tuple(primes.gen_ntt_primes(45, 3, n))
    plan = ntt.get_plan(n, mods)
    x = np.array(
        [[[RNG.randrange(q) for _ in range(n)] for q in mods]
         for _ in range(4)], dtype=np.uint64)  # (batch=4, k=3, N)
    xj = jnp.asarray(x)
    f = jax.jit(lambda v: plan.inv(plan.fwd(v)))
    np.testing.assert_array_equal(np.asarray(f(xj)), x)
    # batched == per-item
    one = np.asarray(plan.fwd(xj[1]))
    allb = np.asarray(plan.fwd(xj))[1]
    np.testing.assert_array_equal(one, allb)


def test_multiply_by_one_is_identity():
    n = 128
    mods = tuple(primes.gen_ntt_primes(59, 1, n))
    plan = ntt.get_plan(n, mods)
    a = np.array([_rand_poly(n, mods[0])], dtype=np.uint64)
    one = np.zeros((1, n), dtype=np.uint64)
    one[0, 0] = 1
    got = np.asarray(plan.negacyclic_mul(jnp.asarray(a), jnp.asarray(one)))
    np.testing.assert_array_equal(got, a)


def test_x_shift_negates_wraparound():
    # multiplying by X rotates coefficients with sign flip: the defining
    # negacyclic property (X^N = -1).
    n = 128
    q = primes.gen_ntt_primes(40, 1, n)[0]
    plan = ntt.get_plan(n, (q,))
    a = np.array([_rand_poly(n, q)], dtype=np.uint64)
    x_poly = np.zeros((1, n), dtype=np.uint64)
    x_poly[0, 1] = 1
    got = np.asarray(plan.negacyclic_mul(jnp.asarray(a), jnp.asarray(x_poly)))
    want = np.empty_like(a)
    want[0, 0] = (q - a[0, n - 1]) % q
    want[0, 1:] = a[0, :n - 1]
    np.testing.assert_array_equal(got, want)


def test_compact_path_bit_identical():
    # fori_loop lowering must match the unrolled path exactly
    # (same algorithm, same output ordering)
    import jax.numpy as jnp

    from sunscreen_tpu.math import ntt, primes
    n = 256
    moduli = tuple(primes.gen_ntt_primes(50, 2, n))
    plan = ntt.get_plan(n, moduli)
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.stack(
        [rng.integers(0, q, n, dtype=np.uint64) for q in moduli]))
    np.testing.assert_array_equal(
        np.asarray(plan.fwd(x)), np.asarray(plan.fwd_compact(x)))
    f = plan.fwd(x)
    np.testing.assert_array_equal(
        np.asarray(plan.inv(f)), np.asarray(plan.inv_compact(f)))
    np.testing.assert_array_equal(
        np.asarray(plan.inv_compact(plan.fwd_compact(x))), np.asarray(x))


def test_matmul_plan_matches_butterfly():
    # MXU four-step plan: natural-order NTT domain, but bit-exact in
    # coefficient domain (roundtrip + products agree with NttPlan).
    from sunscreen_tpu.math import mntt
    n = 256
    mods = tuple(primes.gen_ntt_primes(50, 2, n) +
                 primes.gen_ntt_primes(30, 1, n))
    mp = mntt.get_plan(n, mods)
    bp = ntt.get_plan(n, mods)
    rng = np.random.default_rng(7)
    qarr = np.array(mods, dtype=np.uint64).reshape(1, len(mods), 1)
    x = rng.integers(0, 1 << 49, size=(2, len(mods), n),
                     dtype=np.uint64) % qarr
    y = rng.integers(0, 1 << 49, size=(2, len(mods), n),
                     dtype=np.uint64) % qarr
    np.testing.assert_array_equal(np.asarray(mp.inv(mp.fwd(x))), x)
    np.testing.assert_array_equal(
        np.asarray(mp.negacyclic_mul(x, y)),
        np.asarray(bp.negacyclic_mul(x, y)))


def test_matmul_plan_jit_and_odd_split():
    # N with an odd log2 (n1 != n2) + under jit
    from sunscreen_tpu.math import mntt
    n = 512
    mods = tuple(primes.gen_ntt_primes(45, 2, n))
    mp = mntt.get_plan(n, mods)
    assert mp.n1 != mp.n2
    rng = np.random.default_rng(11)
    qarr = np.array(mods, dtype=np.uint64).reshape(len(mods), 1)
    x = rng.integers(0, 1 << 44, size=(len(mods), n),
                     dtype=np.uint64) % qarr
    f = jax.jit(lambda v: mp.inv(mp.fwd(v)))
    np.testing.assert_array_equal(np.asarray(f(x)), x)
