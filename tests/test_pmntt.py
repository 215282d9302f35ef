"""Hybrid MXU/Pallas NTT (math/pmntt.py) bit-exactness vs the unrolled
u32 plan and the python-int negacyclic oracle (interpret mode on CPU;
real-TPU compilation exercised by benchmarks)."""

import random

import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.math import ntt, primes

RNG = random.Random(0xFACE)


def naive_negacyclic_mul(a, b, q, n):
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


def _plans(n, bits=29, k=2):
    mods = tuple(primes.gen_ntt_primes(bits, k, n))
    return (mods, ntt.get_plan(n, mods, mode="pallas"),
            ntt.get_plan(n, mods, mode="unrolled"))


def test_pmntt_is_selected_and_u32():
    mods, plan, _ = _plans(256)
    assert type(plan).__name__ == "PallasMatmulNttPlan"
    assert plan.word == jnp.uint32


def test_pmntt_roundtrip():
    mods, plan, _ = _plans(512)
    x = np.array([[RNG.randrange(q) for _ in range(512)] for q in mods],
                 dtype=np.uint32)
    back = np.asarray(plan.inv(plan.fwd(jnp.asarray(x))))
    np.testing.assert_array_equal(back, x)


def test_pmntt_negacyclic_matches_naive():
    n = 256
    mods, plan, _ = _plans(n)
    a = [[RNG.randrange(q) for _ in range(n)] for q in mods]
    b = [[RNG.randrange(q) for _ in range(n)] for q in mods]
    got = np.asarray(plan.negacyclic_mul(
        jnp.asarray(np.array(a, np.uint32)),
        jnp.asarray(np.array(b, np.uint32))))
    for lim, q in enumerate(mods):
        want = naive_negacyclic_mul(a[lim], b[lim], q, n)
        np.testing.assert_array_equal(got[lim], np.array(want, np.uint32))


def test_pmntt_matches_unrolled_batched():
    """negacyclic_mul bit-identical to the unrolled u32 engine across
    batch sizes (including bb-subdividing and non-dividing rows)."""
    n = 256
    mods, plan, ref = _plans(n)
    rng = np.random.default_rng(7)
    for rows in (1, 3, 4):
        x = jnp.asarray(rng.integers(0, min(mods), (rows, len(mods), n)),
                        dtype=jnp.uint32)
        y = jnp.asarray(rng.integers(0, min(mods), (rows, len(mods), n)),
                        dtype=jnp.uint32)
        np.testing.assert_array_equal(
            np.asarray(plan.negacyclic_mul(x, y)),
            np.asarray(ref.negacyclic_mul(x, y)))


def test_pmntt_fallbacks():
    """Out-of-envelope requests degrade exactly as get_plan documents."""
    big = tuple(primes.gen_ntt_primes(44, 1, 256))
    assert type(ntt.get_plan(256, big, mode="pallas")).__name__ \
        == "MatmulNttPlan"
    small_n = tuple(primes.gen_ntt_primes(29, 1, 128))
    assert type(ntt.get_plan(128, small_n, mode="pallas")).__name__ \
        == "MatmulNttPlan"
