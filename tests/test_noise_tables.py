"""Pin the reference's published BFV noise tables.

`/root/reference/Tables_of_things.md:8-22` records, for SEAL-default
128-bit parameters at the minimum batching plain modulus:

  - noise budget cost of one Mul+relin: ~26 / ~28 / ~29 / ~30 bits at
    N = 4096 / 8192 / 16384 / 32768
  - fresh noise budget: 49 / 149 / 365 / 800 bits

These are the strongest semantics cross-checks available without
cargo/SEAL in this environment: if our RNS/noise pipeline drifted, the
measured invariant-noise budget would move by far more than the
tolerance. Fresh budget = log2(Q/t) - log2(2|v|): our HE-standard
modulus chain reserves a different special-prime share than SEAL's
bfv_default split, so we normalize the reference number by the log2(Q)
difference (SEAL ciphertext-prime bits hardcoded below) and check the
noise part with +/-5 bits tolerance.

N >= 16384 is gated behind SUNSCREEN_TPU_SLOW_TESTS=1 (single CPU core;
the unrolled-NTT compiles at those sizes take minutes).
"""

import os

import jax
import numpy as np
import pytest

from sunscreen_tpu.bfv import BfvParams, get_context, keys, ops
from sunscreen_tpu.math import primes

SLOW = os.environ.get("SUNSCREEN_TPU_SLOW_TESTS", "") == "1"

# (poly_degree, reference fresh budget, reference mul+relin cost,
#  SEAL bfv_default ciphertext-prime bits = total - trailing special:
#  4096: 109{36,36,37}, 8192: 218{43,43,44,44,44},
#  16384: 438{48,48,48,49x6}, 32768: 881{55,55,56,...,56})
TABLE = [
    (4096, 49, 26, 72),
    (8192, 149, 28, 174),
    (16384, 365, 29, 389),
    (32768, 800, 30, 825),
]


def min_batching_prime(n: int) -> int:
    """Smallest prime p = 1 (mod 2N) — the reference table's 'minimum
    plain modulus to support batching' (SEAL PlainModulus::Batching with
    the smallest workable bit size)."""
    t = 2 * n + 1
    while not primes.is_prime(t):
        t += 2 * n
    return t


@pytest.mark.parametrize("n,ref_fresh,ref_cost,seal_q_bits", TABLE,
                         ids=[str(r[0]) for r in TABLE])
def test_reference_noise_table(n, ref_fresh, ref_cost, seal_q_bits):
    if n >= 16384 and not SLOW:
        pytest.skip("set SUNSCREEN_TPU_SLOW_TESTS=1 for N>=16384")
    t = min_batching_prime(n)
    params = BfvParams.default(n, plain_modulus=t)
    our_q_bits = sum(q.bit_length() for q in params.coeff_modulus)
    ref_fresh = ref_fresh - (seal_q_bits - our_q_bits)
    ctx = get_context(params)
    key = jax.random.key(1234)
    sk = keys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
    pk = keys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
    rlk = keys.gen_relin_key(ctx, sk, jax.random.fold_in(key, 2))

    pt = np.zeros((n,), np.uint64)
    pt[0] = 1
    ct = ops.encrypt(ctx, pk, pt, jax.random.fold_in(key, 3))
    fresh = float(ops.invariant_noise_budget(ctx, sk, ct))
    assert abs(fresh - ref_fresh) <= 5, (
        f"fresh budget {fresh} deviates from reference {ref_fresh}")

    prod = ops.multiply_relin(ctx, ct, ct, rlk)
    after = float(ops.invariant_noise_budget(ctx, sk, prod))
    cost = fresh - after
    assert abs(cost - ref_cost) <= 5, (
        f"mul+relin cost {cost} deviates from reference {ref_cost}")
    # and the result still decrypts correctly (pt^2 = pt here)
    np.testing.assert_array_equal(np.asarray(ops.decrypt(ctx, sk, prod)), pt)
