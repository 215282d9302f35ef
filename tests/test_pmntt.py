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


def test_inv_tensor3_matches_pointwise_then_inv():
    """The fused convolution+inverse kernel == FusedTensor3 followed by
    plan.inv (bit-identical: same reduce formulas, same inverse core)."""
    from sunscreen_tpu.math import prns
    n = 256
    mods, plan, _ = _plans(n, k=3)
    rng = np.random.default_rng(11)
    for rows in (1, 2):
        a = np.empty((rows, 2, len(mods), n), np.uint32)
        b = np.empty((rows, 2, len(mods), n), np.uint32)
        for i, q in enumerate(mods):
            a[..., i, :] = rng.integers(0, q, (rows, 2, n), dtype=np.uint32)
            b[..., i, :] = rng.integers(0, q, (rows, 2, n), dtype=np.uint32)
        aj, bj = jnp.asarray(a), jnp.asarray(b)
        want = np.asarray(plan.inv(prns.FusedTensor3(mods)(aj, bj)))
        got = np.asarray(plan.inv_tensor3(aj, bj))
        np.testing.assert_array_equal(got, want)


def test_inv_ks_matches_inner_then_inv():
    """The fused keyswitch-contraction+inverse kernel == FusedKsInner
    followed by plan.inv."""
    from sunscreen_tpu.math import prns
    n = 256
    mods, plan, _ = _plans(n, k=3)
    rng = np.random.default_rng(12)
    kdig = 2
    rows = 2
    k = len(mods)
    d_hat = np.empty((rows, kdig, k, n), np.uint32)
    k0 = np.empty((kdig, k, n), np.uint32)
    k1 = np.empty((kdig, k, n), np.uint32)
    for j, q in enumerate(mods):
        d_hat[..., j, :] = rng.integers(0, q, (rows, kdig, n),
                                        dtype=np.uint32)
        k0[:, j] = rng.integers(0, q, (kdig, n), dtype=np.uint32)
        k1[:, j] = rng.integers(0, q, (kdig, n), dtype=np.uint32)
    dj = jnp.asarray(d_hat)
    k0j, k1j = jnp.asarray(k0), jnp.asarray(k1)
    want = np.asarray(plan.inv(prns.FusedKsInner(mods)(dj, k0j, k1j)))
    got = np.asarray(plan.inv_ks(dj, k0j, k1j))
    np.testing.assert_array_equal(got, want)


def test_ks_full_matches_broadcast_then_inv_ks():
    """The round-5 keyswitch megakernel (raw digits -> fwd -> contract
    -> inv in one Pallas call) == fwd_broadcast followed by inv_ks,
    bit-exactly — including digit values ABOVE every modulus (the
    raw-digit exactness envelope covers any u32)."""
    n = 256
    mods, plan, _ = _plans(n, k=3)
    rng = np.random.default_rng(13)
    kdig = 3
    rows = 2
    k = len(mods)
    # raw digits: full-range u32 (NOT reduced mod any q)
    d = rng.integers(0, 1 << 32, (rows, kdig, n), dtype=np.uint32)
    k0 = np.empty((kdig, k, n), np.uint32)
    k1 = np.empty((kdig, k, n), np.uint32)
    for j, q in enumerate(mods):
        k0[:, j] = rng.integers(0, q, (kdig, n), dtype=np.uint32)
        k1[:, j] = rng.integers(0, q, (kdig, n), dtype=np.uint32)
    dj = jnp.asarray(d)
    k0j, k1j = jnp.asarray(k0), jnp.asarray(k1)
    want = np.asarray(plan.inv_ks(plan.fwd_broadcast(dj), k0j, k1j))
    got = np.asarray(plan.ks_full(dj, k0j, k1j))
    np.testing.assert_array_equal(got, want)
    # leading-batch-axis reshape path
    got1 = np.asarray(plan.ks_full(dj[0], k0j, k1j))
    np.testing.assert_array_equal(got1, want[0])


def test_fwd_tensor3_matches_fwd_then_pointwise():
    """The round-5 tensor megakernel (4 forward transforms + component
    convolution [+ 3 inverse transforms when full]) == plan.fwd
    followed by FusedTensor3 [followed by plan.inv], bit-exactly."""
    from sunscreen_tpu.math import prns
    n = 256
    mods, plan, _ = _plans(n, k=3)
    rng = np.random.default_rng(17)
    k = len(mods)
    for rows in (1, 2):
        ext = np.empty((rows, 4, k, n), np.uint32)
        for j, q in enumerate(mods):
            ext[..., j, :] = rng.integers(0, q, (rows, 4, n),
                                          dtype=np.uint32)
        xj = jnp.asarray(ext)
        both = plan.fwd(xj)
        want_hat = np.asarray(prns.FusedTensor3(mods)(
            both[:, :2], both[:, 2:]))
        got_hat = np.asarray(plan.fwd_tensor3(xj, full=False))
        np.testing.assert_array_equal(got_hat, want_hat)
        want_full = np.asarray(plan.inv(jnp.asarray(want_hat)))
        got_full = np.asarray(plan.fwd_tensor3(xj, full=True))
        np.testing.assert_array_equal(got_full, want_full)


def test_ks_full_limbs_matches_fwd_then_inv_ks():
    """The per-limb-residue megakernel variant (TFHE signed-digit
    shape) == plan.fwd followed by inv_ks, bit-exactly."""
    n = 256
    mods, plan, _ = _plans(n, k=3)
    rng = np.random.default_rng(23)
    kdig = 4
    rows = 2
    k = len(mods)
    d = np.empty((rows, kdig, k, n), np.uint32)
    k0 = np.empty((kdig, k, n), np.uint32)
    k1 = np.empty((kdig, k, n), np.uint32)
    for j, q in enumerate(mods):
        d[..., j, :] = rng.integers(0, q, (rows, kdig, n),
                                    dtype=np.uint32)
        k0[:, j] = rng.integers(0, q, (kdig, n), dtype=np.uint32)
        k1[:, j] = rng.integers(0, q, (kdig, n), dtype=np.uint32)
    dj = jnp.asarray(d)
    k0j, k1j = jnp.asarray(k0), jnp.asarray(k1)
    want = np.asarray(plan.inv_ks(plan.fwd(dj), k0j, k1j))
    got = np.asarray(plan.ks_full_limbs(dj, k0j, k1j))
    np.testing.assert_array_equal(got, want)
