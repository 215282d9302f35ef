"""u32-engine BFV tests: every modulus < 2^30, uint32 ciphertext storage.

The u32 engine is the TPU-native fast path (benchmarks/PERF_NOTES.md
"round-3 lever"): same HPS-RNS scheme logic as the u64 engine (shared
code, word-dispatched in math/modular.py), half the HBM traffic, native
32-bit products. These tests pin (a) the u32 modular primitives against
python-int ground truth, (b) all three NTT lowerings in u32, and (c) the
full scheme end-to-end — the same coverage test_bfv.py gives the u64
engine (reference semantics: seal_fhe/src/evaluator.rs:12-279).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sunscreen_tpu.bfv import BfvParams, encoder, get_context, keys, ops
from sunscreen_tpu.math import modular as m
from sunscreen_tpu.math import mntt, ntt, primes


def naive_negacyclic(a, b, q, n):
    out = [0] * n
    for i in range(n):
        ai = int(a[i])
        if ai == 0:
            continue
        for j in range(n):
            k = i + j
            v = ai * int(b[j])
            if k >= n:
                out[k - n] -= v
            else:
                out[k] += v
    return np.array([v % q for v in out], np.uint64)


@pytest.mark.parametrize("bits", [17, 20, 27, 29, 30])
def test_modular32_vs_python(bits):
    q = primes.gen_ntt_primes(bits, 1, 64)[0]
    mu, s1 = m.barrett32_consts(q)
    rng = np.random.default_rng(bits)
    a = rng.integers(0, q, 2048, dtype=np.uint32)
    b = rng.integers(0, q, 2048, dtype=np.uint32)
    qd = jnp.asarray(np.full(a.shape, q, np.uint32))
    mud = jnp.asarray(np.full(a.shape, mu, np.uint32))
    s1d = jnp.asarray(np.full(a.shape, s1, np.uint32))
    r = np.asarray(m.mul_mod32(jnp.asarray(a), jnp.asarray(b), qd, mud, s1d))
    exp = ((a.astype(object) * b.astype(object)) % q).astype(np.uint32)
    assert (r == exp).all()
    # shoup with lazy input x in [0, 2q)
    w = rng.integers(0, q, 2048, dtype=np.uint32)
    wsh = np.array([(int(x) << 32) // q for x in w], dtype=np.uint32)
    x = rng.integers(0, 2 * q, 2048, dtype=np.uint32)
    rs = np.asarray(m.reduce_2q(m.mul_mod_shoup32(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(wsh), qd), qd))
    exps = ((x.astype(object) * w.astype(object)) % q).astype(np.uint32)
    assert (rs == exps).all()
    # full-range sum reduction (w_reduce on widened sums)
    big = rng.integers(0, min(1 << (2 * bits), 1 << 63), 2048,
                       dtype=np.uint64)
    rr = np.asarray(m.reduce_long32(jnp.asarray(big), qd, mud, s1d))
    assert (rr == (big % q).astype(np.uint32)).all()


def test_ntt32_all_modes_agree():
    n = 128
    mods = tuple(primes.gen_ntt_primes(29, 2, n))
    rng = np.random.default_rng(1)
    a = rng.integers(0, mods[0], n, dtype=np.int64)
    b = rng.integers(0, mods[0], n, dtype=np.int64)
    A = jnp.stack([jnp.asarray(a % q, jnp.uint32) for q in mods])
    B = jnp.stack([jnp.asarray(b % q, jnp.uint32) for q in mods])
    results = {}
    for mode, plan in (
            ("unrolled", ntt.NttPlan(n, mods, mode="unrolled")),
            ("compact", ntt.NttPlan(n, mods, mode="compact")),
            ("matmul", mntt.MatmulNttPlan(n, mods))):
        assert plan.word == jnp.uint32
        rt = plan.inv(plan.fwd(A))
        assert rt.dtype == jnp.uint32
        assert (np.asarray(rt) == np.asarray(A)).all(), mode
        results[mode] = np.asarray(plan.negacyclic_mul(A, B))
    for li, q in enumerate(mods):
        exp = naive_negacyclic(a % q, b % q, q, n).astype(np.uint32)
        for mode, got in results.items():
            assert (got[li] == exp).all(), (mode, li)


@pytest.fixture(scope="module")
def ctx32():
    return get_context(BfvParams.insecure_u32(256))


@pytest.fixture(scope="module")
def keyset(ctx32):
    key = jax.random.key(7)
    sk = keys.gen_secret_key(ctx32, jax.random.fold_in(key, 0))
    pk = keys.gen_public_key(ctx32, sk, jax.random.fold_in(key, 1))
    rlk = keys.gen_relin_key(ctx32, sk, jax.random.fold_in(key, 2))
    return key, sk, pk, rlk


def test_u32_storage_and_roundtrip(ctx32, keyset):
    key, sk, pk, _ = keyset
    assert ctx32.word == jnp.uint32
    pt = jnp.asarray(np.arange(ctx32.n, dtype=np.uint64) % ctx32.t)
    ct = ops.encrypt(ctx32, pk, pt, jax.random.fold_in(key, 3))
    assert ct.dtype == jnp.uint32
    assert (np.asarray(ops.decrypt(ctx32, sk, ct)) == np.asarray(pt)).all()
    assert ops.invariant_noise_budget(ctx32, sk, ct) > 20
    cts = ops.encrypt_symmetric(ctx32, sk, pt, jax.random.fold_in(key, 4))
    assert (np.asarray(ops.decrypt(ctx32, sk, cts)) == np.asarray(pt)).all()


def test_u32_multiply_relin(ctx32, keyset):
    key, sk, pk, rlk = keyset
    t, n = ctx32.t, ctx32.n
    p1 = np.arange(n, dtype=np.int64) % t
    p2 = (np.arange(n, dtype=np.int64) * 7 + 3) % t
    c1 = ops.encrypt(ctx32, pk, jnp.asarray(p1.astype(np.uint64)),
                     jax.random.fold_in(key, 5))
    c2 = ops.encrypt(ctx32, pk, jnp.asarray(p2.astype(np.uint64)),
                     jax.random.fold_in(key, 6))
    prod = ops.multiply_relin(ctx32, c1, c2, rlk)
    assert prod.dtype == jnp.uint32 and prod.shape[-3] == 2
    exp = naive_negacyclic(p1, p2, t, n)
    assert (np.asarray(ops.decrypt(ctx32, sk, prod)) == exp).all()
    assert ops.invariant_noise_budget(ctx32, sk, prod) > 0
    # plain ops
    mp_ = ops.multiply_plain(ctx32, c1, jnp.asarray(p2.astype(np.uint64)))
    assert (np.asarray(ops.decrypt(ctx32, sk, mp_)) == exp).all()
    s = ops.add(ctx32, c1, c2)
    assert (np.asarray(ops.decrypt(ctx32, sk, s)).astype(np.int64)
            == (p1 + p2) % t).all()
    d = ops.sub(ctx32, c1, c2)
    assert (np.asarray(ops.decrypt(ctx32, sk, d)).astype(np.int64)
            == (p1 - p2) % t).all()


def test_u32_rotations(ctx32, keyset):
    key, sk, pk, _ = keyset
    gks = keys.gen_galois_keys(
        ctx32, sk, jax.random.fold_in(key, 8),
        (ctx32.rotate_rows_element(1), ctx32.rotate_columns_element))
    enc = encoder.BatchEncoder(ctx32)
    vals = np.arange(ctx32.n, dtype=np.int64) % 97
    ct = ops.encrypt(ctx32, pk, enc.encode(vals), jax.random.fold_in(key, 9))
    half = ctx32.n // 2
    rot = enc.decode(np.asarray(ops.decrypt(
        ctx32, sk, ops.rotate_rows(ctx32, ct, 1, gks))))
    exp = np.concatenate([np.roll(vals[:half], -1), np.roll(vals[half:], -1)])
    assert (np.asarray(rot) == exp).all()
    swap = enc.decode(np.asarray(ops.decrypt(
        ctx32, sk, ops.rotate_columns(ctx32, ct, gks))))
    assert (np.asarray(swap)
            == np.concatenate([vals[half:], vals[:half]])).all()


def test_u32_mod_switch(ctx32, keyset):
    key, sk, pk, _ = keyset
    from sunscreen_tpu.math import sampling
    pt = jnp.asarray(np.arange(ctx32.n, dtype=np.uint64) % ctx32.t)
    ct = ops.encrypt(ctx32, pk, pt, jax.random.fold_in(key, 10))
    ct2 = ops.mod_switch_to_next(ctx32, ct)
    ctx2 = ops.mod_switch_context(ctx32)
    sk2 = keys.SecretKey(
        sk.s,
        ctx2.plan_q.fwd(sampling.signed_to_rns(sk.s, ctx2.q_base.q_dev)),
        ctx2.plan_key.fwd(sampling.signed_to_rns(sk.s, ctx2.key_base.q_dev)))
    assert (np.asarray(ops.decrypt(ctx2, sk2, ct2)) == np.asarray(pt)).all()


def test_default_u32_params_structure():
    p = BfvParams.default_u32(8192)
    assert p.word_bits == 32
    assert all(q.bit_length() <= 30 for q in p.coeff_modulus)
    assert p.special_modulus.bit_length() <= 30
    total = sum(q.bit_length() for q in p.coeff_modulus)
    total += p.special_modulus.bit_length()
    assert total <= 218  # HE-standard 128-bit budget at N=8192
    # at least the u64 engine's noise capacity (log Q >= 162)
    assert sum(q.bit_length() for q in p.coeff_modulus) >= 160


def test_u32_multiply_relin_pallas_mode(monkeypatch):
    """End-to-end mul+relin through the fused MXU plan (pmntt),
    including the keyswitch raw-digit broadcast shortcut (ops.py
    keyswitch: the fused plan is exact for any u32 input)."""
    monkeypatch.setenv("SUNSCREEN_TPU_NTT", "pallas")
    params = BfvParams.insecure(poly_degree=256, limbs=2, limb_bits=28)
    ctx = get_context.__wrapped__(params) if hasattr(
        get_context, "__wrapped__") else get_context(params)
    assert ctx.plan_key.mode == "pallas", type(ctx.plan_key).__name__
    key = jax.random.key(3)
    sk = keys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
    pk = keys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
    rlk = keys.gen_relin_key(ctx, sk, jax.random.fold_in(key, 2))
    pt = (np.arange(256, dtype=np.uint64) * 3) % ctx.t
    ct = ops.encrypt(ctx, pk, jnp.asarray(pt), jax.random.fold_in(key, 3))
    out = ops.multiply_relin(ctx, ct, ct, rlk)
    dec = np.asarray(ops.decrypt(ctx, sk, out))
    want = naive_negacyclic(pt, pt, ctx.t, 256)
    np.testing.assert_array_equal(dec, want)
