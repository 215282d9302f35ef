"""End-to-end BFV: encrypt -> evaluate -> decrypt round trips.

Analogue of the reference's `seal_fhe/tests/assumptions.rs` +
`sunscreen_runtime/src/run.rs:546-882` interpreter tests: every evaluator
op is checked against exact mod-t polynomial arithmetic.
"""

import jax
import numpy as np
import pytest

from sunscreen_tpu.bfv import BatchEncoder, BfvParams, get_context, keys, ops
from sunscreen_tpu.math import ntt

RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def setup():
    params = BfvParams.insecure(poly_degree=1024, limbs=2, limb_bits=40)
    ctx = get_context(params)
    key = jax.random.key(42)
    sk = keys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
    pk = keys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
    rlk = keys.gen_relin_key(ctx, sk, jax.random.fold_in(key, 2))
    return ctx, sk, pk, rlk, key


def rand_pt(ctx, n=None):
    return RNG.integers(0, ctx.t, size=(n or ctx.n,), dtype=np.uint64)


def plain_ring(ctx):
    return ntt.get_plan(ctx.n, (ctx.t,))


def test_encrypt_decrypt_roundtrip(setup):
    ctx, sk, pk, _, key = setup
    pt = rand_pt(ctx)
    ct = ops.encrypt(ctx, pk, pt, jax.random.fold_in(key, 10))
    np.testing.assert_array_equal(np.asarray(ops.decrypt(ctx, sk, ct)), pt)
    budget = float(ops.invariant_noise_budget(ctx, sk, ct))
    assert budget > 20, budget


def test_symmetric_encrypt(setup):
    ctx, sk, _, _, key = setup
    pt = rand_pt(ctx)
    ct = ops.encrypt_symmetric(ctx, sk, pt, jax.random.fold_in(key, 11))
    np.testing.assert_array_equal(np.asarray(ops.decrypt(ctx, sk, ct)), pt)


def test_add_sub_negate(setup):
    ctx, sk, pk, _, key = setup
    a, b = rand_pt(ctx), rand_pt(ctx)
    ca = ops.encrypt(ctx, pk, a, jax.random.fold_in(key, 12))
    cb = ops.encrypt(ctx, pk, b, jax.random.fold_in(key, 13))
    t = ctx.t
    np.testing.assert_array_equal(
        np.asarray(ops.decrypt(ctx, sk, ops.add(ctx, ca, cb))),
        (a + b) % t)
    np.testing.assert_array_equal(
        np.asarray(ops.decrypt(ctx, sk, ops.sub(ctx, ca, cb))),
        (a.astype(np.int64) - b.astype(np.int64)) % t)
    np.testing.assert_array_equal(
        np.asarray(ops.decrypt(ctx, sk, ops.negate(ctx, ca))),
        (-a.astype(np.int64)) % t)


def test_plain_ops(setup):
    ctx, sk, pk, _, key = setup
    a, b = rand_pt(ctx), rand_pt(ctx)
    ca = ops.encrypt(ctx, pk, a, jax.random.fold_in(key, 14))
    t = ctx.t
    np.testing.assert_array_equal(
        np.asarray(ops.decrypt(ctx, sk, ops.add_plain(ctx, ca, b))),
        (a + b) % t)
    np.testing.assert_array_equal(
        np.asarray(ops.decrypt(ctx, sk, ops.sub_plain(ctx, ca, b))),
        (a.astype(np.int64) - b.astype(np.int64)) % t)
    expect = np.asarray(plain_ring(ctx).negacyclic_mul(
        a[None, :], b[None, :]))[0]
    got = ops.decrypt(ctx, sk, ops.multiply_plain(ctx, ca, b))
    np.testing.assert_array_equal(np.asarray(got), expect)


def test_multiply_relinearize(setup):
    ctx, sk, pk, rlk, key = setup
    a, b = rand_pt(ctx), rand_pt(ctx)
    ca = ops.encrypt(ctx, pk, a, jax.random.fold_in(key, 15))
    cb = ops.encrypt(ctx, pk, b, jax.random.fold_in(key, 16))
    expect = np.asarray(plain_ring(ctx).negacyclic_mul(
        a[None, :], b[None, :]))[0]
    prod = ops.multiply(ctx, ca, cb)
    assert prod.shape[-3] == 3
    np.testing.assert_array_equal(
        np.asarray(ops.decrypt(ctx, sk, prod)), expect)
    lin = ops.relinearize(ctx, prod, rlk)
    assert lin.shape[-3] == 2
    np.testing.assert_array_equal(
        np.asarray(ops.decrypt(ctx, sk, lin)), expect)
    budget = float(ops.invariant_noise_budget(ctx, sk, lin))
    assert budget > 5, budget


def test_relin_consumes_no_budget(setup):
    # reference assumption test: relinearization consumes (almost) no
    # noise budget (`seal_fhe/tests/assumptions.rs`)
    ctx, sk, pk, rlk, key = setup
    a = rand_pt(ctx)
    ca = ops.encrypt(ctx, pk, a, jax.random.fold_in(key, 17))
    prod = ops.multiply(ctx, ca, ca)
    before = float(ops.invariant_noise_budget(ctx, sk, prod))
    after = float(ops.invariant_noise_budget(
        ctx, sk, ops.relinearize(ctx, prod, rlk)))
    assert after >= before - 2, (before, after)


def test_ct_times_ct_grows_ct_times_pt_does_not(setup):
    # reference assumption: ct*ct increases polynomial count, ct*pt does
    # not (`assumptions.rs`, cited in insert_relinearizations.rs:50-53)
    ctx, sk, pk, _, key = setup
    a = rand_pt(ctx)
    ca = ops.encrypt(ctx, pk, a, jax.random.fold_in(key, 18))
    assert ops.multiply(ctx, ca, ca).shape[-3] == 3
    assert ops.multiply_plain(ctx, ca, a).shape[-3] == 2


def test_batch_encoder_roundtrip(setup):
    ctx = setup[0]
    enc = BatchEncoder(ctx)
    v = rand_pt(ctx)
    np.testing.assert_array_equal(
        np.asarray(enc.decode(enc.encode(v))), v)
    sv = RNG.integers(-1000, 1000, size=(ctx.n,))
    np.testing.assert_array_equal(
        np.asarray(enc.decode_signed(enc.encode_signed(sv))), sv)


def test_batched_simd_semantics(setup):
    # slot-wise add/mul under encryption
    ctx, sk, pk, rlk, key = setup
    enc = BatchEncoder(ctx)
    a, b = rand_pt(ctx), rand_pt(ctx)
    ca = ops.encrypt(ctx, pk, enc.encode(a), jax.random.fold_in(key, 19))
    cb = ops.encrypt(ctx, pk, enc.encode(b), jax.random.fold_in(key, 20))
    got_add = enc.decode(ops.decrypt(ctx, sk, ops.add(ctx, ca, cb)))
    np.testing.assert_array_equal(np.asarray(got_add), (a + b) % ctx.t)
    got_mul = enc.decode(ops.decrypt(
        ctx, sk, ops.multiply_relin(ctx, ca, cb, rlk)))
    np.testing.assert_array_equal(
        np.asarray(got_mul), (a.astype(object) * b) % ctx.t)


def test_rotations(setup):
    ctx, sk, pk, _, key = setup
    gks = keys.gen_galois_keys(
        ctx, sk, jax.random.fold_in(key, 3),
        keys.default_rotation_elements(ctx))
    enc = BatchEncoder(ctx)
    v = rand_pt(ctx)
    half = ctx.n // 2
    ct = ops.encrypt(ctx, pk, enc.encode(v), jax.random.fold_in(key, 21))
    # rotate rows by 1: each row cyclically shifts
    got = np.asarray(enc.decode(ops.decrypt(
        ctx, sk, ops.rotate_rows(ctx, ct, 1, gks))))
    expect = np.concatenate(
        [np.roll(v[:half], -1), np.roll(v[half:], -1)])
    np.testing.assert_array_equal(got, expect)
    # rotate by 3 = decomposition 2+1
    got3 = np.asarray(enc.decode(ops.decrypt(
        ctx, sk, ops.rotate_rows(ctx, ct, 3, gks))))
    expect3 = np.concatenate(
        [np.roll(v[:half], -3), np.roll(v[half:], -3)])
    np.testing.assert_array_equal(got3, expect3)
    # column swap
    gotc = np.asarray(enc.decode(ops.decrypt(
        ctx, sk, ops.rotate_columns(ctx, ct, gks))))
    np.testing.assert_array_equal(
        gotc, np.concatenate([v[half:], v[:half]]))


def test_exponentiate(setup):
    ctx, sk, pk, rlk, key = setup
    enc = BatchEncoder(ctx)
    v = RNG.integers(0, 100, size=(ctx.n,), dtype=np.uint64)
    ct = ops.encrypt(ctx, pk, enc.encode(v), jax.random.fold_in(key, 22))
    got = enc.decode(ops.decrypt(
        ctx, sk, ops.exponentiate(ctx, ct, 3, rlk)))
    np.testing.assert_array_equal(
        np.asarray(got), (v.astype(object) ** 3) % ctx.t)


def test_batched_ciphertext_axis(setup):
    # many ciphertexts in one kernel launch: leading batch axis
    ctx, sk, pk, rlk, key = setup
    pts = RNG.integers(0, ctx.t, size=(4, ctx.n), dtype=np.uint64)
    cts = jax.vmap(
        lambda p, k: ops.encrypt(ctx, pk, p, k))(
            pts, jax.random.split(jax.random.fold_in(key, 23), 4))
    assert cts.shape[:1] == (4,)
    prod = ops.multiply_relin(ctx, cts, cts, rlk)
    dec = np.asarray(ops.decrypt(ctx, sk, prod))
    plan_t = plain_ring(ctx)
    expect = np.asarray(plan_t.negacyclic_mul(
        pts[:, None, :], pts[:, None, :]))[:, 0]
    np.testing.assert_array_equal(dec, expect)


def test_mod_switch_to_next():
    # SEAL: Evaluator::mod_switch_to_next — drop a limb, decrypt intact
    import jax as _jax
    from sunscreen_tpu.bfv import BfvParams as _P, get_context as _g
    from sunscreen_tpu.math import sampling as _s
    params = _P.insecure(poly_degree=1024, limbs=3, limb_bits=40)
    ctx = _g(params)
    key = _jax.random.key(5)
    sk = keys.gen_secret_key(ctx, _jax.random.fold_in(key, 0))
    pk = keys.gen_public_key(ctx, sk, _jax.random.fold_in(key, 1))
    pt = RNG.integers(0, ctx.t, ctx.n, dtype=np.uint64)
    ct = ops.encrypt(ctx, pk, pt, _jax.random.fold_in(key, 2))
    switched = ops.mod_switch_to_next(ctx, ct)
    assert switched.shape[-2] == ctx.k - 1
    ctx2 = ops.mod_switch_context(ctx)
    s_q = _s.signed_to_rns(sk.s, ctx2.q_base.q_dev)
    s_key = _s.signed_to_rns(sk.s, ctx2.key_base.q_dev)
    sk2 = keys.SecretKey(sk.s, ctx2.plan_q.fwd(s_q),
                         ctx2.plan_key.fwd(s_key))
    np.testing.assert_array_equal(
        np.asarray(ops.decrypt(ctx2, sk2, switched)), pt)
    assert float(ops.invariant_noise_budget(ctx2, sk2, switched)) > 0
