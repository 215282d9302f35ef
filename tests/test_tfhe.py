"""TFHE: encryption, external products, CMUX, blind rotation,
keyswitching, programmable bootstrap (reference test surface:
`sunscreen_tfhe/src/ops/*` in-module tests with TEST_* params)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sunscreen_tpu.tfhe import (GlweDef, LweDef, RadixDecomposition,
                                TEST_GLWE_DEF_1, TEST_RADIX)
from sunscreen_tpu.tfhe import ops, torus
from sunscreen_tpu.tfhe.poly import get_torus_plan

KEY = jax.random.key(7)
LWE_SMALL = LweDef(dim=64, std=1e-16)  # fast-test LWE
RNG = np.random.default_rng(5)


def test_torus_encode_decode():
    msgs = jnp.arange(8, dtype=jnp.uint64)
    enc = torus.encode(msgs, 3)
    np.testing.assert_array_equal(np.asarray(torus.decode(enc, 3)), msgs)


def test_signed_decompose_recompose():
    vals = jnp.asarray(RNG.integers(0, 1 << 63, 64, dtype=np.uint64))
    digits = torus.signed_decompose(vals, 8, 6)
    assert int(jnp.max(jnp.abs(digits.astype(jnp.int64)))) <= 128
    rec = torus.recompose(digits, 8)
    # recomposition matches up to the dropped low bits (rounding)
    err = (np.asarray(rec).astype(np.int64)
           - np.asarray(vals).astype(np.int64))
    assert np.abs(err).max() <= 1 << (64 - 6 * 8 - 1)


def test_exact_negacyclic_torus_mul():
    n = 64
    plan = get_torus_plan(n)
    digits = RNG.integers(-128, 128, n)
    tor = RNG.integers(0, 1 << 64, n, dtype=np.uint64)
    got = np.asarray(plan.negacyclic_mul_signed_torus(
        jnp.asarray(digits), jnp.asarray(tor)))
    # python-int negacyclic oracle mod 2^64
    expect = np.zeros(n, dtype=np.uint64)
    acc = [0] * n
    for i, d in enumerate(digits.tolist()):
        for j, t in enumerate(tor.tolist()):
            k = i + j
            if k < n:
                acc[k] += d * t
            else:
                acc[k - n] -= d * t
    for i in range(n):
        expect[i] = acc[i] % (1 << 64)
    np.testing.assert_array_equal(got, expect)


def test_lwe_roundtrip():
    sk = ops.generate_binary_lwe_sk(LWE_SMALL, jax.random.fold_in(KEY, 0))
    msg = torus.encode(jnp.uint64(5), 3)
    ct = ops.encrypt_lwe(msg, sk, LWE_SMALL, jax.random.fold_in(KEY, 1))
    assert int(ops.decrypt_lwe(ct, sk, 3)) == 5
    # homomorphic add
    ct2 = ops.encrypt_lwe(torus.encode(jnp.uint64(2), 3), sk, LWE_SMALL,
                          jax.random.fold_in(KEY, 2))
    assert int(ops.decrypt_lwe(ops.lwe_add(ct, ct2), sk, 3)) == 7


def test_glwe_roundtrip():
    glwe = TEST_GLWE_DEF_1
    sk = ops.generate_binary_glwe_sk(glwe, jax.random.fold_in(KEY, 3))
    msgs = jnp.asarray(
        RNG.integers(0, 8, glwe.poly_degree, dtype=np.uint64))
    ct = ops.encrypt_glwe(torus.encode(msgs, 3), sk, glwe,
                          jax.random.fold_in(KEY, 4))
    np.testing.assert_array_equal(
        np.asarray(ops.decrypt_glwe(ct, sk, glwe, 3)), np.asarray(msgs))


def test_external_product_and_cmux():
    glwe = TEST_GLWE_DEF_1
    radix = TEST_RADIX
    sk = ops.generate_binary_glwe_sk(glwe, jax.random.fold_in(KEY, 5))
    msgs = jnp.asarray(
        RNG.integers(0, 4, glwe.poly_degree, dtype=np.uint64))
    ct = ops.encrypt_glwe(torus.encode(msgs, 2), sk, glwe,
                          jax.random.fold_in(KEY, 6))
    for bit in (0, 1):
        ggsw = ops.encrypt_ggsw(bit, sk, glwe, radix,
                                jax.random.fold_in(KEY, 7 + bit))
        prod = ops.external_product(ggsw, ct, glwe, radix)
        got = np.asarray(ops.decrypt_glwe(prod, sk, glwe, 2))
        expect = np.asarray(msgs) * bit % 4
        np.testing.assert_array_equal(got, expect)
    # CMUX selects
    m0 = jnp.zeros(glwe.poly_degree, dtype=jnp.uint64)
    c0 = ops.encrypt_glwe(torus.encode(m0, 2), sk, glwe,
                          jax.random.fold_in(KEY, 9))
    sel1 = ops.encrypt_ggsw(1, sk, glwe, radix,
                            jax.random.fold_in(KEY, 10))
    chosen = ops.cmux(sel1, c0, ct, glwe, radix)
    np.testing.assert_array_equal(
        np.asarray(ops.decrypt_glwe(chosen, sk, glwe, 2)),
        np.asarray(msgs))


def test_sample_extract():
    glwe = TEST_GLWE_DEF_1
    sk = ops.generate_binary_glwe_sk(glwe, jax.random.fold_in(KEY, 11))
    msgs = jnp.asarray(
        RNG.integers(0, 8, glwe.poly_degree, dtype=np.uint64))
    ct = ops.encrypt_glwe(torus.encode(msgs, 3), sk, glwe,
                          jax.random.fold_in(KEY, 12))
    lwe_ct = ops.sample_extract(ct, glwe)
    flat_sk = ops.flatten_glwe_sk(sk)
    got = int(ops.decrypt_lwe(lwe_ct, flat_sk, 3))
    assert got == int(msgs[0])


def test_keyswitch():
    glwe = TEST_GLWE_DEF_1
    from_sk = ops.flatten_glwe_sk(
        ops.generate_binary_glwe_sk(glwe, jax.random.fold_in(KEY, 13)))
    from_params = glwe.as_lwe
    to_sk = ops.generate_binary_lwe_sk(LWE_SMALL,
                                       jax.random.fold_in(KEY, 14))
    radix = RadixDecomposition(count=8, radix_log=6)
    ksk = ops.generate_keyswitch_key(from_sk, to_sk, LWE_SMALL, radix,
                                     jax.random.fold_in(KEY, 15))
    msg = torus.encode(jnp.uint64(3), 2)
    ct = ops.encrypt_lwe(msg, from_sk, from_params,
                         jax.random.fold_in(KEY, 16))
    switched = ops.keyswitch_lwe_to_lwe(ct, ksk, LWE_SMALL, radix)
    assert int(ops.decrypt_lwe(switched, to_sk, 2)) == 3


def test_programmable_bootstrap():
    # full PBS: f(x) = x + 1 mod message space, 2-bit space w/ padding
    glwe = TEST_GLWE_DEF_1
    lwe = LWE_SMALL
    pbs_radix = TEST_RADIX
    ks_radix = RadixDecomposition(count=8, radix_log=6)
    lwe_sk = ops.generate_binary_lwe_sk(lwe, jax.random.fold_in(KEY, 20))
    glwe_sk = ops.generate_binary_glwe_sk(glwe,
                                          jax.random.fold_in(KEY, 21))
    bsk = ops.generate_bootstrap_key(lwe_sk, glwe_sk, lwe, glwe,
                                     pbs_radix,
                                     jax.random.fold_in(KEY, 22))
    ksk = ops.generate_keyswitch_key(
        ops.flatten_glwe_sk(glwe_sk), lwe_sk, lwe, ks_radix,
        jax.random.fold_in(KEY, 23))
    bits = 2  # messages in {0, 1} (top bit is padding)
    test_poly = ops.test_polynomial_for(lambda m: (m + 1) % 2, bits, glwe)
    for msg in (0, 1):
        ct = ops.encrypt_lwe(torus.encode(jnp.uint64(msg), bits), lwe_sk,
                             lwe, jax.random.fold_in(KEY, 24 + msg))
        out = ops.programmable_bootstrap_univariate(
            ct, test_poly, bsk, ksk, lwe, glwe, pbs_radix, ks_radix)
        got = int(ops.decrypt_lwe(out, lwe_sk, bits))
        assert got == (msg + 1) % 2, (msg, got)


def test_sample_extract_nonzero_coeff():
    """sample_extract(coeff=h) recovers message poly coefficient h
    (the multi-value PBS read path)."""
    glwe = TEST_GLWE_DEF_1
    sk = ops.generate_binary_glwe_sk(glwe, jax.random.fold_in(KEY, 80))
    bits = 3
    msgs = RNG.integers(0, 1 << (bits - 1), glwe.poly_degree,
                        dtype=np.uint64)
    ct = ops.encrypt_glwe(torus.encode(jnp.asarray(msgs), bits), sk,
                          glwe, jax.random.fold_in(KEY, 81))
    flat_sk = ops.flatten_glwe_sk(sk)
    for h in (0, 1, 5, glwe.poly_degree - 1):
        lwe_ct = ops.sample_extract(ct, glwe, coeff=h)
        got = int(torus.decode(
            ops.decrypt_lwe_torus(lwe_ct, flat_sk), bits))
        assert got == int(msgs[h]), (h, got, int(msgs[h]))


def test_multifunctional_pbs():
    """One blind rotation evaluating 3 functions (reference:
    multifunctional LUT, `programmable_bootstrapping.rs:126-170`)."""
    from sunscreen_tpu.tfhe.high_level import (UnivariateLookupTable,
                                               evaluation)
    glwe = TEST_GLWE_DEF_1
    lwe = LWE_SMALL
    pbs_radix = TEST_RADIX
    ks_radix = RadixDecomposition(count=8, radix_log=6)
    lwe_sk = ops.generate_binary_lwe_sk(lwe, jax.random.fold_in(KEY, 90))
    glwe_sk = ops.generate_binary_glwe_sk(glwe,
                                          jax.random.fold_in(KEY, 91))
    bsk = ops.generate_bootstrap_key(lwe_sk, glwe_sk, lwe, glwe,
                                     pbs_radix,
                                     jax.random.fold_in(KEY, 92))
    ksk = ops.generate_keyswitch_key(
        ops.flatten_glwe_sk(glwe_sk), lwe_sk, lwe, ks_radix,
        jax.random.fold_in(KEY, 93))
    bits = 2
    fns = [lambda m: (m + 1) % 2, lambda m: m, lambda m: 1 - m]
    lut = UnivariateLookupTable.trivial_multifunctional(fns, glwe, bits)
    for msg in (0, 1):
        ct = ops.encrypt_lwe(torus.encode(jnp.uint64(msg), bits),
                             lwe_sk, lwe,
                             jax.random.fold_in(KEY, 94 + msg))
        outs = evaluation.multifunctional_programmable_bootstrap(
            ct, lut, bsk, ksk, lwe, glwe, pbs_radix, ks_radix)
        for j, fn in enumerate(fns):
            got = int(ops.decrypt_lwe(outs[j], lwe_sk, bits))
            assert got == fn(msg) % 2, (msg, j, got)


def test_bivariate_lookup_table_entity():
    """BivariateLookupTable + precomputed-LUT bivariate PBS matches the
    inline-fn path (reference: `bivariate_lookup_table.rs`)."""
    from sunscreen_tpu.tfhe.high_level import (BivariateLookupTable,
                                               evaluation)
    glwe = TEST_GLWE_DEF_1
    lwe = LWE_SMALL
    pbs_radix = TEST_RADIX
    ks_radix = RadixDecomposition(count=8, radix_log=6)
    lwe_sk = ops.generate_binary_lwe_sk(lwe, jax.random.fold_in(KEY, 95))
    glwe_sk = ops.generate_binary_glwe_sk(glwe,
                                          jax.random.fold_in(KEY, 96))
    bsk = ops.generate_bootstrap_key(lwe_sk, glwe_sk, lwe, glwe,
                                     pbs_radix,
                                     jax.random.fold_in(KEY, 97))
    ksk = ops.generate_keyswitch_key(
        ops.flatten_glwe_sk(glwe_sk), lwe_sk, lwe, ks_radix,
        jax.random.fold_in(KEY, 98))
    bits = 1  # {0} x {0,1} messages at 2-bit packed precision
    fn = lambda a, b: (a + b) % 2  # noqa: E731
    lut = BivariateLookupTable.trivial_from_fn(fn, glwe, bits)
    assert lut.as_univariate().plaintext_bits == 2 * bits
    total = bits + lut.carry_bits
    for (ma, mb) in ((0, 0), (0, 1)):
        ca = ops.encrypt_lwe(torus.encode(jnp.uint64(ma), total),
                             lwe_sk, lwe, jax.random.fold_in(KEY, 99))
        cb = ops.encrypt_lwe(torus.encode(jnp.uint64(mb), total),
                             lwe_sk, lwe, jax.random.fold_in(KEY, 100))
        out = evaluation.bivariate_programmable_bootstrap(
            ca, cb, lut, bsk, ksk, lwe, glwe, pbs_radix, ks_radix)
        got = int(ops.decrypt_lwe(out, lwe_sk, total))
        assert got == fn(ma, mb), (ma, mb, got)


def test_pbs_unpadded_output_encoding():
    """`output_bits` reproduces the reference LUT's unpadded output
    encoding (`generate_lut`, programmable_bootstrapping.rs:126-173):
    f values land at val << 63 (message bits only), decoded with
    1 bit, doubling the noise margin vs the chainable default."""
    glwe = TEST_GLWE_DEF_1
    lwe = LWE_SMALL
    pbs_radix = TEST_RADIX
    ks_radix = RadixDecomposition(count=8, radix_log=6)
    lwe_sk = ops.generate_binary_lwe_sk(lwe, jax.random.fold_in(KEY, 300))
    glwe_sk = ops.generate_binary_glwe_sk(glwe,
                                          jax.random.fold_in(KEY, 301))
    bsk = ops.generate_bootstrap_key(lwe_sk, glwe_sk, lwe, glwe,
                                     pbs_radix,
                                     jax.random.fold_in(KEY, 302))
    ksk = ops.generate_keyswitch_key(
        ops.flatten_glwe_sk(glwe_sk), lwe_sk, lwe, ks_radix,
        jax.random.fold_in(KEY, 303))
    tp = ops.test_polynomial_for(lambda m: (m + 1) % 2, 2, glwe,
                                 output_bits=1)
    # LUT values sit at the 1-bit slots (0, 2^63)
    vals = set(int(x) for x in np.asarray(tp))
    assert vals <= {0, 1 << 63, (1 << 64) - (1 << 63)}
    for msg in (0, 1):
        ct = ops.encrypt_lwe(torus.encode(jnp.uint64(msg), 2), lwe_sk,
                             lwe, jax.random.fold_in(KEY, 304 + msg))
        out = ops.programmable_bootstrap_univariate(
            ct, tp, bsk, ksk, lwe, glwe, pbs_radix, ks_radix)
        assert int(ops.decrypt_lwe(out, lwe_sk, 1)) == (msg + 1) % 2


@pytest.mark.skipif(
    not __import__("os").environ.get("SUNSCREEN_TPU_SLOW_TESTS"),
    reason="~8 min on CPU; run with SUNSCREEN_TPU_SLOW_TESTS=1")
def test_pbs_reference_doctest_params():
    """The reference's documented PBS configuration end-to-end:
    LWE_512_80 -> GLWE_1_1024_80, radix (3, 4), unpadded LUT output,
    negate function — `programmable_bootstrapping.rs:200-280` (the
    doctest its CI executes). Round 4: the earlier wrong-decrypts at
    this radix were the padded-output boundary saturation, not noise
    (measured |phase err| <= 2^59.7 vs the 2^62 margin here)."""
    from sunscreen_tpu.tfhe import GLWE_1_1024_80, LWE_512_80
    LWE80 = LWE_512_80
    GLWE80 = GLWE_1_1024_80
    radix = RadixDecomposition(count=3, radix_log=4)
    ks_radix = RadixDecomposition(count=8, radix_log=6)
    key = jax.random.key(11)
    lwe_sk = ops.generate_binary_lwe_sk(LWE80, jax.random.fold_in(key, 0))
    glwe_sk = ops.generate_binary_glwe_sk(GLWE80,
                                          jax.random.fold_in(key, 1))
    bsk = ops.generate_bootstrap_key(lwe_sk, glwe_sk, LWE80, GLWE80,
                                     radix, jax.random.fold_in(key, 2))
    flat = ops.flatten_glwe_sk(glwe_sk)
    ksk = ops.generate_keyswitch_key(flat, lwe_sk, LWE80, ks_radix,
                                     jax.random.fold_in(key, 3))
    tp = ops.test_polynomial_for(lambda m: (m + 1) % 2, 2, GLWE80,
                                 output_bits=1)

    @jax.jit
    def pbs_no_ks(ct):
        # the reference's univariate PBS: blind rotate + extract, the
        # output under the flattened GLWE key (doctest decrypts there)
        rotated = ops.blind_rotate(tp, ct, bsk, GLWE80, radix)
        return ops.sample_extract(rotated, GLWE80)

    batch = 8
    msgs = jnp.arange(batch, dtype=jnp.uint64) % 2
    cts = jax.vmap(lambda m, k: ops.encrypt_lwe(
        torus.encode(m, 2), lwe_sk, LWE80, k))(
        msgs, jax.random.split(jax.random.fold_in(key, 4), batch))
    ext = jax.vmap(pbs_no_ks)(cts)
    want = (np.asarray(msgs) + 1) % 2
    got = jax.vmap(lambda c: ops.decrypt_lwe(c, flat, 1))(ext)
    assert np.array_equal(np.asarray(got), want)
    # + keyswitch back to the small key (our bench composition)
    out = jax.vmap(lambda c: ops.keyswitch_lwe_to_lwe(
        c, ksk, LWE80, ks_radix))(ext)
    got2 = jax.vmap(lambda c: ops.decrypt_lwe(c, lwe_sk, 1))(out)
    assert np.array_equal(np.asarray(got2), want)


def test_uniform_secret_keys():
    """Uniform (non-binary) LWE + GLWE secret keys encrypt/decrypt
    exactly (reference: `generate_uniform_{lwe,glwe}_sk`,
    high_level.rs:114,173). The GLWE mask.sk dot runs on the 3-prime
    CRT plan so full torus x torus products stay exact."""
    lwe = LWE_SMALL
    glwe = TEST_GLWE_DEF_1
    sk_l = ops.generate_uniform_lwe_sk(lwe, jax.random.fold_in(KEY, 400))
    ct = ops.encrypt_lwe(torus.encode(jnp.uint64(5), 3), sk_l, lwe,
                         jax.random.fold_in(KEY, 401))
    assert int(ops.decrypt_lwe(ct, sk_l, 3)) == 5
    sk_g = ops.generate_uniform_glwe_sk(glwe,
                                        jax.random.fold_in(KEY, 402))
    assert int(jnp.max(sk_g)) > 1  # really non-binary
    msgs = jnp.asarray(RNG.integers(0, 8, glwe.poly_degree,
                                    dtype=np.uint64))
    gct = ops.encrypt_glwe(torus.encode(msgs, 3), sk_g, glwe,
                           jax.random.fold_in(KEY, 403))
    got = ops.decrypt_glwe(gct, sk_g, glwe, 3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(msgs))


def test_decrypt_lwe_with_carry():
    """Carry-aware decode (reference: `decrypt_lwe_with_carry`,
    high_level.rs:551): message at 64-p-c with c carry bits of
    headroom above it."""
    lwe = LWE_SMALL
    sk = ops.generate_binary_lwe_sk(lwe, jax.random.fold_in(KEY, 410))
    p_bits, c_bits = 3, 2
    msg = 5
    enc = jnp.uint64(msg) << jnp.uint64(64 - p_bits - c_bits)
    ct = ops.encrypt_lwe(enc, sk, lwe, jax.random.fold_in(KEY, 411))
    assert int(ops.decrypt_lwe_with_carry(ct, sk, p_bits, c_bits)) == msg
    # with a carry accumulated (ct + ct -> 2*msg overflows p into carry)
    ct2 = ops.lwe_add(ct, ct)
    assert int(ops.decrypt_lwe_with_carry(ct2, sk, p_bits, c_bits)) \
        == (2 * msg) % (1 << p_bits)


def test_trivial_glev_and_rlev_public():
    """trivial_binary_glev + RLEV under an RLWE public key decrypt at
    every level scale (reference: high_level.rs:743,764)."""
    glwe = TEST_GLWE_DEF_1
    radix = RadixDecomposition(count=2, radix_log=8)
    msg = jnp.asarray(RNG.integers(0, 2, glwe.poly_degree,
                                   dtype=np.uint64))
    triv = ops.trivial_glev(msg, glwe, radix)
    sk = ops.generate_binary_glwe_sk(glwe, jax.random.fold_in(KEY, 420))
    got = ops.decrypt_glev(triv, sk, glwe, radix)
    np.testing.assert_array_equal(np.asarray(got) & 1, np.asarray(msg))
    pk = ops.generate_rlwe_public_key(sk, glwe,
                                      jax.random.fold_in(KEY, 421))
    rlev = ops.encrypt_rlev_public(msg, pk, glwe, radix,
                                   jax.random.fold_in(KEY, 422))
    got = ops.decrypt_glev(rlev, sk, glwe, radix)
    np.testing.assert_array_equal(np.asarray(got) & 1, np.asarray(msg))


def test_glev_cmux():
    """glev_cmux selects between two GLEVs level-wise (reference:
    `glev_cmux`, high_level.rs:928)."""
    glwe = TEST_GLWE_DEF_1
    radix = TEST_RADIX
    sk = ops.generate_binary_glwe_sk(glwe, jax.random.fold_in(KEY, 430))
    m0 = jnp.asarray(RNG.integers(0, 2, glwe.poly_degree,
                                  dtype=np.uint64))
    m1 = jnp.asarray(RNG.integers(0, 2, glwe.poly_degree,
                                  dtype=np.uint64))
    g0 = ops.encrypt_glev(m0, sk, glwe, radix,
                          jax.random.fold_in(KEY, 431))
    g1 = ops.encrypt_glev(m1, sk, glwe, radix,
                          jax.random.fold_in(KEY, 432))
    for sel, want in ((0, m0), (1, m1)):
        ggsw = ops.encrypt_ggsw(sel, sk, glwe, radix,
                                jax.random.fold_in(KEY, 433 + sel))
        out = ops.glev_cmux(ggsw, g0, g1, glwe, radix)
        got = ops.decrypt_glev(out, sk, glwe, radix)
        np.testing.assert_array_equal(np.asarray(got) & 1,
                                      np.asarray(want))


def test_plan_cache_miss_inside_jit_no_tracer_leak():
    """A torus-plan cache MISS inside a jit trace must not capture the
    plan's device constants as tracers (regression: the k-split gave
    encrypt and external-product different cache keys, so eager
    encrypts no longer pre-warmed the jitted path and the first
    in-trace construction poisoned every later use)."""
    from sunscreen_tpu.tfhe.poly import get_torus_plan
    glwe = TEST_GLWE_DEF_1
    sk = ops.generate_binary_glwe_sk(glwe, jax.random.fold_in(KEY, 500))
    ct = ops.encrypt_glwe(
        torus.encode(jnp.zeros(glwe.poly_degree, dtype=jnp.uint64), 2),
        sk, glwe, jax.random.fold_in(KEY, 501))
    sel = ops.encrypt_ggsw(1, sk, glwe, TEST_RADIX,
                           jax.random.fold_in(KEY, 502))
    get_torus_plan.cache_clear()   # force the miss INSIDE the trace

    @jax.jit
    def f(c):
        return ops.cmux(sel, c, c + 1, glwe, TEST_RADIX)

    out1 = jax.block_until_ready(f(ct))

    @jax.jit
    def g(c):   # a SECOND trace reusing the now-cached plan
        return ops.external_product(sel, c, glwe, TEST_RADIX)

    out2 = jax.block_until_ready(g(ct))
    assert out1.shape == ct.shape and out2.shape == ct.shape


def test_ntt_bootstrap_key_blind_rotate_bit_exact():
    """blind_rotate with an NTT-domain bootstrap key (the u32 Pallas
    engine; reference analogue: BootstrapKeyFft consumed by
    `blind_rotation.rs`) is bit-identical to the per-CMUX exact CRT
    path — both pipelines are exact integer arithmetic mod 2^64.
    Covers the fused pmntt contraction (GLWE size 1) and the generic
    widened contraction (size 2)."""
    lwe = LweDef(dim=8, std=1e-16)
    radix = TEST_RADIX
    lwe_sk = ops.generate_binary_lwe_sk(lwe, jax.random.fold_in(KEY, 600))
    bits = 2
    ct = ops.encrypt_lwe(torus.encode(jnp.uint64(1), bits), lwe_sk, lwe,
                         jax.random.fold_in(KEY, 601))
    for size, key_off in ((1, 610), (2, 620)):
        glwe = GlweDef(size=size, poly_degree=256, std=1e-16)
        glwe_sk = ops.generate_binary_glwe_sk(
            glwe, jax.random.fold_in(KEY, key_off))
        bsk = ops.generate_bootstrap_key(
            lwe_sk, glwe_sk, lwe, glwe, radix,
            jax.random.fold_in(KEY, key_off + 1))
        tp = ops.test_polynomial_for(lambda m: (m + 1) % 2, bits, glwe)
        ref = ops.blind_rotate(tp, ct, bsk, glwe, radix)
        got = ops.blind_rotate(
            tp, ct, ops.bootstrap_key_to_ntt(bsk, glwe, radix), glwe,
            radix)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
