"""Advanced TFHE: GLEV, private functional keyswitch, circuit
bootstrapping, scheme switch, bivariate PBS (reference:
`sunscreen_tfhe/src/ops/bootstrapping/circuit_bootstrapping.rs`,
`scheme_switch.rs`, keyswitch ops)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sunscreen_tpu.tfhe import (GlweDef, LweDef, RadixDecomposition,
                                TEST_GLWE_DEF_1, TEST_RADIX)
from sunscreen_tpu.tfhe import ops, torus

KEY = jax.random.key(17)
LWE_SMALL = LweDef(dim=64, std=1e-16)
RNG = np.random.default_rng(23)
GLWE = TEST_GLWE_DEF_1
PFKS_RADIX = RadixDecomposition(count=8, radix_log=6)


@pytest.fixture(scope="module")
def glwe_sk():
    return ops.generate_binary_glwe_sk(GLWE, jax.random.fold_in(KEY, 0))


def test_glev_roundtrip(glwe_sk):
    msgs = jnp.asarray(RNG.integers(0, 4, GLWE.poly_degree,
                                    dtype=np.uint64))
    glev = ops.encrypt_glev(msgs, glwe_sk, GLWE, TEST_RADIX,
                            jax.random.fold_in(KEY, 1))
    got = ops.decrypt_glev(glev, glwe_sk, GLWE, TEST_RADIX)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(msgs))


def test_private_functional_keyswitch(glwe_sk):
    # f(x) = 3x mapped into a GLWE under a fresh key
    from_sk = ops.generate_binary_lwe_sk(LWE_SMALL,
                                         jax.random.fold_in(KEY, 2))
    n = GLWE.poly_degree
    f_poly = np.zeros(n, dtype=np.int64)
    f_poly[0] = 3
    pfksk = ops.generate_private_functional_keyswitch_key(
        jnp.asarray(f_poly), from_sk, glwe_sk, GLWE, PFKS_RADIX,
        jax.random.fold_in(KEY, 3))
    msg = 2
    ct = ops.encrypt_lwe(torus.encode(jnp.uint64(msg), 4), from_sk,
                         LWE_SMALL, jax.random.fold_in(KEY, 4))
    out = ops.private_functional_keyswitch(ct, pfksk, GLWE, PFKS_RADIX)
    got = np.asarray(ops.decrypt_glwe(out, glwe_sk, GLWE, 4))
    assert got[0] == (3 * msg) % 16
    assert np.all(got[1:] == 0)


def test_scheme_switch_produces_working_ggsw(glwe_sk):
    from sunscreen_tpu.tfhe import TEST_RADIX_FINE
    msgs = jnp.zeros(GLWE.poly_degree, dtype=jnp.uint64)
    for bit in (0, 1):
        glev = ops.encrypt_glev(msgs.at[0].set(bit), glwe_sk, GLWE,
                                TEST_RADIX, jax.random.fold_in(KEY, 5))
        ssk = ops.generate_scheme_switch_key(
            glwe_sk, GLWE, TEST_RADIX_FINE, jax.random.fold_in(KEY, 6))
        ggsw = ops.scheme_switch(glev, ssk, GLWE, TEST_RADIX_FINE,
                                 TEST_RADIX)
        # use the switched GGSW in a CMUX
        data = jnp.asarray(RNG.integers(0, 4, GLWE.poly_degree,
                                        dtype=np.uint64))
        c0 = ops.encrypt_glwe(torus.encode(
            jnp.zeros(GLWE.poly_degree, dtype=jnp.uint64), 2), glwe_sk,
            GLWE, jax.random.fold_in(KEY, 7))
        c1 = ops.encrypt_glwe(torus.encode(data, 2), glwe_sk, GLWE,
                              jax.random.fold_in(KEY, 8))
        sel = ops.cmux(ggsw, c0, c1, GLWE, TEST_RADIX)
        got = np.asarray(ops.decrypt_glwe(sel, glwe_sk, GLWE, 2))
        expect = np.asarray(data) if bit else np.zeros(GLWE.poly_degree)
        np.testing.assert_array_equal(got, expect)


def test_circuit_bootstrap(glwe_sk):
    # CB's levels live at 2^48-scale: the bootstrap key needs a FINE
    # decomposition (32 bits) or blind-rotation approximation error
    # (2^(64-l*beta) per CMUX) swamps the output levels.
    from sunscreen_tpu.tfhe import TEST_RADIX_FINE
    lwe = LWE_SMALL
    lwe_sk = ops.generate_binary_lwe_sk(lwe, jax.random.fold_in(KEY, 9))
    bsk = ops.generate_bootstrap_key(
        lwe_sk, glwe_sk, lwe, GLWE, TEST_RADIX_FINE,
        jax.random.fold_in(KEY, 10))
    extracted_sk = ops.flatten_glwe_sk(glwe_sk)
    cbs_pfksk = ops.generate_cbs_pfksk(
        extracted_sk, glwe_sk, GLWE, PFKS_RADIX,
        jax.random.fold_in(KEY, 11))
    out_radix = RadixDecomposition(count=2, radix_log=8)
    for bit in (0, 1):
        ct = ops.encrypt_lwe(torus.encode(jnp.uint64(bit), 2), lwe_sk,
                             lwe, jax.random.fold_in(KEY, 12 + bit))
        ggsw = ops.circuit_bootstrap(
            ct, bsk, cbs_pfksk, lwe, GLWE, TEST_RADIX_FINE, out_radix,
            PFKS_RADIX)
        # the bootstrapped GGSW must drive a CMUX correctly
        data = jnp.asarray(RNG.integers(0, 4, GLWE.poly_degree,
                                        dtype=np.uint64))
        c0 = ops.encrypt_glwe(torus.encode(
            jnp.zeros(GLWE.poly_degree, dtype=jnp.uint64), 2), glwe_sk,
            GLWE, jax.random.fold_in(KEY, 20))
        c1 = ops.encrypt_glwe(torus.encode(data, 2), glwe_sk, GLWE,
                              jax.random.fold_in(KEY, 21))
        sel = ops.cmux(ggsw, c0, c1, GLWE, out_radix)
        got = np.asarray(ops.decrypt_glwe(sel, glwe_sk, GLWE, 2))
        expect = np.asarray(data) if bit else np.zeros(GLWE.poly_degree)
        np.testing.assert_array_equal(got, expect)


def test_bivariate_pbs(glwe_sk):
    from sunscreen_tpu.tfhe import TEST_RADIX_FINE
    lwe = LWE_SMALL
    lwe_sk = ops.generate_binary_lwe_sk(lwe,
                                        jax.random.fold_in(KEY, 30))
    bsk = ops.generate_bootstrap_key(
        lwe_sk, glwe_sk, lwe, GLWE, TEST_RADIX_FINE,
        jax.random.fold_in(KEY, 31))
    ksk = ops.generate_keyswitch_key(
        ops.flatten_glwe_sk(glwe_sk), lwe_sk, lwe, PFKS_RADIX,
        jax.random.fold_in(KEY, 32))
    bits = 2  # 1 data bit + padding per operand
    for a in (0, 1):
        for b in (0, 1):
            # operands encrypted at 2*bits precision (packing headroom)
            ca = ops.encrypt_lwe(torus.encode(jnp.uint64(a), 2 * bits),
                                 lwe_sk, lwe,
                                 jax.random.fold_in(KEY, 40 + a))
            cb = ops.encrypt_lwe(torus.encode(jnp.uint64(b), 2 * bits),
                                 lwe_sk, lwe,
                                 jax.random.fold_in(KEY, 44 + b))
            out = ops.programmable_bootstrap_bivariate(
                ca, cb, lambda x, y: x & y, bsk, ksk, lwe, GLWE,
                TEST_RADIX_FINE, PFKS_RADIX, bits)
            got = int(ops.decrypt_lwe(out, lwe_sk, 2 * bits))
            assert got == (a & b), (a, b, got)


# -- round-2 completion ops -------------------------------------------------

def test_glwe_keyswitch(glwe_sk):
    """GLWE under key A -> key B preserves the message (reference:
    `ops/keyswitch/glwe_keyswitch.rs`)."""
    from sunscreen_tpu.tfhe import TEST_GLWE_DEF_2
    bits = 4
    from_sk = ops.generate_binary_glwe_sk(TEST_GLWE_DEF_2,
                                          jax.random.fold_in(KEY, 40))
    to_sk = ops.generate_binary_glwe_sk(TEST_GLWE_DEF_2,
                                        jax.random.fold_in(KEY, 41))
    msgs = RNG.integers(0, 1 << bits,
                        TEST_GLWE_DEF_2.poly_degree, dtype=np.uint64)
    ct = ops.encrypt_glwe(torus.encode(jnp.asarray(msgs), bits),
                          from_sk, TEST_GLWE_DEF_2,
                          jax.random.fold_in(KEY, 42))
    gksk = ops.generate_glwe_keyswitch_key(
        from_sk, to_sk, TEST_GLWE_DEF_2, PFKS_RADIX,
        jax.random.fold_in(KEY, 43))
    out = ops.keyswitch_glwe_to_glwe(ct, gksk, TEST_GLWE_DEF_2,
                                     PFKS_RADIX)
    got = ops.decrypt_glwe(out, to_sk, TEST_GLWE_DEF_2, bits)
    np.testing.assert_array_equal(np.asarray(got), msgs)


def test_public_functional_keyswitch(glwe_sk):
    """Three LWEs -> one GLWE carrying f(m1,m2,m3) with public weight
    polys (reference: `public_functional_keyswitch.rs`)."""
    bits = 4
    n = GLWE.poly_degree
    from_sk = ops.generate_binary_lwe_sk(LWE_SMALL,
                                         jax.random.fold_in(KEY, 50))
    msgs = [3, 5, 7]
    cts = jnp.stack([
        ops.encrypt_lwe(torus.encode(jnp.uint64(m), bits), from_sk,
                        LWE_SMALL, jax.random.fold_in(KEY, 51 + i))
        for i, m in enumerate(msgs)])
    # f(x1,x2,x3) = x1 + 2*x2*X + x3*X^2
    w = np.zeros((3, n), dtype=np.uint64)
    w[0, 0] = 1
    w[1, 1] = 2
    w[2, 2] = 1
    pksk = ops.generate_public_functional_keyswitch_key(
        from_sk, glwe_sk, GLWE, PFKS_RADIX, jax.random.fold_in(KEY, 54))
    out = ops.public_functional_keyswitch(cts, pksk, w, GLWE,
                                          PFKS_RADIX)
    got = np.asarray(ops.decrypt_glwe(out, glwe_sk, GLWE, bits))
    assert got[0] == 3 and got[1] == 10 and got[2] == 7
    assert np.all(got[3:] == 0)


def test_lwe_public_key_encryption():
    """Public-key LWE encryption decrypts correctly (reference:
    `entities/lwe_public_key.rs`)."""
    bits = 4
    sk = ops.generate_binary_lwe_sk(LWE_SMALL,
                                    jax.random.fold_in(KEY, 60))
    pk = ops.generate_lwe_public_key(sk, LWE_SMALL, 256,
                                     jax.random.fold_in(KEY, 61))
    for i, msg in enumerate((0, 5, 11, 15)):
        ct = ops.encrypt_lwe_public(torus.encode(jnp.uint64(msg), bits),
                                    pk, LWE_SMALL,
                                    jax.random.fold_in(KEY, 62 + i))
        assert int(ops.decrypt_lwe(ct, sk, bits)) == msg


def test_generalized_pbs(glwe_sk):
    """Generalized PBS emits LEV levels f(m)*B_j under the extracted
    key (reference: `programmable_bootstrapping.rs:34-572`)."""
    bits = 2
    out_radix = RadixDecomposition(count=2, radix_log=8)
    # deep output levels (B_2 = 2^48) need a fine bootstrap radix: the
    # blind-rotate decomposition error ~ sqrt(n)*2^(64 - l*b) must sit
    # far below the last level's scale
    pbs_radix = RadixDecomposition(count=8, radix_log=6)
    lwe_sk = ops.generate_binary_lwe_sk(LWE_SMALL,
                                        jax.random.fold_in(KEY, 70))
    bsk = ops.generate_bootstrap_key(lwe_sk, glwe_sk, LWE_SMALL, GLWE,
                                     pbs_radix,
                                     jax.random.fold_in(KEY, 71))
    extracted = ops.flatten_glwe_sk(glwe_sk)
    for msg in (0, 1):   # bits=2 keeps the padding bit clear
        ct = ops.encrypt_lwe(torus.encode(jnp.uint64(msg), bits),
                             lwe_sk, LWE_SMALL,
                             jax.random.fold_in(KEY, 72 + msg))
        lev = ops.generalized_programmable_bootstrap(
            ct, lambda m: 1 - m, bits, bsk, LWE_SMALL, GLWE,
            pbs_radix, out_radix)
        for j in range(out_radix.count):
            bj = 1 << (64 - (j + 1) * out_radix.radix_log)
            phase = int(ops.decrypt_lwe_torus(lev[j], extracted))
            got = round(phase / bj) % (1 << out_radix.radix_log)
            assert got == 1 - msg, (msg, j, got)
