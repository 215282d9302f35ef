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
