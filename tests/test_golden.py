"""Golden-vector bit-exactness: every artifact regenerated from fixed
seeds must equal the committed fixture byte-for-byte (BASELINE.json:
"Every output must match ... bit-exactly"; since SEAL/cargo are
unavailable the vectors are self-generated and FROZEN — any kernel
change that flips a bit fails here and must be an intentional,
documented regeneration via tools/gen_golden.py).

Pinned configuration: CPU backend + unrolled NTT (the conftest forces
CPU; keys sample uniform polys in NTT domain so ciphertext bytes are a
function of the NTT-domain layout)."""

import os

import numpy as np
import pytest

import jax  # noqa: F401  (conftest pins cpu first)

FIXTURE = os.path.join(os.path.dirname(__file__), "golden_v1.npz")


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(FIXTURE), \
        "missing fixture — run tools/gen_golden.py"
    return np.load(FIXTURE)


@pytest.fixture(scope="module")
def unrolled_ntt():
    """Golden vectors pin the unrolled layout; on CPU that is already
    the default — just assert nobody overrode it."""
    from sunscreen_tpu.math import ntt
    assert ntt.resolve_mode() in ("unrolled",), \
        "golden tests require the unrolled NTT mode (CPU default)"


@pytest.fixture(scope="module")
def bfv_artifacts(unrolled_ntt):
    from sunscreen_tpu.bfv import BfvParams, get_context, keys, ops

    params = BfvParams.insecure(1024, limbs=2)
    ctx = get_context(params)
    key = jax.random.key(0)
    sk = keys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
    pk = keys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
    rlk = keys.gen_relin_key(ctx, sk, jax.random.fold_in(key, 2))
    gks = keys.gen_galois_keys(
        ctx, sk, jax.random.fold_in(key, 3),
        (ctx.rotate_rows_element(1), ctx.rotate_columns_element))
    pt = (np.arange(ctx.n, dtype=np.uint64) * 7919) % params.plain_modulus
    ct = ops.encrypt(ctx, pk, pt, jax.random.key(42))
    return params, ctx, sk, rlk, gks, ct


def test_bfv_params_pinned(golden, bfv_artifacts):
    params = bfv_artifacts[0]
    want = golden["bfv_params"]
    got = np.array([params.poly_degree, params.plain_modulus,
                    *params.coeff_modulus, params.special_modulus],
                   dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_bfv_secret_key_and_ct(golden, bfv_artifacts):
    _, _, sk, _, _, ct = bfv_artifacts
    np.testing.assert_array_equal(np.asarray(sk.s), golden["bfv_sk"])
    np.testing.assert_array_equal(np.asarray(ct), golden["bfv_ct"])


def test_bfv_mul_relin_bits(golden, bfv_artifacts):
    from sunscreen_tpu.bfv import ops
    _, ctx, sk, rlk, _, ct = bfv_artifacts
    prod = ops.multiply_relin(ctx, ct, ct, rlk)
    np.testing.assert_array_equal(np.asarray(prod),
                                  golden["bfv_mul_relin"])
    np.testing.assert_array_equal(np.asarray(ops.decrypt(ctx, sk, prod)),
                                  golden["bfv_dec_mul"])
    assert float(ops.invariant_noise_budget(ctx, sk, prod)) == \
        float(golden["bfv_noise_budget"][0])


def test_bfv_rotations_bits(golden, bfv_artifacts):
    from sunscreen_tpu.bfv import ops
    _, ctx, _, _, gks, ct = bfv_artifacts
    np.testing.assert_array_equal(
        np.asarray(ops.rotate_rows(ctx, ct, 1, gks)), golden["bfv_rot1"])
    np.testing.assert_array_equal(
        np.asarray(ops.rotate_columns(ctx, ct, gks)), golden["bfv_swap"])


def test_tfhe_pbs_bits(golden):
    from sunscreen_tpu.tfhe import ops as tops
    from sunscreen_tpu.tfhe import torus
    from sunscreen_tpu.tfhe.params import (RadixDecomposition,
                                           TEST_GLWE_DEF_1,
                                           TEST_LWE_DEF_1, TEST_RADIX)

    key = jax.random.key(7)
    lwe, glwe = TEST_LWE_DEF_1, TEST_GLWE_DEF_1
    ks_radix = RadixDecomposition(count=8, radix_log=6)
    lwe_sk = tops.generate_binary_lwe_sk(lwe, jax.random.fold_in(key, 0))
    glwe_sk = tops.generate_binary_glwe_sk(glwe,
                                           jax.random.fold_in(key, 1))
    bsk = tops.generate_bootstrap_key(
        lwe_sk, glwe_sk, lwe, glwe, TEST_RADIX,
        jax.random.fold_in(key, 2))
    ksk = tops.generate_keyswitch_key(
        tops.flatten_glwe_sk(glwe_sk), lwe_sk, lwe, ks_radix,
        jax.random.fold_in(key, 4))
    bits = 2
    test_poly = tops.test_polynomial_for(lambda m: (m + 1) % 2, bits,
                                         glwe)
    ct = tops.encrypt_lwe(torus.encode(1, bits), lwe_sk, lwe,
                          jax.random.fold_in(key, 3))
    np.testing.assert_array_equal(np.asarray(ct), golden["tfhe_lwe_ct"])
    res = tops.programmable_bootstrap_univariate(
        ct, test_poly, bsk, ksk, lwe, glwe, TEST_RADIX, ks_radix)
    np.testing.assert_array_equal(np.asarray(res), golden["tfhe_pbs_out"])
    dec = tops.decrypt_lwe(res, lwe_sk, bits)
    assert int(dec) == int(golden["tfhe_pbs_dec"][0]) == 0


def test_sdlp_transcript_challenges(golden):
    from sunscreen_tpu.logproof import linear_relation as lr
    from sunscreen_tpu.zk import curve25519 as cv
    from sunscreen_tpu.zk.merlin import Transcript

    vk = lr.VerifierKnowledge(
        a=[[[1, 2, 3, 4], [5, 6, 7, 8]]],
        t=[[[9, 10, 11, 12]]],
        bounds=[[[3, 3, 3, 3]], [[3, 3, 3, 3]]],
        f=[1, 0, 0, 0, 1], q=97)
    t = Transcript(b"golden sdlp")
    lr._append_vk(t, vk)
    t.append_point(b"w_shared", cv.BASEPOINT)
    t.append_point(b"w", cv.BASEPOINT * 2)
    alpha, beta, gamma, phi, psi = lr._create_challenges(vk, t)
    got = [alpha, psi, beta[0], gamma[0], phi[0], phi[-1]]
    want = [int(s, 16) for s in golden["sdlp_challenges"]]
    assert got == want
    import hashlib
    v = lr._compute_v(vk, alpha, beta, gamma)
    h = hashlib.sha256()
    for x in v:
        h.update(int(x).to_bytes(32, "little"))
    assert h.hexdigest() == str(golden["sdlp_v_digest"][0])


def test_zk_generators_pinned(golden):
    import hashlib

    from sunscreen_tpu.logproof.linear_relation import LogProofGenerators
    from sunscreen_tpu.zk.pedersen import cached_pedersen

    gens = LogProofGenerators(16)
    h = hashlib.sha256()
    for p in gens.g + gens.h:
        h.update(p.encode())
    assert h.hexdigest() == str(golden["zk_generators_digest"][0])
    pc = cached_pedersen()
    assert pc.B.encode().hex() == str(golden["zk_pedersen"][0])
    assert pc.B_blinding.encode().hex() == str(golden["zk_pedersen"][1])
