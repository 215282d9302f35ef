"""Pinned cross-checks against every fixed constant the reference
sources carry (VERDICT r4 'Next round' #8): SEAL modulus chains
(`logproof/src/rings.rs` SealQ128_*), `CoeffModulus::Create` /
`PlainModulus::batching` outputs (`seal_fhe/src/modulus.rs` tests),
TFHE preset stds (`sunscreen_tfhe/src/params.rs:220-285`), and an
end-to-end run of OUR engine on SEAL's exact published chain.

These complement the self-generated golden vectors
(tests/golden_u32_v1.npz): the goldens pin regressions, these pin
external reference equivalence wherever the sources publish a number.
"""

import numpy as np
import pytest

from sunscreen_tpu.bfv.params import (MAX_LOG_Q, SEAL_BFV_DEFAULT_128,
                                      SEAL_BFV_DEFAULT_1024, BfvParams,
                                      batching_plain_modulus,
                                      coefficient_modulus_create)
from sunscreen_tpu.math import primes


def test_plain_modulus_batching_matches_seal():
    """seal_fhe modulus.rs `can_create_batching_plain_modulus`:
    PlainModulus::batching(1024, 20) == 1038337."""
    assert batching_plain_modulus(1024, 20) == 1038337


def test_coefficient_modulus_create_matches_seal():
    """seal_fhe modulus.rs `can_create_custom_coefficient_modulus`:
    CoefficientModulus::create(8192, [50,30,30,50,50]) — exact output
    vector including SEAL's within-group assignment order."""
    got = coefficient_modulus_create(8192, [50, 30, 30, 50, 50])
    assert got == (1125899905744897, 1073643521, 1073692673,
                   1125899906629633, 1125899906826241)


def test_bfv_default_1024_higher_tiers_match_get_primes():
    """seal_fhe modulus.rs `can_create_default_coefficient_modulus`:
    bfv_default(1024, TC192) == [520193], TC256 == [12289]. Both equal
    descending-from-top get_primes output, pinning gen_ntt_primes."""
    assert primes.gen_ntt_primes(19, 1, 1024)[0] == 520193 \
        == SEAL_BFV_DEFAULT_1024[192][0]
    assert primes.gen_ntt_primes(14, 1, 1024)[0] == 12289 \
        == SEAL_BFV_DEFAULT_1024[256][0]


def test_sealq128_chains_are_valid_ntt_chains_at_budget():
    """logproof/src/rings.rs SealQ128_{1024,2048,4096,8192}: every
    published modulus must be prime, NTT-friendly for its ring
    (q = 1 mod 2N), pairwise distinct, and the chain must exactly fill
    the HE-standard 128-bit budget MAX_LOG_Q (which our own params
    validation enforces) — 27 / 54 / 109 / 218 bits."""
    want_bits = {1024: 27, 2048: 54, 4096: 109, 8192: 218}
    for n, chain in SEAL_BFV_DEFAULT_128.items():
        assert len(set(chain)) == len(chain)
        for q in chain:
            assert primes.is_prime(q), (n, q)
            assert q % (2 * n) == 1, (n, q)
        total = sum(q.bit_length() for q in chain)
        assert total == want_bits[n] == MAX_LOG_Q[128][n], (n, total)


def test_engine_runs_seal_exact_4096_chain():
    """Our BFV engine on SEAL's exact published N=4096 chain
    (0xffffee001, 0xffffc4001 ciphertext + 0x1ffffe0001 keyswitch —
    SEAL reserves the trailing bfv_default prime for keyswitching):
    encrypt / multiply+relin / decrypt must be exact."""
    import jax

    from sunscreen_tpu.bfv import get_context, keys, ops
    from sunscreen_tpu.bfv.keys import KswKey

    chain = SEAL_BFV_DEFAULT_128[4096]
    t = batching_plain_modulus(4096, 17)
    params = BfvParams(4096, t, chain[:-1], chain[-1],
                       security_level=128)
    ctx = get_context(params)
    key = jax.random.key(7)
    sk = keys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
    pk = keys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
    rlk = keys.gen_relin_key(ctx, sk, jax.random.fold_in(key, 2))

    rng = np.random.default_rng(5)
    pa = rng.integers(0, t, 4096, dtype=np.uint64)
    pb = rng.integers(0, t, 4096, dtype=np.uint64)
    ca = ops.encrypt(ctx, pk, pa, jax.random.fold_in(key, 3))
    cb = ops.encrypt(ctx, pk, pb, jax.random.fold_in(key, 4))
    got = np.asarray(ops.decrypt(
        ctx, sk, ops.multiply_relin(ctx, ca, cb, KswKey(rlk.k0, rlk.k1))))

    # independent numpy oracle: negacyclic convolution mod t via
    # object-dtype exact integers (t is 17 bits; python ints are exact)
    conv = np.convolve(pa.astype(object), pb.astype(object))
    res = conv[:4096].copy()
    res[:4095] -= conv[4096:]
    want = np.array([int(x) % t for x in res], dtype=np.uint64)
    np.testing.assert_array_equal(got.astype(np.uint64), want)


def test_tfhe_preset_constants_match_reference_source():
    """sunscreen_tfhe/src/params.rs:220-285 published std constants,
    byte-for-byte (the estimator-level checks live in
    test_security.py)."""
    from sunscreen_tpu.tfhe import params as tp
    assert tp.LWE_512_128.std == 0.0004899836456140595
    assert tp.GLWE_5_256_128.std == 5e-10
    assert tp.GLWE_1_1024_128.std == 0.0000000444778278004718
    assert tp.GLWE_1_2048_128.std == 0.00000000000000034667670193445625
    assert tp.LWE_512_80.std == 0.000001842343446823844
    assert tp.GLWE_5_256_80.std == 0.0000000000000007794169597948335
    assert tp.GLWE_1_1024_80.std == 0.0000000000010900242107812643
    assert (tp.LWE_512_128.dim, tp.GLWE_1_2048_128.size,
            tp.GLWE_1_2048_128.poly_degree) == (512, 1, 2048)


def test_sdlp_transcript_label_schedule_matches_reference():
    """logproof/src/linear_relation.rs:959-963 challenge label schedule
    (alpha, beta, gamma, phi, psi) with the reference's exact counts:
    beta is |t.cols|, gamma |a.rows|, phi l. A tiny SDLP create/verify
    under a label-recording transcript pins the order and counts."""
    from sunscreen_tpu.logproof import linear_relation as lr
    from sunscreen_tpu.zk.merlin import Transcript

    recorded = []

    class RecordingTranscript(Transcript):
        def challenge_scalar(self, label):
            recorded.append(label)
            return super().challenge_scalar(label)

    vk = lr.VerifierKnowledge(
        a=[[[3, 0, 0, 0]]], t=[[[6, 0, 0, 0]]],
        bounds=[[[2] * 4]], f=[1, 0, 0, 0, 1], q=12289)
    pk = lr.ProverKnowledge(vk, [[[2, 0, 0, 0]]])
    from sunscreen_tpu.logproof import LogProofGenerators, create, verify
    from sunscreen_tpu.logproof import inner_product as ip
    gens = LogProofGenerators(vk.l)
    u = ip.get_u()
    proof = create(RecordingTranscript(b"anchor"), pk, gens.g, gens.h, u)
    labels = [x for x in recorded if x in (b"alpha", b"psi")]
    assert labels[:2] == [b"alpha", b"psi"]
    assert verify(proof, Transcript(b"anchor"), vk, gens.g, gens.h, u)
