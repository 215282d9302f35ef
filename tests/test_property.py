"""Property-style tests: randomized cross-parameter sweeps,
serialization fuzzing, and TFHE noise-growth regression (the test
classes the reference covers via proptest + assumptions —
`sunscreen/Cargo.toml:59`, `seal_fhe/tests/assumptions.rs`)."""

import numpy as np
import pytest

import jax

from sunscreen_tpu.bfv import BfvParams
from sunscreen_tpu.runtime import Runtime
from sunscreen_tpu.types import Signed

RNG = np.random.default_rng(0xF00D)


@pytest.mark.parametrize("degree,limbs,limb_bits", [
    (256, 1, 30), (512, 2, 35), (1024, 2, 40), (2048, 3, 45),
])
def test_bfv_roundtrip_cross_params(degree, limbs, limb_bits):
    """Encrypt/add/mul/decrypt across a params sweep (the reference
    runs most FHE tests on one insecure set; this sweeps shapes)."""
    params = BfvParams.insecure(poly_degree=degree, limbs=limbs,
                                limb_bits=limb_bits)
    rt = Runtime.new_fhe(params)
    pub, priv = rt.generate_keys(seed=degree, galois=False)
    from sunscreen_tpu.bfv import get_context, ops
    from sunscreen_tpu.bfv.keys import KswKey
    ctx = rt.ctx
    for trial in range(3):
        a = int(RNG.integers(-1000, 1000))
        b = int(RNG.integers(-1000, 1000))
        ca = rt.encrypt(Signed(a), pub, seed=1000 + trial)
        cb = rt.encrypt(Signed(b), pub, seed=2000 + trial)
        import sunscreen_tpu.bfv.ops as bops
        s = bops.add(ctx, ca.cts[0], cb.cts[0])
        from sunscreen_tpu.runtime.runtime import Ciphertext
        assert rt.decrypt(Ciphertext("Signed", [s], params),
                          priv) == a + b


def test_proof_deserializers_reject_mutations():
    """Byte-level fuzz: truncations and bit flips of serialized proofs
    must raise DecodeError or verify False — never crash with raw
    IndexError/ValueError (advisor finding on malleability)."""
    from sunscreen_tpu.types.zkp_types import Field, Private, zkp_program
    from sunscreen_tpu.zk import curve25519 as cv
    from sunscreen_tpu.zk.backend import BulletproofsBackend, \
        BulletproofsProof

    @zkp_program()
    def small(x: Private[Field]):
        x.to_unsigned(4)

    backend = BulletproofsBackend()
    prog = small.build()
    proof = backend.prove(prog, [7], [], [])
    blob = proof.to_bytes()
    assert BulletproofsProof.from_bytes(blob).to_bytes() == blob
    for cut in (0, 1, 3, len(blob) // 2, len(blob) - 1):
        with pytest.raises(cv.DecodeError):
            BulletproofsProof.from_bytes(blob[:cut])
    flips = 0
    for pos in RNG.integers(0, len(blob), size=12):
        mutated = bytearray(blob)
        mutated[pos] ^= 1 << int(RNG.integers(0, 8))
        try:
            p2 = BulletproofsProof.from_bytes(bytes(mutated))
            ok = backend.verify(prog, p2, [], [])
            assert isinstance(ok, bool)
            flips += 0 if ok else 1
        except cv.DecodeError:
            flips += 1
    # most random flips must be rejected one way or the other
    assert flips >= 10


def test_tfhe_noise_growth_regression():
    """External-product noise must stay far below the decode margin
    after a CMUX chain (regression guard for the decomposition error
    model; reference: noise assumptions in sunscreen_tfhe tests)."""
    import jax.numpy as jnp

    from sunscreen_tpu.tfhe import (TEST_GLWE_DEF_1, TEST_RADIX,
                                    RadixDecomposition)
    from sunscreen_tpu.tfhe import ops, torus

    key = jax.random.key(99)
    glwe = TEST_GLWE_DEF_1
    radix = RadixDecomposition(count=8, radix_log=6)
    sk = ops.generate_binary_glwe_sk(glwe, jax.random.fold_in(key, 0))
    bits = 4
    msg = jnp.asarray(RNG.integers(0, 1 << bits, glwe.poly_degree,
                                   dtype=np.uint64))
    ct = ops.encrypt_glwe(torus.encode(msg, bits), sk, glwe,
                          jax.random.fold_in(key, 1))
    sel = ops.encrypt_ggsw(1, sk, glwe, radix, jax.random.fold_in(key, 2))
    cur = ct
    for i in range(4):
        cur = ops.cmux(sel, ops.encrypt_glwe(
            jnp.zeros(glwe.poly_degree, dtype=np.uint64), sk, glwe,
            jax.random.fold_in(key, 10 + i)), cur, glwe, radix)
    phase = np.asarray(ops.decrypt_glwe_torus(cur, sk, glwe))
    enc = np.asarray(torus.encode(msg, bits), dtype=np.uint64)
    err = (phase - enc).astype(np.int64)
    # error after 4 CMUX levels must be < 1/2 decode bin (2^(64-bits-1))
    assert np.max(np.abs(err)) < 1 << (64 - bits - 2)
    got = np.asarray(ops.decrypt_glwe(cur, sk, glwe, bits))
    np.testing.assert_array_equal(got, np.asarray(msg))
