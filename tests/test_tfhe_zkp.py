"""TFHE <-> SDLP bridge: prove LWE encryptions (reference:
`sunscreen_tfhe/src/zkp.rs`)."""

import jax
import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.tfhe import LweDef, ops, torus
from sunscreen_tpu.tfhe import zkp as tzkp

LWE = LweDef(dim=32, std=1e-16)
KEY = jax.random.key(4)


def test_prove_lwe_encryption_roundtrip():
    sk = ops.generate_binary_lwe_sk(LWE, jax.random.fold_in(KEY, 0))
    msg, bits = 5, 4
    ct, e = ops.encrypt_lwe_return_components(
        torus.encode(jnp.uint64(msg), bits), sk, LWE,
        jax.random.fold_in(KEY, 1))
    assert int(ops.decrypt_lwe(ct, sk, bits)) == msg
    proof, vk = tzkp.prove_lwe_encryption(ct, sk, msg, int(e), LWE,
                                          bits)
    assert tzkp.verify_lwe_encryption(proof, vk)
    # tampered ciphertext rejected
    ct2 = np.asarray(ct).copy()
    ct2[-1] += 1
    vk2 = tzkp.lwe_statement(ct2, LWE, bits)
    assert not tzkp.verify_lwe_encryption(proof, vk2)
