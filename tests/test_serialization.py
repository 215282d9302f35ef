"""Serialization round trips (reference: `sunscreen/tests/
serialization.rs` + `WithContext` params validation)."""

import numpy as np
import pytest

from sunscreen_tpu.bfv import BfvParams
from sunscreen_tpu.compiler import Compiler, fhe_program
from sunscreen_tpu.runtime import Runtime
from sunscreen_tpu.runtime import serialization as ser
from sunscreen_tpu.types import Cipher, Signed

PARAMS = BfvParams.insecure(poly_degree=1024, limbs=2, limb_bits=40)


@fhe_program(scheme="bfv")
def mul(a: Cipher[Signed], b: Cipher[Signed]):
    return a * b


def test_full_roundtrip_through_bytes():
    rt = Runtime.new_fhe(PARAMS)
    pub, priv = rt.generate_keys(seed=5, galois=False)
    app = Compiler().with_params(PARAMS).fhe_program(mul).compile()
    prog = app.get_program(mul)

    prog2 = ser.program_from_bytes(ser.program_to_bytes(prog))
    pub2, p_params = ser.public_keys_from_bytes(
        ser.public_keys_to_bytes(pub, PARAMS))
    priv2, _ = ser.private_key_from_bytes(
        ser.private_key_to_bytes(priv, PARAMS))
    assert p_params == PARAMS

    ct = rt.encrypt(Signed(21), pub2, seed=6)
    blob = ser.ciphertext_to_bytes(ct)
    ct2 = ser.ciphertext_from_bytes(blob, expect_params=PARAMS)
    (out,) = rt.run(prog2, [ct2, ct2], pub2)
    out2 = ser.ciphertext_from_bytes(ser.ciphertext_to_bytes(out))
    assert rt.decrypt(out2, priv2) == 441


def test_params_mismatch_rejected():
    rt = Runtime.new_fhe(PARAMS)
    pub, _ = rt.generate_keys(seed=5, galois=False)
    ct = rt.encrypt(Signed(1), pub, seed=7)
    other = BfvParams.insecure(poly_degree=2048, limbs=2, limb_bits=40)
    with pytest.raises(ser.ParamsMismatch):
        ser.ciphertext_from_bytes(
            ser.ciphertext_to_bytes(ct), expect_params=other)


def test_galois_keys_roundtrip():
    rt = Runtime.new_fhe(PARAMS)
    pub, priv = rt.generate_keys(seed=8, galois=True)
    pub2, _ = ser.public_keys_from_bytes(
        ser.public_keys_to_bytes(pub, PARAMS))
    assert sorted(pub2.galois_keys.keys) == sorted(pub.galois_keys.keys)
    k = next(iter(pub.galois_keys.keys))
    np.testing.assert_array_equal(
        np.asarray(pub2.galois_keys[k].k0),
        np.asarray(pub.galois_keys[k].k0))
