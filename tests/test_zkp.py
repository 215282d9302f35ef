"""ZKP compiler + bulletproofs backend end-to-end (reference:
`sunscreen/tests/zkp_program_tests.rs`, `sunscreen_zkp_backend` tests).
"""

import pytest

from sunscreen_tpu.runtime.runtime import Runtime
from sunscreen_tpu.types.zkp_types import (Constant, Field, Private,
                                           Public, zkp_program)
from sunscreen_tpu.zk.backend import BulletproofsProof, ZkpError, evaluate


@zkp_program()
def know_factors(a: Private[Field], b: Private[Field],
                 product: Public[Field]):
    (a * b).constrain_eq(product)


@zkp_program()
def poly_eval(x: Private[Field], y: Public[Field], c: Constant[Field]):
    # y == x^3 + c*x + 7
    (x ** 3 + c * x + 7).constrain_eq(y)


@zkp_program()
def in_range_0_255(x: Private[Field]):
    x.to_unsigned(8)


@zkp_program()
def nonzero(x: Private[Field]):
    x.inverse()


def test_prove_verify_factors():
    rt = Runtime.new_zkp()
    proof = rt.prove(know_factors, [17, 23], public_inputs=[391])
    assert rt.verify(know_factors, proof, public_inputs=[391])
    # wrong public input fails
    assert not rt.verify(know_factors, proof, public_inputs=[392])


def test_prover_rejects_bad_witness():
    rt = Runtime.new_zkp()
    with pytest.raises(ZkpError):
        rt.prove(know_factors, [17, 24], public_inputs=[391])


def test_constant_inputs_and_pow():
    rt = Runtime.new_zkp()
    x, c = 5, 3
    y = x**3 + c * x + 7
    proof = rt.prove(poly_eval, [x], public_inputs=[y],
                     constant_inputs=[c])
    assert rt.verify(poly_eval, proof, public_inputs=[y],
                     constant_inputs=[c])
    assert not rt.verify(poly_eval, proof, public_inputs=[y + 1],
                         constant_inputs=[c])


def test_range_gadget():
    rt = Runtime.new_zkp()
    proof = rt.prove(in_range_0_255, [200])
    assert rt.verify(in_range_0_255, proof)
    with pytest.raises(ValueError):
        rt.prove(in_range_0_255, [256])


def test_inverse_gadget():
    rt = Runtime.new_zkp()
    proof = rt.prove(nonzero, [42])
    assert rt.verify(nonzero, proof)
    with pytest.raises(ZeroDivisionError):
        rt.prove(nonzero, [0])


def test_signed_modulus_gadget():
    from sunscreen_tpu.types.zkp_types import SignedModulus, _TLS  # noqa
    from sunscreen_tpu.zk.backend import ZkpProgramContext

    @zkp_program()
    def mod7(x: Private[Field], r_expect: Public[Field]):
        from sunscreen_tpu.types.zkp_types import _ctx
        q, r = _ctx().invoke_gadget(SignedModulus(7, 16), [x.node])
        Field(r).constrain_eq(r_expect)

    rt = Runtime.new_zkp()
    proof = rt.prove(mod7, [100], public_inputs=[100 % 7])
    assert rt.verify(mod7, proof, public_inputs=[100 % 7])
    assert not rt.verify(mod7, proof, public_inputs=[3])


def test_proof_serialization():
    rt = Runtime.new_zkp()
    proof = rt.prove(know_factors, [17, 23], public_inputs=[391])
    blob = proof.to_bytes()
    proof2 = BulletproofsProof.from_bytes(blob)
    assert rt.verify(know_factors, proof2, public_inputs=[391])


def test_jit_evaluation_semantics():
    prog = know_factors.build()
    vals = evaluate(prog, 101, [3, 5], [15], [])
    assert vals is not None
    with pytest.raises(ZkpError):
        evaluate(prog, 101, [3, 5], [16], [])


def test_fluent_proof_and_verification_builders():
    """ProofBuilder / VerificationBuilder (reference builder.rs:29-200
    + Runtime::proof_builder/verification_builder): fluent input
    accumulation, raising verify, and failure on wrong inputs."""
    import pytest

    from sunscreen_tpu.runtime import Runtime
    from sunscreen_tpu.runtime.builders import VerificationError
    from sunscreen_tpu.types.zkp_types import (Constant, Field, Private,
                                               Public, zkp_program)

    @zkp_program()
    def affine(x: Private[Field], a: Constant[Field],
               y: Public[Field]):
        (x * a).constrain_eq(y)

    rt = Runtime.new_zkp()
    proof = (rt.proof_builder(affine)
             .private_input(6)
             .constant_input(7)
             .public_input(42)
             .prove())
    (rt.verification_builder(affine)
     .proof(proof)
     .constant_input(7)
     .public_input(42)
     .verify())   # returns None; raises on failure
    with pytest.raises(VerificationError):
        (rt.verification_builder(affine)
         .proof(proof)
         .constant_input(7)
         .public_input(41)
         .verify())
    with pytest.raises(VerificationError):
        rt.verification_builder(affine).constant_input(7) \
            .public_input(42).verify()   # no proof supplied
    # plural forms
    proof2 = (rt.proof_builder(affine)
              .private_inputs([6]).constant_inputs([7])
              .public_inputs([42]).prove())
    (rt.verification_builder(affine).proof(proof2)
     .constant_inputs([7]).public_inputs([42]).verify())
