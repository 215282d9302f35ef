"""Linked proofs: SDLP + R1CS over the same message (reference:
`sunscreen/tests/linked.rs`, `sunscreen_runtime/src/linked.rs`)."""

import numpy as np
import pytest

from sunscreen_tpu.bfv import BfvParams
from sunscreen_tpu.runtime import Runtime
from sunscreen_tpu.runtime.linked import LogProofBuilder
from sunscreen_tpu.types import Unsigned64
from sunscreen_tpu.types.zkp_types import Field, Private, Public, \
    zkp_program

PARAMS = BfvParams.insecure(poly_degree=64, limbs=1, limb_bits=28)


@zkp_program()
def in_range(x: Private[Field]):
    x.to_unsigned(8)


@zkp_program()
def equals_public(x: Private[Field], y: Public[Field]):
    x.constrain_eq(y)


@pytest.fixture(scope="module")
def rt_keys():
    rt = Runtime.new_fhe_zkp(PARAMS)
    pub, priv = rt.generate_keys(seed=3, galois=False, relin=False)
    return rt, pub, priv


def test_sdlp_via_builder(rt_keys):
    rt, pub, priv = rt_keys
    builder = LogProofBuilder(rt)
    ct = builder.encrypt(Unsigned64(123), pub, seed=10)
    sdlp = builder.build_sdlp()
    assert sdlp.verify()
    assert rt.decrypt(ct, priv) == 123


def test_linked_proof_roundtrip(rt_keys):
    rt, pub, priv = rt_keys
    builder = LogProofBuilder(rt)
    ct, link = builder.encrypt_returning_link(Unsigned64(200), pub,
                                              seed=11)
    assert link.value == 200
    proof = builder.build_linked(in_range)
    assert proof.verify(in_range, expected_link_count=1)
    # the ciphertext really encrypts the linked value
    assert rt.decrypt(ct, priv) == 200
    # applications can pin WHICH statement message is linked
    assert proof.verify(in_range, expected_message_ids=[link.message_id])
    assert not proof.verify(in_range,
                            expected_message_ids=[link.message_id + 1])
    # values mode REQUIRES the verifier to pin the link count/ids
    # (the plain-Field signature can't reveal it) — unpinned fails
    assert not proof.verify(in_range)
    assert not proof.verify(in_range, expected_link_count=2)


def test_linked_proof_public_equality(rt_keys):
    rt, pub, priv = rt_keys
    builder = LogProofBuilder(rt)
    _, link = builder.encrypt_returning_link(Unsigned64(77), pub,
                                             seed=12)
    proof = builder.build_linked(equals_public, public_inputs=[77])
    assert proof.verify(equals_public, public_inputs=[77],
                        expected_link_count=1)
    assert not proof.verify(equals_public, public_inputs=[78],
                            expected_link_count=1)


def test_linked_proof_bad_witness_fails(rt_keys):
    rt, pub, priv = rt_keys
    builder = LogProofBuilder(rt)
    builder.encrypt_returning_link(Unsigned64(300), pub, seed=13)
    with pytest.raises(ValueError):
        builder.build_linked(in_range)  # 300 doesn't fit in 8 bits


def test_bridge_tamper_rejected(rt_keys):
    rt, pub, priv = rt_keys
    b1 = LogProofBuilder(rt)
    b1.encrypt_returning_link(Unsigned64(5), pub, seed=14)
    p1 = b1.build_linked(in_range)
    b2 = LogProofBuilder(rt)
    b2.encrypt_returning_link(Unsigned64(6), pub, seed=15)
    p2 = b2.build_linked(in_range)
    # swap the bulletproof (commits a different value) -> bridge fails
    p1.bp_proof = p2.bp_proof
    assert not p1.verify(in_range, expected_link_count=1)


def test_signed_negative_linked_proof(rt_keys):
    """BfvSigned equivalent: a NEGATIVE Signed value links with the
    correct field value (L - |v|) and proves (reference:
    `types/zkp/bfv_plaintext.rs` — the headline private_tx need)."""
    from sunscreen_tpu.types import Signed
    from sunscreen_tpu.zk import curve25519 as cv
    rt, pub, priv = rt_keys
    builder = LogProofBuilder(rt)
    ct, link = builder.encrypt_returning_link(Signed(-42), pub, seed=16)
    assert link.value == (-42) % cv.L
    proof = builder.build_linked(equals_public,
                                 public_inputs=[(-42) % cv.L])
    assert proof.verify(equals_public, public_inputs=[(-42) % cv.L],
                        expected_message_ids=[link.message_id])
    assert not proof.verify(equals_public, public_inputs=[42],
                            expected_link_count=1)
    assert rt.decrypt(ct, priv) == -42


def test_decrypt_returning_link(rt_keys):
    rt, pub, priv = rt_keys
    ct = rt.encrypt(Unsigned64(99), pub, seed=17)
    builder = LogProofBuilder(rt)
    value, link = builder.decrypt_returning_link(ct, priv)
    assert value == 99 and link.value == 99
    proof = builder.build_linked(equals_public, public_inputs=[99])
    assert proof.verify(equals_public, public_inputs=[99],
                        expected_link_count=1)


def test_reencrypt_statement(rt_keys):
    """reencrypt binds old-ct decryption and new-ct encryption to ONE
    shared message (reference: `LogProofBuilder::reencrypt`)."""
    rt, pub, priv = rt_keys
    ct = rt.encrypt(Unsigned64(31), pub, seed=18)
    builder = LogProofBuilder(rt)
    new_ct, link = builder.reencrypt(ct, priv, pub, seed=19)
    assert link.value == 31
    sdlp = builder.build_sdlp()
    assert sdlp.verify()
    assert rt.decrypt(new_ct, priv) == 31


# -- typed in-circuit linked args (reference: types/zkp/bfv_plaintext.rs,
#    #[linked] surface zkp_program.rs:110-164) ------------------------------

def test_linked_bfv_signed_in_circuit(rt_keys):
    from sunscreen_tpu.types import Signed
    from sunscreen_tpu.types.zkp_types import BfvSigned, Linked

    @zkp_program()
    def signed_equals(x: Linked[BfvSigned], y: Public[Field]):
        x.constrain_fresh_encoding()
        v = x.into_field_elem()
        v.constrain_eq(y)

    rt, pub, priv = rt_keys
    builder = LogProofBuilder(rt)
    ct, link = builder.encrypt_returning_link(Signed(-42), pub, seed=21)
    want = (-42) % \
        0x1000000000000000000000000000000014def9dea2f79cd65812631a5cf5d3ed
    proof = builder.build_linked(signed_equals, public_inputs=[want])
    assert proof.verify(signed_equals, public_inputs=[want])
    assert not proof.verify(signed_equals, public_inputs=[42])
    assert rt.decrypt(ct, priv) == -42


def test_linked_bfv_signed_range_proof(rt_keys):
    """The reference's fractional-range-proof shape: prove
    0 <= unshielded <= balance with the balance a linked plaintext
    (sunscreen/benches/fractional_range_proof.rs, here with the typed
    linked surface)."""
    from sunscreen_tpu.types import Signed
    from sunscreen_tpu.types.zkp_types import BfvSigned, Linked

    @zkp_program()
    def in_balance(balance: Linked[BfvSigned],
                   unshielded: Public[Field]):
        diff = balance.into_field_elem() - unshielded
        diff.to_unsigned(16)          # 0 <= balance - unshielded < 2^16
        unshielded.to_unsigned(16)

    rt, pub, priv = rt_keys
    builder = LogProofBuilder(rt)
    builder.encrypt_returning_link(Signed(1000), pub, seed=22)
    proof = builder.build_linked(in_balance, public_inputs=[400])
    assert proof.verify(in_balance, public_inputs=[400])
    # tx larger than the balance must not verify
    assert not proof.verify(in_balance, public_inputs=[40000])


def test_compressed_bridge_size(rt_keys):
    """The bridge is two log-size ZK IPPs — O(log l), NOT O(l) scalars
    or one commitment per shared bit — and typed linked bits ride as
    uncommitted BP wires (no per-bit V points in the BP proof)."""
    from sunscreen_tpu.types import Signed
    from sunscreen_tpu.types.zkp_types import BfvSigned, Linked

    @zkp_program()
    def anything(x: Linked[BfvSigned]):
        x.into_field_elem().constrain_eq(x.into_field_elem())

    rt, pub, priv = rt_keys
    builder = LogProofBuilder(rt)
    builder.encrypt_returning_link(Signed(7), pub, seed=31)
    proof = builder.build_linked(anything)
    n_bits = sum(hi - lo for lo, hi in proof.shared_slices)
    assert n_bits > 100          # the link really spans a bit expansion
    sizes = proof.size_bytes()
    assert sizes["bridge"] < 4096, sizes
    # no per-bit commitments: only gadget hidden inputs are committed
    assert len(proof.bp_proof.commitments) < n_bits / 4
    assert proof.verify(anything)


def test_compressed_bridge_tamper_rejected(rt_keys):
    """Flipping the shared IPP of the bridge must fail verification."""
    from sunscreen_tpu.types import Signed
    from sunscreen_tpu.types.zkp_types import BfvSigned, Linked

    @zkp_program()
    def anything2(x: Linked[BfvSigned]):
        x.constrain_fresh_encoding()

    rt, pub, priv = rt_keys
    builder = LogProofBuilder(rt)
    builder.encrypt_returning_link(Signed(9), pub, seed=32)
    proof = builder.build_linked(anything2)
    assert proof.verify(anything2)
    proof.bridge.ipp_shared, proof.bridge.ipp_unshared = \
        proof.bridge.ipp_unshared, proof.bridge.ipp_shared
    assert not proof.verify(anything2)


@pytest.mark.skipif(
    not __import__("os").environ.get("SUNSCREEN_TPU_SLOW_TESTS"),
    reason="~80 s after the round-4 curve speedups; "
           "run with SUNSCREEN_TPU_SLOW_TESTS=1")
def test_linked_proof_at_production_parameters():
    """A COMPLETE linked proof (SDLP + BP + compressed bridge) at the
    reference's production regime N=1024/k=2 (`logproof/tests/seal.rs`
    scale): feasible only because the bridge is O(log l) — the earlier
    per-bit Schnorr would have cost ~18 MB of response scalars at
    l≈280k."""
    from sunscreen_tpu.types import Signed
    from sunscreen_tpu.types.zkp_types import BfvSigned, Linked

    @zkp_program()
    def prod_balance(balance: Linked[BfvSigned],
                     unshielded: Public[Field]):
        balance.constrain_fresh_encoding()
        diff = balance.into_field_elem() - unshielded
        diff.to_unsigned(16)
        unshielded.to_unsigned(16)

    params = BfvParams.insecure(poly_degree=1024, limbs=2,
                                limb_bits=28)
    rt = Runtime.new_fhe_zkp(params)
    pub, priv = rt.generate_keys(seed=4, galois=False, relin=False)
    builder = LogProofBuilder(rt)
    ct, link = builder.encrypt_returning_link(Signed(1000), pub,
                                              seed=41)
    proof = builder.build_linked(prod_balance, public_inputs=[400])
    assert proof.vk.l > 100_000
    sizes = proof.size_bytes()
    assert sizes["bridge"] < 8192, sizes   # O(log l), not O(l)
    assert proof.verify(prod_balance, public_inputs=[400])
    assert not proof.verify(prod_balance, public_inputs=[40000])
    assert rt.decrypt(ct, priv) == 1000


def test_linked_type_mismatch_rejected(rt_keys):
    from sunscreen_tpu.types import Unsigned64
    from sunscreen_tpu.types.zkp_types import BfvRational, Linked

    @zkp_program()
    def rational_prog(x: Linked[BfvRational]):
        num, den = x.into_field_elems()
        num.constrain_eq(num)
        del den

    rt, pub, priv = rt_keys
    builder = LogProofBuilder(rt)
    builder.encrypt_returning_link(Unsigned64(5), pub, seed=23)
    with pytest.raises(TypeError):
        builder.build_linked(rational_prog)


# -- hostile-proof structural validation (advisor r3 findings) --------------

def test_duplicate_message_ids_rejected(rt_keys):
    """message_ids=[mid, mid] must fail closed: duplicated ids alias
    h_shared generators, weakening Pedersen binding to the SUM of the
    duplicated openings (advisor r3-high)."""
    rt, pub, priv = rt_keys
    builder = LogProofBuilder(rt)
    _, link = builder.encrypt_returning_link(Unsigned64(9), pub, seed=41)
    proof = builder.build_linked(in_range)
    mid = proof.message_ids[0]
    proof.message_ids = [mid, mid]
    assert not proof.verify(in_range, expected_link_count=2)
    assert not proof.verify(in_range, expected_message_ids=[mid, mid])


def test_hostile_message_ids_fail_closed(rt_keys):
    """Out-of-range / non-message-column ids return False (never raise
    IndexError), and bool/negative ids are rejected."""
    rt, pub, priv = rt_keys
    builder = LogProofBuilder(rt)
    builder.encrypt_returning_link(Unsigned64(9), pub, seed=42)
    proof = builder.build_linked(in_range)
    for bad in ([10**6], [-1], [proof.vk.n_messages], [True]):
        proof2_ids = proof.message_ids
        proof.message_ids = bad
        try:
            assert not proof.verify(in_range,
                                    expected_message_ids=list(bad))
        finally:
            proof.message_ids = proof2_ids


def test_wires_mode_forged_params_rejected(rt_keys):
    """The circuit must not be built from prover-controlled params:
    a proof shipping params that disagree with the verified statement
    (different t / degree / q) fails (advisor r3-medium)."""
    import dataclasses

    from sunscreen_tpu.types import Signed
    from sunscreen_tpu.types.zkp_types import BfvSigned, Linked

    @zkp_program()
    def fresh_ok(x: Linked[BfvSigned]):
        x.constrain_fresh_encoding()

    rt, pub, priv = rt_keys
    builder = LogProofBuilder(rt)
    builder.encrypt_returning_link(Signed(3), pub, seed=43)
    proof = builder.build_linked(fresh_ok)
    good = proof.params
    assert proof.verify(fresh_ok)
    # the verifying application can (and should) supply params itself
    assert proof.verify(fresh_ok, params=good)
    # plain-modulus forgery changing the bit layout: the slice-width
    # check pins ceil_log2(t)+1 (the ONLY channel through which t
    # enters the circuit; same-bit-length t builds an identical
    # circuit, so pinning the bit length pins the semantics)
    proof.params = dataclasses.replace(good,
                                       plain_modulus=good.plain_modulus * 4)
    assert not proof.verify(fresh_ok)
    # plain modulus inconsistent with the statement's Δ = q//t rows
    # (same bit length, different floor window)
    proof.params = dataclasses.replace(good,
                                       plain_modulus=good.plain_modulus
                                       + 100)
    assert not proof.verify(fresh_ok)
    # degree forgery
    proof.params = dataclasses.replace(good, poly_degree=128)
    assert not proof.verify(fresh_ok)
    # params stripped entirely
    proof.params = None
    assert not proof.verify(fresh_ok)
    # application-supplied params override the forged/absent field
    assert proof.verify(fresh_ok, params=good)
    proof.params = good
    # wires-mode id-count forgery: fewer/more ids than the typed args
    mid = proof.message_ids[0]
    proof.message_ids = []
    assert not proof.verify(fresh_ok)
    proof.message_ids = [mid, mid + 1]
    assert not proof.verify(fresh_ok)


def test_linked_proof_serialization_roundtrip(rt_keys):
    """LinkedProof wire format: proof-only (the verifier supplies vk),
    roundtrips byte-exactly and still verifies; truncation and
    trailing garbage fail closed with DecodeError."""
    from sunscreen_tpu.runtime.linked import LinkedProof
    from sunscreen_tpu.types import Signed
    from sunscreen_tpu.types.zkp_types import BfvSigned, Linked
    from sunscreen_tpu.zk import curve25519 as cv

    @zkp_program()
    def ser_prog(x: Linked[BfvSigned]):
        x.constrain_fresh_encoding()

    rt, pub, priv = rt_keys
    builder = LogProofBuilder(rt)
    builder.encrypt_returning_link(Signed(12), pub, seed=51)
    proof = builder.build_linked(ser_prog)
    blob = proof.to_bytes()
    back = LinkedProof.from_bytes(blob, proof.vk)
    assert back.to_bytes() == blob
    assert back.message_ids == proof.message_ids
    assert back.params == proof.params
    assert back.verify(ser_prog)
    with pytest.raises(cv.DecodeError):
        LinkedProof.from_bytes(blob[:-3], proof.vk)
    with pytest.raises(cv.DecodeError):
        LinkedProof.from_bytes(blob + b"\x00", proof.vk)

    # malformed params block raises DecodeError (not struct.error):
    # locate the params length word after the message-id table
    import struct
    (n_mids,) = struct.unpack_from("<I", blob, 0)
    poff = 4 + 8 * n_mids
    (plen,) = struct.unpack_from("<I", blob, poff)
    assert plen >= 28, "fixture proof should carry params"
    for bad_plen in (1, 27, plen - 1, plen + 1):
        # keep total length consistent so only the params block is bad
        forged = bytearray(blob)
        struct.pack_into("<I", forged, poff, bad_plen)
        if bad_plen < plen:
            del forged[poff + 4 + bad_plen:poff + 4 + plen]
        else:
            forged[poff + 4 + plen:poff + 4 + plen] = (
                b"\x00" * (bad_plen - plen))
        with pytest.raises(cv.DecodeError):
            LinkedProof.from_bytes(bytes(forged), proof.vk)

    # values-mode proof (params field absent) roundtrips too
    b2 = LogProofBuilder(rt)
    _, link = b2.encrypt_returning_link(Unsigned64(9), pub, seed=52)
    p2 = b2.build_linked(in_range)
    back2 = LinkedProof.from_bytes(p2.to_bytes(), p2.vk)
    assert back2.params is None
    assert back2.verify(in_range,
                        expected_message_ids=[link.message_id])
