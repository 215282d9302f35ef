"""SDLP proofs over real BFV ciphertexts (reference:
`logproof/src/bfv_statement.rs` + `logproof/tests/seal.rs` — prove and
verify an SDLP over real ciphertexts, transcripts must agree)."""

import jax
import numpy as np
import pytest

from sunscreen_tpu.bfv import BfvParams, get_context, keys, ops
from sunscreen_tpu.logproof import (LogProofGenerators, create, verify)
from sunscreen_tpu.logproof import inner_product as ip
from sunscreen_tpu.logproof.bfv_statement import BfvStatements
from sunscreen_tpu.zk.merlin import Transcript

PARAMS = BfvParams.insecure(poly_degree=64, limbs=1, limb_bits=28)


@pytest.fixture(scope="module")
def setup():
    ctx = get_context(PARAMS)
    key = jax.random.key(1)
    sk = keys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
    pk = keys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
    return ctx, sk, pk, key


def test_public_encryption_statement_roundtrip(setup):
    ctx, sk, pk, key = setup
    rng = np.random.default_rng(0)
    pt = rng.integers(0, ctx.t, ctx.n, dtype=np.uint64)
    ct, (u, e0, e1) = ops.encrypt_return_components(
        ctx, pk, pt, jax.random.fold_in(key, 2))
    # the components must satisfy the linear relation: decrypt sanity
    np.testing.assert_array_equal(
        np.asarray(ops.decrypt(ctx, sk, ct)), pt)

    st = BfvStatements(ctx)
    mid = st.add_message(pt)
    st.add_public_encryption(mid, np.asarray(ct), pk,
                             np.asarray(u), np.asarray(e0),
                             np.asarray(e1))
    vk, pk_know = st.build()
    gens = LogProofGenerators(vk.l)
    u_gen = ip.get_u()
    proof = create(Transcript(b"bfv-sdlp"), pk_know, gens.g, gens.h,
                   u_gen)
    assert verify(proof, Transcript(b"bfv-sdlp"), vk, gens.g, gens.h,
                  u_gen)
    # a different ciphertext must not verify against this proof
    ct2, comps2 = ops.encrypt_return_components(
        ctx, pk, pt, jax.random.fold_in(key, 3))
    st2 = BfvStatements(ctx)
    mid2 = st2.add_message(pt)
    st2.add_public_encryption(mid2, np.asarray(ct2), pk, *comps2)
    vk2, _ = st2.build()
    assert not verify(proof, Transcript(b"bfv-sdlp"), vk2, gens.g,
                      gens.h, u_gen)


def test_private_encryption_statement(setup):
    ctx, sk, pk, key = setup
    rng = np.random.default_rng(1)
    pt = rng.integers(0, ctx.t, ctx.n, dtype=np.uint64)
    ct, e = ops.encrypt_symmetric_return_components(
        ctx, sk, pt, jax.random.fold_in(key, 4))
    np.testing.assert_array_equal(
        np.asarray(ops.decrypt(ctx, sk, ct)), pt)
    st = BfvStatements(ctx)
    mid = st.add_message(pt)
    st.add_private_encryption(mid, np.asarray(ct), np.asarray(sk.s),
                              np.asarray(e))
    vk, pk_know = st.build()
    gens = LogProofGenerators(vk.l)
    u_gen = ip.get_u()
    proof = create(Transcript(b"bfv-sdlp-sym"), pk_know, gens.g, gens.h,
                   u_gen)
    assert verify(proof, Transcript(b"bfv-sdlp-sym"), vk, gens.g,
                  gens.h, u_gen)


def test_two_statements_shared_message(setup):
    # two encryptions of the same message — one shared message column
    ctx, sk, pk, key = setup
    rng = np.random.default_rng(2)
    pt = rng.integers(0, ctx.t, ctx.n, dtype=np.uint64)
    st = BfvStatements(ctx)
    mid = st.add_message(pt)
    for i in (5, 6):
        ct, comps = ops.encrypt_return_components(
            ctx, pk, pt, jax.random.fold_in(key, i))
        st.add_public_encryption(mid, np.asarray(ct), pk, *comps)
    vk, pk_know = st.build()
    gens = LogProofGenerators(vk.l)
    u_gen = ip.get_u()
    proof = create(Transcript(b"bfv-sdlp2"), pk_know, gens.g, gens.h,
                   u_gen)
    assert verify(proof, Transcript(b"bfv-sdlp2"), vk, gens.g, gens.h,
                  u_gen)


def test_decryption_statement(setup):
    # reference: BfvProofStatement::Decryption — prove a ciphertext
    # decrypts to a known message under the secret key
    ctx, sk, pk, key = setup
    rng = np.random.default_rng(7)
    pt = rng.integers(0, ctx.t, ctx.n, dtype=np.uint64)
    ct = ops.encrypt(ctx, pk, pt, jax.random.fold_in(key, 9))
    st = BfvStatements(ctx)
    mid = st.add_message(pt)
    e = st.add_decryption(mid, np.asarray(ct), sk)
    # decryption error must be within Delta/2
    delta = ctx.params.q_product // ctx.t
    assert np.abs(e).max() < delta // 2
    vk, pk_know = st.build()
    gens = LogProofGenerators(vk.l)
    u_gen = ip.get_u()
    proof = create(Transcript(b"bfv-dec"), pk_know, gens.g, gens.h,
                   u_gen)
    assert verify(proof, Transcript(b"bfv-dec"), vk, gens.g, gens.h,
                  u_gen)


@pytest.mark.skipif(
    not __import__("os").environ.get("SUNSCREEN_TPU_SLOW_TESTS"),
    reason="~1 min after the round-4 curve speedups; "
    "run with SUNSCREEN_TPU_SLOW_TESTS=1 "
           "(driver bench: benchmarks/sdlp_bench.py)")
def test_sdlp_at_production_parameters():
    """Prove + verify a PublicKeyEncryption statement at N=1024/k=2 —
    the reference's `logproof/tests/seal.rs:10-56` regime."""
    import jax
    from sunscreen_tpu.logproof import LogProofGenerators, create, \
        verify
    from sunscreen_tpu.logproof import inner_product as ip

    params = BfvParams.insecure(poly_degree=1024, limbs=2, limb_bits=28)
    ctx = get_context(params)
    key = jax.random.key(2)
    sk = keys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
    pk = keys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
    rng = np.random.default_rng(1)
    pt = rng.integers(0, ctx.t, ctx.n, dtype=np.uint64)
    ct, (u, e0, e1) = ops.encrypt_return_components(
        ctx, pk, pt, jax.random.fold_in(key, 2))
    np.testing.assert_array_equal(np.asarray(ops.decrypt(ctx, sk, ct)),
                                  pt)
    st = BfvStatements(ctx)
    mid = st.add_message(pt)
    st.add_public_encryption(mid, np.asarray(ct), pk, np.asarray(u),
                             np.asarray(e0), np.asarray(e1))
    vk, pk_know = st.build()
    assert vk.d == 1024 and vk.l > 100_000
    gens = LogProofGenerators(vk.l)
    u_gen = ip.get_u()
    proof = create(Transcript(b"bfv-sdlp-prod"), pk_know, gens.g,
                   gens.h, u_gen)
    assert verify(proof, Transcript(b"bfv-sdlp-prod"), vk, gens.g,
                  gens.h, u_gen)
