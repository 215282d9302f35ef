"""Generate the frozen golden-vector fixture (tests/golden_v1.npz).

Pins the framework's deterministic outputs bit-exactly so any kernel
change that flips a bit fails `tests/test_golden.py` (the analogue of
the reference's `deterministic` feature + `assumptions.rs` pinning —
`sunscreen_runtime/src/runtime.rs:464-529`; SEAL-Blake2 bit-compat is a
documented non-goal, so these vectors are self-generated and frozen).

Configuration pinned: CPU backend, unrolled NTT mode (keys sample the
uniform polynomial directly in NTT domain, so ciphertext bytes depend
on the NTT-domain layout; the unrolled/compact bit-reversed layout is
the canonical one).

Run: python tools/gen_golden.py   (rewrites tests/golden_v1.npz)
"""

import os
import sys

os.environ["SUNSCREEN_TPU_NTT"] = "unrolled"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import sunscreen_tpu  # noqa: E402,F401

OUT = os.path.join(os.path.dirname(__file__), "..", "tests",
                   "golden_v1.npz")


def bfv_vectors(out: dict):
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
    prod = ops.multiply_relin(ctx, ct, ct, rlk)
    rot = ops.rotate_rows(ctx, ct, 1, gks)
    swap = ops.rotate_columns(ctx, ct, gks)
    dec = ops.decrypt(ctx, sk, prod)
    out["bfv_params"] = np.array(
        [params.poly_degree, params.plain_modulus,
         *params.coeff_modulus, params.special_modulus], dtype=np.uint64)
    out["bfv_sk"] = np.asarray(sk.s)
    out["bfv_ct"] = np.asarray(ct)
    out["bfv_mul_relin"] = np.asarray(prod)
    out["bfv_rot1"] = np.asarray(rot)
    out["bfv_swap"] = np.asarray(swap)
    out["bfv_dec_mul"] = np.asarray(dec)
    out["bfv_noise_budget"] = np.array(
        [ops.invariant_noise_budget(ctx, sk, prod)], dtype=np.float64)


def tfhe_vectors(out: dict):
    from sunscreen_tpu.tfhe import ops as tops
    from sunscreen_tpu.tfhe import torus
    from sunscreen_tpu.tfhe.params import (TEST_GLWE_DEF_1, TEST_LWE_DEF_1,
                                           TEST_RADIX, RadixDecomposition)

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
    msg = 1
    test_poly = tops.test_polynomial_for(lambda m: (m + 1) % 2, bits,
                                         glwe)
    ct = tops.encrypt_lwe(torus.encode(msg, bits), lwe_sk, lwe,
                          jax.random.fold_in(key, 3))
    res = tops.programmable_bootstrap_univariate(
        ct, test_poly, bsk, ksk, lwe, glwe, TEST_RADIX, ks_radix)
    out["tfhe_lwe_ct"] = np.asarray(ct)
    out["tfhe_pbs_out"] = np.asarray(res)
    out["tfhe_pbs_dec"] = np.array(
        [tops.decrypt_lwe(res, lwe_sk, bits)], dtype=np.uint64)


def sdlp_vectors(out: dict):
    """Pin the SDLP transcript protocol: challenges for a fixed vk and
    fixed commitment points (no witness randomness involved)."""
    from sunscreen_tpu.logproof import linear_relation as lr
    from sunscreen_tpu.zk import curve25519 as cv
    from sunscreen_tpu.zk.merlin import Transcript

    q = 97
    f = [1, 0, 0, 0, 1]  # x^4 + 1
    vk = lr.VerifierKnowledge(
        a=[[[1, 2, 3, 4], [5, 6, 7, 8]]],
        t=[[[9, 10, 11, 12]]],
        bounds=[[[3, 3, 3, 3]], [[3, 3, 3, 3]]],
        f=f, q=q)
    t = Transcript(b"golden sdlp")
    lr._append_vk(t, vk)
    t.append_point(b"w_shared", cv.BASEPOINT)
    t.append_point(b"w", cv.BASEPOINT * 2)
    alpha, beta, gamma, phi, psi = lr._create_challenges(vk, t)
    vals = [alpha, psi, beta[0], gamma[0], phi[0], phi[-1]]
    out["sdlp_challenges"] = np.array([f"{v:064x}" for v in vals],
                                      dtype="U64")
    v = lr._compute_v(vk, alpha, beta, gamma)
    out["sdlp_v_digest"] = np.array(
        [_sha_ints(v)], dtype="U64")


def zk_vectors(out: dict):
    import hashlib

    from sunscreen_tpu.logproof.linear_relation import LogProofGenerators
    from sunscreen_tpu.zk.pedersen import cached_pedersen

    gens = LogProofGenerators(16)
    h = hashlib.sha256()
    for p in gens.g + gens.h:
        h.update(p.encode())
    out["zk_generators_digest"] = np.array([h.hexdigest()], dtype="U64")
    pc = cached_pedersen()
    out["zk_pedersen"] = np.array(
        [pc.B.encode().hex(), pc.B_blinding.encode().hex()], dtype="U64")


def _sha_ints(vals):
    import hashlib
    h = hashlib.sha256()
    for v in vals:
        h.update(int(v).to_bytes(32, "little"))
    return h.hexdigest()


def main():
    out: dict = {}
    bfv_vectors(out)
    tfhe_vectors(out)
    sdlp_vectors(out)
    zk_vectors(out)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}:")
    for k, v in out.items():
        print(f"  {k}: {getattr(v, 'shape', None)} {getattr(v, 'dtype', '')}")


if __name__ == "__main__":
    main()
