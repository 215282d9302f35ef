"""Generate the frozen u32-engine golden fixture (tests/golden_u32_v1.npz).

Companion to gen_golden.py: that fixture pins the u64 engine in the
unrolled (bit-reversed) NTT layout; this one pins the round-3 PRODUCTION
configuration — the u32 engine (moduli < 2^30, uint32 ciphertexts) with
the fused Pallas four-step NTT domain (math/pmntt.py, flat (j2, j1)
order). Ciphertext bytes depend on both the word width and the NTT
domain, so the two fixtures are independent; any kernel change that
flips a bit in either path fails the corresponding test
(tests/test_golden_u32.py). Self-generated and frozen — regeneration
must be intentional and documented (BASELINE.json bit-exactness stance).

Run: python tools/gen_golden_u32.py   (rewrites tests/golden_u32_v1.npz)
"""

import os
import sys

os.environ["SUNSCREEN_TPU_NTT"] = "pallas"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import sunscreen_tpu  # noqa: E402,F401

OUT = os.path.join(os.path.dirname(__file__), "..", "tests",
                   "golden_u32_v1.npz")

# unique parameter set (no other test module builds a context for it,
# so the cached context is guaranteed to carry pallas-mode plans)
POLY_DEGREE, LIMBS, LIMB_BITS = 512, 3, 27


def main():
    from sunscreen_tpu.bfv import BfvParams, get_context, keys, ops

    params = BfvParams.insecure(POLY_DEGREE, limbs=LIMBS,
                                limb_bits=LIMB_BITS)
    ctx = get_context(params)
    assert ctx.word == np.uint32 or str(ctx.word) == "uint32"
    assert ctx.plan_q.mode == "pallas", ctx.plan_q.mode

    key = jax.random.key(1000)
    sk = keys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
    pk = keys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
    rlk = keys.gen_relin_key(ctx, sk, jax.random.fold_in(key, 2))
    gks = keys.gen_galois_keys(
        ctx, sk, jax.random.fold_in(key, 3),
        (ctx.rotate_rows_element(1), ctx.rotate_columns_element))
    pt = (np.arange(ctx.n, dtype=np.uint64) * 6151) % params.plain_modulus
    ct = ops.encrypt(ctx, pk, pt, jax.random.key(77))
    prod = ops.multiply_relin(ctx, ct, ct, rlk)
    out = {
        "params": np.array([params.poly_degree, params.plain_modulus,
                            *params.coeff_modulus,
                            params.special_modulus], dtype=np.uint64),
        "sk": np.asarray(sk.s),
        "ct": np.asarray(ct),
        "mul_relin": np.asarray(prod),
        "dec_mul": np.asarray(ops.decrypt(ctx, sk, prod)),
        "rot1": np.asarray(ops.rotate_rows(ctx, ct, 1, gks)),
        "swap": np.asarray(ops.rotate_columns(ctx, ct, gks)),
        "noise_budget": np.array(
            [float(ops.invariant_noise_budget(ctx, sk, prod))]),
    }
    np.savez(OUT, **out)
    print(f"wrote {OUT}:", {k: v.shape for k, v in out.items()})


if __name__ == "__main__":
    main()
