"""Golden-vector bit-exactness for the u32 engine + fused Pallas NTT
domain — the round-3 production configuration (the original golden_v1
fixture pins the u64 engine in the unrolled layout; ciphertext bytes
depend on word width AND NTT domain, so both paths are pinned
independently). Fixture: tools/gen_golden_u32.py; regeneration must be
intentional and documented."""

import os

import numpy as np
import pytest

import jax  # noqa: F401  (conftest pins cpu first)

FIXTURE = os.path.join(os.path.dirname(__file__), "golden_u32_v1.npz")


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(FIXTURE), \
        "missing fixture — run tools/gen_golden_u32.py"
    return np.load(FIXTURE)


@pytest.fixture(scope="module")
def artifacts():
    """Context + artifacts under the pallas NTT mode. The env var is
    set only inside this fixture (module scope) and the parameter set
    is unique to this module, so the plan/context caches cannot leak a
    different mode in either direction."""
    prev = os.environ.get("SUNSCREEN_TPU_NTT")
    os.environ["SUNSCREEN_TPU_NTT"] = "pallas"
    try:
        from sunscreen_tpu.bfv import BfvParams, get_context, keys, ops

        params = BfvParams.insecure(512, limbs=3, limb_bits=27)
        ctx = get_context(params)
        assert ctx.plan_q.mode == "pallas", ctx.plan_q.mode
        key = jax.random.key(1000)
        sk = keys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
        pk = keys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
        rlk = keys.gen_relin_key(ctx, sk, jax.random.fold_in(key, 2))
        gks = keys.gen_galois_keys(
            ctx, sk, jax.random.fold_in(key, 3),
            (ctx.rotate_rows_element(1), ctx.rotate_columns_element))
        pt = (np.arange(ctx.n, dtype=np.uint64) * 6151) \
            % params.plain_modulus
        ct = ops.encrypt(ctx, pk, pt, jax.random.key(77))
        yield params, ctx, sk, rlk, gks, ct
    finally:
        if prev is None:
            os.environ.pop("SUNSCREEN_TPU_NTT", None)
        else:
            os.environ["SUNSCREEN_TPU_NTT"] = prev


def test_u32_params_pinned(golden, artifacts):
    params = artifacts[0]
    got = np.array([params.poly_degree, params.plain_modulus,
                    *params.coeff_modulus, params.special_modulus],
                   dtype=np.uint64)
    np.testing.assert_array_equal(got, golden["params"])


def test_u32_sk_and_ct_bits(golden, artifacts):
    _, _, sk, _, _, ct = artifacts
    assert np.asarray(ct).dtype == np.uint32
    np.testing.assert_array_equal(np.asarray(sk.s), golden["sk"])
    np.testing.assert_array_equal(np.asarray(ct), golden["ct"])


def test_u32_mul_relin_bits(golden, artifacts):
    from sunscreen_tpu.bfv import ops
    _, ctx, sk, rlk, _, ct = artifacts
    prod = ops.multiply_relin(ctx, ct, ct, rlk)
    np.testing.assert_array_equal(np.asarray(prod), golden["mul_relin"])
    np.testing.assert_array_equal(np.asarray(ops.decrypt(ctx, sk, prod)),
                                  golden["dec_mul"])
    assert float(ops.invariant_noise_budget(ctx, sk, prod)) == \
        float(golden["noise_budget"][0])


def test_u32_rotations_bits(golden, artifacts):
    from sunscreen_tpu.bfv import ops
    _, ctx, _, _, gks, ct = artifacts
    np.testing.assert_array_equal(
        np.asarray(ops.rotate_rows(ctx, ct, 1, gks)), golden["rot1"])
    np.testing.assert_array_equal(
        np.asarray(ops.rotate_columns(ctx, ct, gks)), golden["swap"])
