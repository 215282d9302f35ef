"""Fused Pallas RNS kernels (math/prns.py) bit-exact vs the rns.py
machinery (interpret mode on CPU; real-TPU compilation exercised by
benchmarks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sunscreen_tpu.bfv import BfvParams, get_context
from sunscreen_tpu.math import prns

PARAMS = BfvParams.insecure(poly_degree=256, limbs=3, limb_bits=28)


@pytest.fixture(scope="module")
def ctx():
    c = get_context(PARAMS)
    assert c.word == jnp.uint32, "u32 engine required"
    return c


def _rand(base, shape_lead, n, rng):
    x = np.empty((*shape_lead, base.k, n), np.uint32)
    for i, q in enumerate(base.moduli):
        x[..., i, :] = rng.integers(0, q, (*shape_lead, n),
                                    dtype=np.uint32)
    return jnp.asarray(x)


def test_fused_convert_matches_base_converter(ctx):
    rng = np.random.default_rng(0)
    x = _rand(ctx.q_base, (2,), ctx.n, rng)
    want = np.asarray(ctx.conv_q_to_aux.convert(x, centered=True))
    fused = prns.fused_converter(ctx.conv_q_to_aux)
    got = np.asarray(fused(x))
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_fused_convert_centered_boundaries(ctx):
    """Centered conversion of exact tiny +/- values (the alpha
    correction's sensitive region)."""
    q_base = ctx.q_base
    n = ctx.n
    x = np.zeros((q_base.k, n), np.uint32)
    # encode small centered ints -8..8 across the first columns
    for col, v in enumerate(range(-8, 9)):
        for i, q in enumerate(q_base.moduli):
            x[i, col] = v % q
    xj = jnp.asarray(x)
    want = np.asarray(ctx.conv_q_to_aux.convert(xj, centered=True))
    got = np.asarray(prns.fused_converter(ctx.conv_q_to_aux)(xj))
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_fused_scale_matches_scale_and_round(ctx):
    rng = np.random.default_rng(1)
    x = _rand(ctx.mul_base, (2,), ctx.n, rng)
    want = np.asarray(ctx.scale_mul_to_aux.apply(x))
    fused = prns.fused_scaler(ctx.scale_mul_to_aux)
    got = np.asarray(fused(x))
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_fused_convert_aux_to_q(ctx):
    rng = np.random.default_rng(2)
    x = _rand(ctx.aux_base, (1,), ctx.n, rng)
    want = np.asarray(ctx.conv_aux_to_q.convert(x, centered=True))
    got = np.asarray(prns.fused_converter(ctx.conv_aux_to_q)(x))
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_fused_mod_down(ctx):
    rng = np.random.default_rng(3)
    p = ctx.params.special_modulus
    x_q = _rand(ctx.q_base, (2,), ctx.n, rng)
    x_p = jnp.asarray(rng.integers(0, p, (2, ctx.n), dtype=np.uint32))
    want = np.asarray(ctx.mod_down.apply(x_q, x_p))
    got = np.asarray(prns.fused_mod_down(ctx.mod_down)(x_q, x_p))
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_fused_tensor3(ctx):
    rng = np.random.default_rng(4)
    x = _rand(ctx.mul_base, (2, 2), ctx.n, rng)
    a, b = x[0][None], x[1][None]
    km = ctx.mul_base.k
    qm = ctx.mul_base.q_dev.reshape(km, 1)
    c0 = ctx.mul_base.c0_dev.reshape(km, 1)
    c1 = ctx.mul_base.c1_dev.reshape(km, 1)
    from sunscreen_tpu.math import modular as m
    want = []
    for j in range(3):
        acc = None
        for ia in range(2):
            ib = j - ia
            if 0 <= ib < 2:
                t = m.w_mul_mod(a[:, ia], b[:, ib], qm, c0, c1)
                acc = t if acc is None else m.add_mod(acc, t, qm)
        want.append(np.asarray(acc))
    want = np.stack(want, axis=1)
    got = np.asarray(prns.FusedTensor3(ctx.mul_base.moduli)(a, b))
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_fused_ks_inner(ctx):
    rng = np.random.default_rng(5)
    kk = ctx.k + 1
    kdig = ctx.k
    n = ctx.n
    mods = ctx.key_base.moduli
    d_hat = np.empty((1, kdig, kk, n), np.uint32)
    k0 = np.empty((kdig, kk, n), np.uint32)
    k1 = np.empty((kdig, kk, n), np.uint32)
    for j, q in enumerate(mods):
        d_hat[:, :, j] = rng.integers(0, q, (1, kdig, n),
                                      dtype=np.uint32)
        k0[:, j] = rng.integers(0, q, (kdig, n), dtype=np.uint32)
        k1[:, j] = rng.integers(0, q, (kdig, n), dtype=np.uint32)
    acc = prns.FusedKsInner(mods)(
        jnp.asarray(d_hat), jnp.asarray(k0), jnp.asarray(k1))
    got0, got1 = acc[..., 0, :, :], acc[..., 1, :, :]
    # python-int oracle
    for j, q in enumerate(mods):
        for col in (0, 1, n - 1):
            w0 = sum(int(d_hat[0, i, j, col]) * int(k0[i, j, col])
                     for i in range(kdig)) % q
            w1 = sum(int(d_hat[0, i, j, col]) * int(k1[i, j, col])
                     for i in range(kdig)) % q
            assert int(np.asarray(got0)[0, j, col]) == w0
            assert int(np.asarray(got1)[0, j, col]) == w1


def test_fused_scale_convert_chain(ctx):
    """FusedScaleConvert == ScaleAndRound.apply then centered
    BaseConverter.convert, bit-exact."""
    rng = np.random.default_rng(6)
    x = _rand(ctx.mul_base, (2,), ctx.n, rng)
    want = np.asarray(ctx.conv_aux_to_q.convert(
        ctx.scale_mul_to_aux.apply(x), centered=True))
    got = np.asarray(prns.FusedScaleConvert(
        ctx.scale_mul_to_aux, ctx.conv_aux_to_q)(x))
    np.testing.assert_array_equal(got, want.astype(np.uint32))
