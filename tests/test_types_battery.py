"""Per-type operator batteries (reference: the per-type test modules
under `sunscreen/src/types/bfv/*` — signed.rs, unsigned.rs,
fractional.rs, rational.rs each carry add/sub/mul/neg/encoding
batteries over positive, negative, and boundary operands)."""

import numpy as np
import pytest

from sunscreen_tpu.bfv import BfvParams
from sunscreen_tpu.compiler import Compiler
from sunscreen_tpu.compiler.trace import fhe_program
from sunscreen_tpu.runtime import Runtime
from sunscreen_tpu.types import (Batched, Cipher, Fractional, Rational,
                                 Signed, Unsigned64)

PARAMS = BfvParams.insecure(poly_degree=128, limbs=2, limb_bits=40)


@pytest.fixture(scope="module")
def rt_keys():
    rt = Runtime.new_fhe(PARAMS)
    pub, priv = rt.generate_keys(seed=11)
    return rt, pub, priv


def _run1(rt, pub, prog_fn, args):
    app = Compiler().with_params(PARAMS).fhe_program(prog_fn).compile()
    (out,) = rt.run(app.get_program(prog_fn), args, pub)
    return out


# -- Signed -----------------------------------------------------------------

@pytest.mark.parametrize("a,b", [(3, 4), (-3, 4), (3, -4), (-3, -4),
                                 (0, 7), (12345, -6789)])
def test_signed_arith(rt_keys, a, b):
    rt, pub, priv = rt_keys

    @fhe_program(scheme="bfv")
    def ops_(x: Cipher[Signed], y: Cipher[Signed]):
        return x + y, x - y, x * y, -x, x + 5, 2 * y

    app = Compiler().with_params(PARAMS).fhe_program(ops_).compile()
    ca = rt.encrypt(Signed(a), pub, seed=1)
    cb = rt.encrypt(Signed(b), pub, seed=2)
    outs = rt.run(app.get_program(ops_), [ca, cb], pub)
    got = [rt.decrypt(o, priv) for o in outs]
    assert got == [a + b, a - b, a * b, -a, a + 5, 2 * b]


def test_signed_encode_decode_boundaries():
    for v in (0, 1, -1, 2**40, -(2**40), 2**62, -(2**62)):
        poly = Signed.encode(v, PARAMS)
        assert Signed.decode(poly, PARAMS) == v


# -- Unsigned64 ---------------------------------------------------------------

def test_unsigned_wrapping_semantics():
    # decode is mod 2^64 (reference: wrapping semantics, unsigned.rs)
    v = 2**64 - 1
    poly = Unsigned64.encode(v, PARAMS)
    assert Unsigned64.decode(poly, PARAMS) == v


@pytest.mark.parametrize("a,b", [(5, 7), (0, 1), (2**32, 3)])
def test_unsigned_arith(rt_keys, a, b):
    rt, pub, priv = rt_keys

    @fhe_program(scheme="bfv")
    def ops_(x: Cipher[Unsigned64], y: Cipher[Unsigned64]):
        return x + y, x * y

    app = Compiler().with_params(PARAMS).fhe_program(ops_).compile()
    ca = rt.encrypt(Unsigned64(a), pub, seed=3)
    cb = rt.encrypt(Unsigned64(b), pub, seed=4)
    s, p = rt.run(app.get_program(ops_), [ca, cb], pub)
    assert rt.decrypt(s, priv) == a + b
    assert rt.decrypt(p, priv) == a * b


# -- Fractional ---------------------------------------------------------------

@pytest.mark.parametrize("a,b", [(3.5, 2.25), (-1.75, 0.5),
                                 (10.0, -0.125)])
def test_fractional_arith(rt_keys, a, b):
    rt, pub, priv = rt_keys

    @fhe_program(scheme="bfv")
    def ops_(x: Cipher[Fractional], y: Cipher[Fractional]):
        return x + y, x - y, x * y, x / 2.0

    app = Compiler().with_params(PARAMS).fhe_program(ops_).compile()
    ca = rt.encrypt(Fractional(a), pub, seed=5)
    cb = rt.encrypt(Fractional(b), pub, seed=6)
    outs = rt.run(app.get_program(ops_), [ca, cb], pub)
    got = [rt.decrypt(o, priv) for o in outs]
    assert got[0] == pytest.approx(a + b)
    assert got[1] == pytest.approx(a - b)
    assert got[2] == pytest.approx(a * b)
    assert got[3] == pytest.approx(a / 2.0)


# -- Rational -----------------------------------------------------------------

def test_rational_division(rt_keys):
    rt, pub, priv = rt_keys

    @fhe_program(scheme="bfv")
    def div(x: Cipher[Rational], y: Cipher[Rational]):
        return x / y, x + y, x * y

    app = Compiler().with_params(PARAMS).fhe_program(div).compile()
    from fractions import Fraction
    a, b = Fraction(3, 4), Fraction(-5, 2)
    ca = rt.encrypt(Rational(3, 4), pub, seed=7)
    cb = rt.encrypt(Rational(-5, 2), pub, seed=8)
    q, s, p = rt.run(app.get_program(div), [ca, cb], pub)
    assert rt.decrypt(q, priv) == a / b
    assert rt.decrypt(s, priv) == a + b
    assert rt.decrypt(p, priv) == a * b


# -- Batched ------------------------------------------------------------------

def test_batched_rotations_and_swap(rt_keys):
    rt, pub, priv = rt_keys

    @fhe_program(scheme="bfv")
    def rots(x: Cipher[Batched]):
        return x << 2, x >> 1, x.swap_rows()

    app = Compiler().with_params(PARAMS).fhe_program(rots).compile()
    n = PARAMS.poly_degree
    rows = np.arange(n, dtype=np.uint64) % 11
    ct = rt.encrypt(Batched(rows), pub, seed=9)
    left, right, swapped = rt.run(app.get_program(rots), [ct], pub)
    half = n // 2
    r2 = rows.reshape(2, half)
    exp_left = np.concatenate([np.roll(r2[0], -2), np.roll(r2[1], -2)])
    exp_right = np.concatenate([np.roll(r2[0], 1), np.roll(r2[1], 1)])
    exp_swap = np.concatenate([r2[1], r2[0]])
    np.testing.assert_array_equal(
        np.asarray(rt.decrypt(left, priv)).reshape(-1), exp_left)
    np.testing.assert_array_equal(
        np.asarray(rt.decrypt(right, priv)).reshape(-1), exp_right)
    np.testing.assert_array_equal(
        np.asarray(rt.decrypt(swapped, priv)).reshape(-1), exp_swap)
