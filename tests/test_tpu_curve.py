"""Batched TPU curve arithmetic + Pippenger MSM pinned bit-exactly
against the pure-python oracle (`zk/curve25519.py`)."""

import numpy as np

import jax  # noqa: F401  (conftest pins cpu)
import jax.numpy as jnp

from sunscreen_tpu.zk import curve25519 as cv
from sunscreen_tpu.zk import tpu_curve as tc

RNG = np.random.default_rng(0xC0DE)


def _rand_field():
    return int(RNG.integers(0, 2**63)) * int(RNG.integers(0, 2**63)) \
        % tc.P


def test_field_ops_exact():
    for _ in range(10):
        a, b = _rand_field(), _rand_field()
        la = jnp.asarray(tc.limbs_from_int(a)[None])
        lb = jnp.asarray(tc.limbs_from_int(b)[None])
        assert tc.int_from_limbs(np.asarray(tc.fmul(la, lb))[0]) \
            == a * b % tc.P
        assert tc.int_from_limbs(np.asarray(tc.fadd(la, lb))[0]) \
            == (a + b) % tc.P
        assert tc.int_from_limbs(np.asarray(tc.fsub(la, lb))[0]) \
            == (a - b) % tc.P


def test_point_add_double_identity():
    B = cv.BASEPOINT
    pts = [B * int(RNG.integers(1, 2**40)) for _ in range(8)]
    batch = tc.from_points(pts)
    doubled = tc.padd(batch, batch)
    summed = tc.padd(batch, tc.identity((8,)))
    shifted = tc.padd(batch, tc.from_points(pts[1:] + pts[:1]))
    for i in range(8):
        assert tc.to_point(doubled, (i,)) == pts[i] + pts[i]
        assert tc.to_point(summed, (i,)) == pts[i]
        assert tc.to_point(shifted, (i,)) == \
            pts[i] + pts[(i + 1) % 8]


def test_msm_matches_oracle():
    """One compiled shape only — the XLA CPU compile of the Pippenger
    graph is minutes-slow, so both cases share (n=16, c=4). Edge cases
    (zero scalars, duplicate digits, L-1) are folded into the batch."""
    B = cv.BASEPOINT
    n = 16
    scalars = [int(RNG.integers(0, 2**62)) ** 2 % cv.L
               for _ in range(n - 4)] + [0, 1, 1, cv.L - 1]
    points = [B * int(RNG.integers(1, 2**40)) for _ in range(n)]
    want = cv.msm_py(scalars, points)
    got = tc.msm(scalars, points, c=4)
    assert got == want
