"""RNS base conversion / scale-and-round vs exact Python bigints.

Analogue of SEAL's RNSTool unit tests: every device kernel is checked
against the mathematically exact host computation.
"""

import numpy as np
import pytest

from sunscreen_tpu.math import primes, rns

RNG = np.random.default_rng(7)


def rand_residues(base: rns.RnsBase, n: int) -> tuple[list[int], np.ndarray]:
    vals = [int(RNG.integers(0, 1 << 62)) * int(RNG.integers(0, 1 << 62))
            % base.product for _ in range(n)]
    return vals, base.decompose(vals)


def make_bases(n=64):
    q = rns.RnsBase(tuple(primes.gen_ntt_primes(50, 3, n)))
    p = rns.RnsBase(tuple(primes.gen_ntt_primes(60, 4, n)))
    return q, p


def test_compose_decompose_roundtrip():
    q, _ = make_bases()
    vals, res = rand_residues(q, 16)
    assert q.compose(res) == vals


def test_base_convert_floor():
    q, p = make_bases()
    conv = rns.BaseConverter(q, p)
    vals, res = rand_residues(q, 32)
    out = np.asarray(conv.convert(res))
    for j, d in enumerate(p.moduli):
        expect = np.array([v % d for v in vals], dtype=np.uint64)
        np.testing.assert_array_equal(out[j], expect)


def test_base_convert_centered():
    q, p = make_bases()
    conv = rns.BaseConverter(q, p)
    vals, res = rand_residues(q, 32)
    out = np.asarray(conv.convert(res, centered=True))
    for j, d in enumerate(p.moduli):
        expect = np.array(
            [(v if v < q.product // 2 else v - q.product) % d for v in vals],
            dtype=np.uint64)
        np.testing.assert_array_equal(out[j], expect)


def test_base_convert_small_values_exact():
    # tiny positive x (noise-like) must not trip the alpha correction, and
    # tiny negative centered values (x near Q) convert as the centered lift.
    q, p = make_bases()
    conv = rns.BaseConverter(q, p)
    pos = [0, 1, 2, 17, 3, 1 << 40]
    neg = [q.product - 1, q.product - 5]
    res = q.decompose(pos + neg)
    out = np.asarray(conv.convert(res))
    for j, d in enumerate(p.moduli):
        expect = [v % d for v in pos] + [(v - q.product) % d for v in neg]
        np.testing.assert_array_equal(
            out[j], np.array(expect, dtype=np.uint64))


@pytest.mark.parametrize("t", [2, 17, 65537, 1032193])
def test_decrypt_scaler(t):
    q, _ = make_bases()
    sc = rns.DecryptScaler(q, t)
    vals, res = rand_residues(q, 32)
    out, _ = sc.apply(res)
    expect = np.array(
        [((t * v * 2 + q.product) // (2 * q.product)) % t for v in vals],
        dtype=np.uint64)  # round(t*v/Q) mod t
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_scale_and_round_to_aux():
    qb, pb = make_bases()
    c = rns.RnsBase(qb.moduli + pb.moduli)
    sr = rns.ScaleAndRound(c, qb, pb, t=65537)
    vals, res = rand_residues(c, 32)
    out = np.asarray(sr.apply(res))
    Q = qb.product
    for j, d in enumerate(pb.moduli):
        expect = np.array(
            [((65537 * v * 2 + Q) // (2 * Q)) % d for v in vals],
            dtype=np.uint64)
        np.testing.assert_array_equal(out[j], expect)


def test_mod_down():
    qb, _ = make_bases()
    p = primes.gen_ntt_primes(61, 1, 64)[0]
    md = rns.ModDown(qb, p)
    full = rns.RnsBase(qb.moduli + (p,))
    vals, res = rand_residues(full, 32)
    out = np.asarray(md.apply(res[:qb.k], res[qb.k]))
    for i, q in enumerate(qb.moduli):
        expect = np.array(
            [((v + p // 2) // p) % q for v in vals], dtype=np.uint64)
        np.testing.assert_array_equal(out[i], expect)
