"""CRT-NTT polynomial products (logproof/fastpoly.py) vs the
schoolbook python-int oracle."""

import random

from sunscreen_tpu.logproof import lattice
from sunscreen_tpu.logproof.fastpoly import mat_mul_poly_fast


def _schoolbook(a, s, q):
    n, m = len(a), len(a[0])
    k = len(s[0])
    out = [[[] for _ in range(k)] for _ in range(n)]
    for i in range(n):
        for j in range(k):
            acc = []
            for r in range(m):
                acc = lattice.poly_add(
                    acc, _mul_dense(a[i][r], s[r][j], q), q)
            out[i][j] = acc
    return out


def _mul_dense(a, b, q):
    if not a or not b:
        return []
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            out[i + j] += x * y
    return [c % q for c in out] if q else out


def _pad(p, n):
    return p + [0] * (n - len(p))


def test_mod_q_product_matches_schoolbook():
    rng = random.Random(1)
    q = (1 << 100) + 277  # >30-bit composite-style modulus
    d = 64
    a = [[[rng.randrange(q) for _ in range(d)] for _ in range(3)]
         for _ in range(2)]
    s = [[[rng.randrange(q) for _ in range(d)]] for _ in range(3)]
    exp = _schoolbook(a, s, q)
    got = mat_mul_poly_fast(a, s, q, bound=3 * d * (q - 1) ** 2)
    for i in range(2):
        want = _pad(exp[i][0], 2 * d - 1)
        assert [c % q for c in got[i][0]] == want


def test_signed_integer_product():
    rng = random.Random(2)
    bnd = 1 << 40
    d = 50
    a = [[[rng.randrange(-bnd, bnd) for _ in range(d)]]]
    s = [[[rng.randrange(-bnd, bnd) for _ in range(d)]]]
    exp = _mul_dense(a[0][0], s[0][0], None)
    got = mat_mul_poly_fast(a, s, None, bound=d * bnd * bnd)
    assert got[0][0][:len(exp)] == exp
    assert all(c == 0 for c in got[0][0][len(exp):])


def test_dispatcher_routes_large_products():
    rng = random.Random(3)
    q = (1 << 60) - 93
    d = 1500  # above the schoolbook work threshold for 1x1
    a = [[[rng.randrange(q) for _ in range(d)]]]
    s = [[[rng.randrange(q) for _ in range(d)]]]
    got = lattice.mat_mul_poly(a, s, q)
    # spot-check a few coefficients vs direct convolution
    for idx in (0, 1, d - 1, 2 * d - 2):
        lo = max(0, idx - d + 1)
        want = sum(a[0][0][i] * s[0][0][idx - i]
                   for i in range(lo, min(d, idx + 1))) % q
        assert got[0][0][idx] == want


def test_sparse_divmod_matches_dense():
    rng = random.Random(4)
    q = 12289
    d = 32
    f = [1] + [0] * (d - 1) + [1]  # X^d + 1
    a = [rng.randrange(q) for _ in range(3 * d)]
    quo, rem = lattice.poly_divmod(a, f, q)
    # verify a == quo*f + rem (mod q)
    recon = lattice.poly_add(lattice.poly_mul(quo, f, q), rem, q)
    assert [c % q for c in a] == _pad(recon, len(a))[:len(a)]
    assert len(rem) <= d
