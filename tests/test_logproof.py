"""SDLP create/verify over small lattice relations (reference:
`logproof/src/linear_relation.rs` tests + `logproof/tests/seal.rs`)."""

import numpy as np
import pytest

from sunscreen_tpu.logproof import (LogProof, LogProofGenerators,
                                    ProverKnowledge, VerifierKnowledge,
                                    create, verify)
from sunscreen_tpu.logproof import inner_product as ip
from sunscreen_tpu.logproof.lattice import (poly_divmod, poly_mul,
                                            twos_complement_bits,
                                            twos_complement_coeffs)
from sunscreen_tpu.zk import curve25519 as cv
from sunscreen_tpu.zk.merlin import Transcript

RNG = np.random.default_rng(3)


def test_twos_complement_roundtrip():
    for v, bits in ((0, 3), (1, 2), (-1, 2), (3, 3), (-4, 3), (7, 4),
                    (-8, 4)):
        bs = twos_complement_bits(v, bits)
        ws = twos_complement_coeffs(bits)
        got = sum(b * (w if w < cv.L // 2 else w - cv.L)
                  for b, w in zip(bs, ws))
        assert got == v, (v, bits, bs)


def test_zk_inner_product_roundtrip():
    n = 8
    g = [cv.BASEPOINT * (i + 2) for i in range(n)]
    h = [cv.BASEPOINT * (i + 100) for i in range(n)]
    u = ip.get_u()
    v1 = [int(x) for x in RNG.integers(1, 1 << 30, n)]
    v2 = [int(x) for x in RNG.integers(1, 1 << 30, n)]
    rho = 777
    x = sum(a * b for a, b in zip(v1, v2)) % cv.L
    t = cv.msm(v1 + v2 + [rho], g + h + [u])
    proof = ip.create(Transcript(b"ipt"), v1, v2, rho, t, g, h, u)
    assert ip.verify(proof, Transcript(b"ipt"), t, x, g, h, u)
    assert not ip.verify(proof, Transcript(b"ipt"), t, (x + 1) % cv.L,
                         g, h, u)
    rt = ip.InnerProductProof.from_bytes(proof.to_bytes())
    assert ip.verify(rt, Transcript(b"ipt"), t, x, g, h, u)


def test_zk_inner_product_native_matches_python_bytes(monkeypatch):
    """The native ipp_prove loop must produce BYTE-IDENTICAL proofs to
    the pure-python prover under an injected deterministic rand_fn
    (the property `ip.create`'s docstring documents)."""
    from sunscreen_tpu.zk import native
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    n = 16
    g = [cv.BASEPOINT * (i + 2) for i in range(n)]
    h = [cv.BASEPOINT * (i + 100) for i in range(n)]
    u = ip.get_u()
    v1 = [int(x) for x in RNG.integers(1, 1 << 30, n)]
    v2 = [int(x) for x in RNG.integers(1, 1 << 30, n)]
    rho = 424242
    x = sum(a * b for a, b in zip(v1, v2)) % cv.L
    t = cv.msm(v1 + v2 + [rho], g + h + [u])

    def make_rand():
        state = [0]
        def rand():
            state[0] += 1
            return (state[0] * 0x9E3779B97F4A7C15 + 12345) % cv.L
        return rand

    native_proof = ip.create(Transcript(b"ipnat"), v1, v2, rho, t,
                             g, h, u, rand_fn=make_rand())
    monkeypatch.setattr(native, "get_lib", lambda: None)
    python_proof = ip.create(Transcript(b"ipnat"), v1, v2, rho, t,
                             g, h, u, rand_fn=make_rand())
    assert native_proof.to_bytes() == python_proof.to_bytes()
    assert ip.verify(native_proof, Transcript(b"ipnat"), t, x, g, h, u)


@pytest.mark.parametrize("n_real,coeff", [
    (8, False),    # odd lg: the deferred chain's final flush path
    (16, False),   # even lg
    (11, False),   # identity padding (11 -> 16)
    (16, True),    # virtual g' = coeff o g (the SDLP phi^-1 path)
    (11, True),    # padding + coefficients together
    (2, True),     # single round: depth-1 materialization with coefs
    (1, True),     # no rounds: coefficient-only materialization
])
def test_zk_ipp_deferred_chain_matches_python(monkeypatch, n_real,
                                              coeff):
    """The round-5 deferred-materialization prover (virtual generator
    chains, g_coeff absorption) stays byte-identical to the pure-python
    eager-fold prover across round parities, padding, and coefficient
    configurations — and its proofs verify."""
    from sunscreen_tpu.zk import native
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    g = [cv.BASEPOINT * (i + 2) for i in range(n_real)]
    h = [cv.BASEPOINT * (i + 100) for i in range(n_real)]
    u = ip.get_u()
    v1 = [int(x) for x in RNG.integers(1, 1 << 30, n_real)]
    v2 = [int(x) for x in RNG.integers(1, 1 << 30, n_real)]
    g_coeff = ([(int(x) * 0x9E3779B97F4A7C15E3779B9 + 1) % cv.L
                for x in RNG.integers(1, 1 << 60, n_real)]
               if coeff else None)
    geff = ([gi * c for gi, c in zip(g, g_coeff)] if coeff
            else list(g))
    rho = 99
    x = sum(a * b for a, b in zip(v1, v2)) % cv.L
    t = cv.msm(v1 + v2 + [rho], geff + h + [u])

    def make_rand():
        state = [0]

        def rand():
            state[0] += 1
            return (state[0] * 0x9E3779B97F4A7C15 + 777) % cv.L
        return rand

    native_proof = ip.create(Transcript(b"ipd"), v1, v2, rho, t,
                             g, h, u, rand_fn=make_rand(),
                             g_coeff=g_coeff)
    assert ip.verify(native_proof, Transcript(b"ipd"), t, x, g, h, u,
                     g_coeff=g_coeff)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    python_proof = ip.create(Transcript(b"ipd"), v1, v2, rho, t,
                             g, h, u, rand_fn=make_rand(),
                             g_coeff=g_coeff)
    assert native_proof.to_bytes() == python_proof.to_bytes()


def make_relation(q=12289, d=4, bound_bits=2):
    """1x1 relation: a * s = t in Z_q[X]/(X^d+1)."""
    f = [1] + [0] * (d - 1) + [1]
    a = [int(x) for x in RNG.integers(0, q, d)]
    s = [int(x) for x in RNG.integers(0, (1 << bound_bits) - 1, d)]
    t_full = poly_mul(a, s, q)
    _, t_red = poly_divmod(t_full, f, q)
    t_red = t_red + [0] * (d - len(t_red))
    vk = VerifierKnowledge(
        a=[[a]], t=[[t_red]],
        bounds=[[[bound_bits] * d]], f=f, q=q)
    return vk, [[s]]


def test_sdlp_roundtrip():
    vk, s = make_relation()
    pk = ProverKnowledge(vk, s)
    gens = LogProofGenerators(vk.l)
    u = ip.get_u()
    proof = create(Transcript(b"sdlp"), pk, gens.g, gens.h, u)
    assert verify(proof, Transcript(b"sdlp"), vk, gens.g, gens.h, u)
    # tampered statement rejected
    vk2, _ = make_relation()
    assert not verify(proof, Transcript(b"sdlp"), vk2, gens.g, gens.h, u)
    # serialization roundtrip
    rt = LogProof.from_bytes(proof.to_bytes())
    assert verify(rt, Transcript(b"sdlp"), vk, gens.g, gens.h, u)


def test_sdlp_rejects_out_of_bound_witness():
    vk, s = make_relation(bound_bits=2)
    s[0][0][0] = 9  # exceeds 2^2
    # recompute t so the relation holds but the bound doesn't
    from sunscreen_tpu.logproof.lattice import poly_divmod as pd
    t_full = poly_mul(vk.a[0][0], s[0][0], vk.q)
    _, t_red = pd(t_full, vk.f, vk.q)
    vk.t[0][0] = t_red + [0] * (vk.d - len(t_red))
    pk = ProverKnowledge(vk, s)
    gens = LogProofGenerators(vk.l)
    u = ip.get_u()
    with pytest.raises(AssertionError):
        create(Transcript(b"sdlp"), pk, gens.g, gens.h, u)


def test_sdlp_matrix_relation():
    # 2x2 A, 2x1 S: a real system of ring equations
    q, d = 40961, 4
    f = [1] + [0] * (d - 1) + [1]
    A = [[[int(x) for x in RNG.integers(0, q, d)] for _ in range(2)]
         for _ in range(2)]
    S = [[[int(x) for x in RNG.integers(0, 3, d)]] for _ in range(2)]
    T = []
    for i in range(2):
        acc = []
        from sunscreen_tpu.logproof.lattice import poly_add
        for r in range(2):
            acc = poly_add(acc, poly_mul(A[i][r], S[r][0], q), q)
        _, red = poly_divmod(acc, f, q)
        T.append([red + [0] * (d - len(red))])
    bounds = [[[2] * d] for _ in range(2)]
    vk = VerifierKnowledge(A, T, bounds, f, q)
    pk = ProverKnowledge(vk, S)
    gens = LogProofGenerators(vk.l)
    u = ip.get_u()
    proof = create(Transcript(b"sdlp-mat"), pk, gens.g, gens.h, u)
    assert verify(proof, Transcript(b"sdlp-mat"), vk, gens.g, gens.h, u)


def test_sdlp_shared_commitment():
    vk, s = make_relation()
    pk = ProverKnowledge(vk, s)
    gens = LogProofGenerators(vk.l)
    u = ip.get_u()
    proof = create(Transcript(b"sdlp-sh"), pk, gens.g, gens.h, u,
                   half_rho=12345, shared_indices=[(0, 0)])
    assert verify(proof, Transcript(b"sdlp-sh"), vk, gens.g, gens.h, u)
    # the shared commitment is exactly <s_1[range], h[range]> + rho/2 * u
    from sunscreen_tpu.logproof.linear_relation import _binary_expand
    s_1 = _binary_expand(vk, s)
    lo, hi = vk.b_slices()[0][0]
    expect = cv.msm([b for b in s_1[lo:hi]] + [12345],
                    gens.h[lo:hi] + [u])
    assert proof.w_shared == expect


def test_native_scalar_arithmetic_edges():
    """The native Montgomery mod-L helpers against python-int oracles
    at edge values (new round-4 C++: fork challenges draw through
    sc_from_wide; ipp_s chains sc_montmul; sc_vec_mul is the exposed
    batched multiply)."""
    import secrets

    from sunscreen_tpu.zk import curve25519 as cv
    from sunscreen_tpu.zk import native
    if native.get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")
    L = cv.L
    edges = [0, 1, 2, L - 1, L - 2, (L - 1) // 2, 1 << 252,
             secrets.randbelow(L), secrets.randbelow(L)]
    a = edges
    b = list(reversed(edges))
    got = native.sc_vec_mul(a, b)
    want = [(x * y) % L for x, y in zip(a, b)]
    assert got == want
    # s-vector with edge challenges incl. 1 and L-1
    cs = [1, L - 1, secrets.randbelow(L)]
    n = 8
    want_s = []
    for i in range(n):
        acc = 1
        for j in range(3):
            if (i >> j) & 1:
                acc = acc * cs[3 - 1 - j] % L
        want_s.append(acc)
    assert native.ipp_s_vector(cs, n) == want_s
    # fork challenges at counts that exercise the 128-batch remainders
    from sunscreen_tpu.logproof import linear_relation as lr
    from sunscreen_tpu.zk.merlin import Transcript
    for count in (0, 1, 127, 128, 129, 300):
        t_nv = Transcript(b"edge"); t_nv.append_u64(b"c", count)
        t_py = Transcript(b"edge"); t_py.append_u64(b"c", count)
        got = native.fork_challenges(t_nv.strobe, b"x", count)
        # python reference path
        lib = native._LIB
        native._LIB = None
        try:
            want = lr._challenge_scalars(t_py, b"x", count)
        finally:
            native._LIB = lib
        assert got == want, count
        assert bytes(t_nv.strobe.state) == bytes(t_py.strobe.state)
