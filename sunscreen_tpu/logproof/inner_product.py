"""Zero-knowledge inner product proof (SDLP variant).

Replaces `logproof/src/inner_product.rs`: proves knowledge of v_1, v_2
with <v_1, v_2> = x (public) against commitment
t = <v_1, g> + <v_2, h> + rho*u, via log-rounds of folding with t_1 /
t_-1 cross terms, finished with a Schnorr-style ZK opening (w, w',
z_1, z_2, tau) — unlike the plain Bulletproofs IPP, this variant is
itself zero-knowledge.
"""

from __future__ import annotations

import hashlib
import secrets
from dataclasses import dataclass

from sunscreen_tpu.zk import curve25519 as cv
from sunscreen_tpu.zk.merlin import Transcript

L = cv.L


def get_u() -> cv.Point:
    """Blinding generator (reference: VerifierKnowledge::get_u)."""
    shake = hashlib.shake_256()
    shake.update(b"u")
    return cv.from_uniform_bytes(shake.digest(64))


def _rand() -> int:
    return secrets.randbelow(L)


@dataclass
class InnerProductProof:
    t_1: list[cv.Point]
    t_minus1: list[cv.Point]
    w: cv.Point
    w_prime: cv.Point
    z_1: int
    z_2: int
    tau: int

    def to_bytes(self) -> bytes:
        out = len(self.t_1).to_bytes(4, "little")
        for a, b in zip(self.t_1, self.t_minus1):
            out += a.encode() + b.encode()
        out += self.w.encode() + self.w_prime.encode()
        out += cv.scalar_to_bytes(self.z_1)
        out += cv.scalar_to_bytes(self.z_2)
        out += cv.scalar_to_bytes(self.tau)
        return out

    @staticmethod
    def from_bytes(data: bytes) -> "InnerProductProof":
        """Raises `cv.DecodeError` on truncated input, absurd round
        counts, or non-canonical point/scalar encodings."""
        if len(data) < 4:
            raise cv.DecodeError("truncated inner-product proof")
        lg = int.from_bytes(data[:4], "little")
        if lg > 64:  # 2^64 elements is unrepresentable — reject early
            raise cv.DecodeError("implausible round count")
        need = 4 + 64 * lg + 64 + 96
        if len(data) != need:
            raise cv.DecodeError("inner-product proof length mismatch")
        off = 4
        t1, tm1 = [], []
        for _ in range(lg):
            t1.append(cv.decode(data[off:off + 32]))
            tm1.append(cv.decode(data[off + 32:off + 64]))
            off += 64
        w = cv.decode(data[off:off + 32])
        wp = cv.decode(data[off + 32:off + 64])
        off += 64
        z1, z2, tau = (
            cv.scalar_from_canonical_bytes(data[off + 32 * i:
                                                off + 32 * (i + 1)])
            for i in range(3))
        return InnerProductProof(t1, tm1, w, wp, z1, z2, tau)


def _domain_sep(t: Transcript, tv: cv.Point, x: int):
    t.append_message(b"dom-sep", b"ipp v1")
    t.append_message(b"t", tv.encode())
    t.append_scalar(b"x", x)


def _pad_pow2(v, fill):
    n = len(v)
    target = 1 << max(0, (n - 1).bit_length())
    return list(v) + [fill] * (target - n)


def create(transcript: Transcript, v_1, v_2, rho: int, t_commit: cv.Point,
           g, h, u: cv.Point) -> InnerProductProof:
    assert len(v_1) == len(v_2) == len(g) == len(h)
    x = sum(a * b for a, b in zip(v_1, v_2)) % L
    v_1 = _pad_pow2([a % L for a in v_1], 0)
    v_2 = _pad_pow2([a % L for a in v_2], 0)
    g = _pad_pow2(list(g), cv.IDENTITY)
    h = _pad_pow2(list(h), cv.IDENTITY)

    _domain_sep(transcript, t_commit, x)
    a_pt = transcript.challenge_bytes(b"a", 64)
    a_pt = cv.from_uniform_bytes(a_pt)
    t = t_commit + a_pt * x

    t1_vec: list[cv.Point] = []
    tm1_vec: list[cv.Point] = []
    while len(v_1) > 1:
        n2 = len(v_1) // 2
        v1t, v1b = v_1[:n2], v_1[n2:]
        v2t, v2b = v_2[:n2], v_2[n2:]
        gt, gb = g[:n2], g[n2:]
        ht, hb = h[:n2], h[n2:]
        sigma = _rand()
        sigma_m1 = _rand()
        x_m1 = sum(a * b for a, b in zip(v1b, v2t)) % L
        x_p1 = sum(a * b for a, b in zip(v1t, v2b)) % L
        t_m1 = cv.msm(v1b + v2t + [x_m1, sigma_m1], gt + hb + [a_pt, u])
        t_p1 = cv.msm(v1t + v2b + [x_p1, sigma], gb + ht + [a_pt, u])
        transcript.append_point(b"t-1", t_m1)
        transcript.append_point(b"t1", t_p1)
        c = transcript.challenge_scalar(b"c")
        c_inv = cv.scalar_inv(c)
        g = cv.fold_points(gt, gb, c)
        h = cv.fold_points(ht, hb, c_inv)
        t = t_m1 * c_inv + t + t_p1 * c
        v_1 = [(v1t[i] + v1b[i] * c_inv) % L for i in range(n2)]
        v_2 = [(v2t[i] + v2b[i] * c) % L for i in range(n2)]
        t1_vec.append(t_p1)
        tm1_vec.append(t_m1)
        rho = (c_inv * sigma_m1 + rho + c * sigma) % L

    y_1, y_2 = _rand(), _rand()
    sig, sig_p = _rand(), _rand()
    w = g[0] * y_1 + h[0] * y_2 \
        + a_pt * ((y_1 * v_2[0] + y_2 * v_1[0]) % L) + u * sig
    w_prime = a_pt * (y_1 * y_2 % L) + u * sig_p
    transcript.append_point(b"w", w)
    transcript.append_point(b"w'", w_prime)
    c = transcript.challenge_scalar(b"c")
    z_1 = (y_1 + c * v_1[0]) % L
    z_2 = (y_2 + c * v_2[0]) % L
    tau = (c * rho + sig + cv.scalar_inv(c) * sig_p) % L
    return InnerProductProof(t1_vec, tm1_vec, w, w_prime, z_1, z_2, tau)


def verify(proof: InnerProductProof, transcript: Transcript,
           t_commit: cv.Point, x: int, g, h, u: cv.Point) -> bool:
    g = _pad_pow2(list(g), cv.IDENTITY)
    h = _pad_pow2(list(h), cv.IDENTITY)
    n = len(g)
    if len(proof.t_1) != len(proof.t_minus1):
        return False
    if (1 << len(proof.t_1)) != n:
        return False

    _domain_sep(transcript, t_commit, x)
    a_pt = cv.from_uniform_bytes(transcript.challenge_bytes(b"a", 64))
    t = t_commit + a_pt * x

    cs = []
    for t_p1, t_m1 in zip(proof.t_1, proof.t_minus1):
        transcript.append_point(b"t-1", t_m1)
        transcript.append_point(b"t1", t_p1)
        cs.append(transcript.challenge_scalar(b"c"))
    lg = len(cs)
    for t_p1, t_m1, c in zip(proof.t_1, proof.t_minus1, cs):
        t = t_m1 * cv.scalar_inv(c) + t + t_p1 * c
    # folded generators via the s-exponent optimization
    s = []
    for i in range(n):
        acc = 1
        for j in range(lg):
            if (i >> j) & 1:
                acc = acc * cs[lg - 1 - j] % L
        s.append(acc)
    g_fold = cv.msm(s, g)
    h_fold = cv.msm(cv.batch_scalar_inv(s), h)

    transcript.append_point(b"w", proof.w)
    transcript.append_point(b"w'", proof.w_prime)
    c = transcript.challenge_scalar(b"c")
    c_inv = cv.scalar_inv(c)
    lhs = t * c + proof.w + proof.w_prime * c_inv
    rhs = g_fold * proof.z_1 + h_fold * proof.z_2 \
        + a_pt * (c_inv * proof.z_1 % L * proof.z_2 % L) \
        + u * proof.tau
    return lhs == rhs
