"""ristretto255 vs RFC 9496 test vectors + group-law invariants.

(The reference consumes this group through its curve25519-dalek fork;
these vectors pin byte compatibility of encodings.)
"""

import hashlib

import pytest

from sunscreen_tpu.zk import curve25519 as c

# RFC 9496 appendix A.1: encodings of B*0 .. B*15
SMALL_MULTIPLES = [
    "0000000000000000000000000000000000000000000000000000000000000000",
    "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76",
    "6a493210f7499cd17fecb510ae0cea23a110e8d5b901f8acadd3095c73a3b919",
    "94741f5d5d52755ece4f23f044ee27d5d1ea1e2bd196b462166b16152a9d0259",
    "da80862773358b466ffadfe0b3293ab3d9fd53c5ea6c955358f568322daf6a57",
    "e882b131016b52c1d3337080187cf768423efccbb517bb495ab812c4160ff44e",
    "f64746d3c92b13050ed8d80236a7f0007c3b3f962f5ba793d19a601ebb1df403",
    "44f53520926ec81fbd5a387845beb7df85a96a24ece18738bdcfa6a7822a176d",
    "903293d8f2287ebe10e2374dc1a53e0bc887e592699f02d077d5263cdd55601c",
    "02622ace8f7303a31cafc63f8fc48fdc16e1c8c8d234b2f0d6685282a9076031",
    "20706fd788b2720a1ed2a5dad4952b01f413bcf0e7564de8cdc816689e2db95f",
    "bce83f8ba5dd2fa572864c24ba1810f9522bc6004afe95877ac73241cafdab42",
    "e4549ee16b9aa03099ca208c67adafcafa4c3f3e4e5303de6026e3ca8ff84460",
    "aa52e000df2e16f55fb1032fc33bc42742dad6bd5a8fc0be0167436c5948501f",
    "46376b80f409b29dc2b5f6f0c52591990896e5716f41477cd30085ab7f10301e",
    "e0c418f7c8d9c4cdd7395b93ea124f3ad99021bb681dfc3302a9d99a2e53e64e",
]


def test_small_multiples_of_basepoint():
    acc = c.IDENTITY
    for i, expect in enumerate(SMALL_MULTIPLES):
        assert acc.encode().hex() == expect, i
        acc = acc + c.BASEPOINT


def test_scalar_mul_matches_addition_chain():
    for k in (0, 1, 2, 7, 15):
        assert (c.BASEPOINT * k).encode().hex() == SMALL_MULTIPLES[k]


def test_decode_encode_roundtrip():
    for h in SMALL_MULTIPLES:
        pt = c.decode(bytes.fromhex(h))
        assert pt.encode().hex() == h


def test_decode_rejects_noncanonical():
    with pytest.raises(c.DecodeError):
        c.decode(bytes.fromhex(
            "01" + "00" * 31))  # s odd ("negative")
    with pytest.raises(c.DecodeError):
        c.decode(b"\xff" * 32)  # >= p


def test_group_laws():
    a = c.BASEPOINT * 123456789
    b = c.BASEPOINT * 987654321
    assert a + b == b + a
    assert (a + b) + a == a + (b + a)
    assert a - a == c.IDENTITY
    assert a + c.IDENTITY == a
    assert a.double() == a + a
    assert c.BASEPOINT * c.L == c.IDENTITY


def test_scalar_field():
    s = 0xdeadbeef
    assert c.scalar_inv(s) * s % c.L == 1
    wide = hashlib.sha512(b"test").digest()
    assert 0 <= c.scalar_from_bytes_wide(wide) < c.L


def test_from_uniform_bytes_valid_points():
    for seed in (b"a", b"b", b"xyz"):
        raw = hashlib.sha512(seed).digest()
        pt = c.from_uniform_bytes(raw)
        # must be a canonical, decodable group element
        assert c.decode(pt.encode()) == pt
        # deterministic
        assert c.from_uniform_bytes(raw).encode() == pt.encode()


def test_msm_matches_naive():
    pts = [c.BASEPOINT * k for k in (2, 3, 5, 7)]
    scalars = [11, 13, 17, 19]
    expect = c.BASEPOINT * sum(a * b for a, b in
                               zip(scalars, (2, 3, 5, 7)))
    assert c.msm(scalars, pts) == expect
