"""LWE security estimation (reference: `sunscreen_math/src/security.rs`
tests — std/level round trips)."""

from sunscreen_tpu.math.security import (lwe_security_level_to_std,
                                         lwe_std_to_security_level,
                                         probe_security)


def test_std_level_roundtrip():
    for n in (1024, 2048, 4096, 8192):
        for level in (128, 192, 256):
            std = lwe_security_level_to_std(n, 2.0**64, level)
            assert std > 0
            back = lwe_std_to_security_level(n, 2.0**64, std)
            assert abs(back - level) / level < 0.05, (n, level, back)


def test_more_noise_more_security():
    base = lwe_std_to_security_level(4096, 2.0**64, 2.0**20)
    more = lwe_std_to_security_level(4096, 2.0**64, 2.0**30)
    assert more > base


def test_probe_security_matches_table():
    assert probe_security(8192, 218, 128)
    assert not probe_security(8192, 219, 128)
    assert not probe_security(1000, 10, 128)  # unknown degree
