"""LWE/RLWE security estimation (reference:
`sunscreen_math/src/security.rs` — polynomial fit + polytope validity +
round-trip tests)."""

import math

import pytest

from sunscreen_tpu.math.security import (
    OutsideConstraintsError, lwe_security_level_to_std,
    lwe_std_to_security_level, probability_away_from_mean_gaussian,
    probe_security, rlwe_security_level_to_std,
    rlwe_std_to_security_level)


def test_lwe_security_to_std_and_back():
    """Mirrors the reference's `lwe_security_to_std_and_back`
    (security.rs tests): fit self-consistency within 0.05 bits over a
    grid of the validity region."""
    for dimension in range(368, 2049, 56):
        for level in range(80, 129, 8):
            try:
                std = lwe_security_level_to_std(dimension, level)
            except OutsideConstraintsError:
                continue
            try:
                back = lwe_std_to_security_level(dimension, std)
            except OutsideConstraintsError:
                continue
            assert abs(back - level) < 0.05, (dimension, level, back)


def test_lwe_fit_rejects_out_of_domain():
    with pytest.raises(OutsideConstraintsError):
        lwe_security_level_to_std(100, 128)       # dimension too small
    with pytest.raises(OutsideConstraintsError):
        lwe_security_level_to_std(4096, 128)      # dimension too large
    with pytest.raises(OutsideConstraintsError):
        lwe_security_level_to_std(1024, 200)      # level above fit
    with pytest.raises(OutsideConstraintsError):
        lwe_std_to_security_level(1024, 2.0**-64)  # below min std bound


def test_lwe_more_noise_more_security():
    # dim-1024 fit domain: log10(std) in ~[-12.3, -7.24]
    a = lwe_std_to_security_level(1024, 2.0**-35)
    b = lwe_std_to_security_level(1024, 2.0**-30)
    assert b > a


def test_gaussian_tail():
    # 1 sigma ~ 31.73% two-tailed
    p = 10.0 ** probability_away_from_mean_gaussian(1.0, 1.0)
    assert abs(p - 0.3173) < 1e-3
    # continuity across the exact/approx boundary at ratio 7
    lo = probability_away_from_mean_gaussian(6.999, 1.0)
    hi = probability_away_from_mean_gaussian(7.001, 1.0)
    assert abs(lo - hi) < 0.01
    # far tail is tiny but finite
    assert probability_away_from_mean_gaussian(20.0, 1.0) < -80


def test_rlwe_std_level_roundtrip():
    for n in (1024, 2048, 4096, 8192):
        for level in (128, 192, 256):
            std = rlwe_security_level_to_std(n, 2.0**64, level)
            assert std > 0
            back = rlwe_std_to_security_level(n, 2.0**64, std)
            assert abs(back - level) / level < 0.05, (n, level, back)


def test_rlwe_rejects_out_of_domain():
    with pytest.raises(OutsideConstraintsError):
        rlwe_security_level_to_std(1000, 2.0**64, 128)
    with pytest.raises(OutsideConstraintsError):
        rlwe_security_level_to_std(4096, 2.0**64, 500)


def test_rlwe_more_noise_more_security():
    base = rlwe_std_to_security_level(4096, 2.0**64, 2.0**20)
    more = rlwe_std_to_security_level(4096, 2.0**64, 2.0**30)
    assert more > base


def test_probe_security_matches_table():
    assert probe_security(8192, 218, 128)
    assert not probe_security(8192, 219, 128)
    assert not probe_security(1000, 10, 128)  # unknown degree
