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


def test_tfhe_production_presets_meet_named_levels():
    """The TFHE production presets carry the reference's published std
    constants (params.rs:220-285); our estimator must rate each within
    0.2 bits of its named level (the reference's own params.rs test
    asserts the same levels, incl. GLWE_5_256_128 at 129)."""
    from sunscreen_tpu.tfhe import params as tp
    cases = [(tp.LWE_512_128, 128), (tp.GLWE_1_512_128, 128),
             (tp.GLWE_5_256_128, 129), (tp.GLWE_1_1024_128, 128),
             (tp.GLWE_1_2048_128, 128), (tp.LWE_512_80, 80),
             (tp.GLWE_5_256_80, 80), (tp.GLWE_1_1024_80, 80)]
    for preset, level in cases:
        got = preset.security_level()
        assert abs(got - level) <= 0.2, (preset, level, got)
    # more noise at fixed dimension => more security (sanity on the fit)
    from sunscreen_tpu.tfhe.params import LweDef
    lo = LweDef(dim=512, std=tp.LWE_512_80.std).security_level()
    hi = LweDef(dim=512, std=tp.LWE_512_80.std * 10).security_level()
    assert hi > lo


def test_tfhe_security_level_errors_off_fit_region():
    """Presets outside the estimator's fitted polytope must raise, not
    extrapolate (the old LWE_128 dim=722/std=2^-13.8 preset did exactly
    this and was replaced in round 5)."""
    from sunscreen_tpu.tfhe.params import LweDef
    with pytest.raises(OutsideConstraintsError):
        LweDef(dim=722, std=2.0**-13.8).security_level()
