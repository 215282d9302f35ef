"""LWE security estimation.

Replaces `sunscreen_math/src/security.rs:65-244`
(`lwe_security_level_to_std`, `lwe_std_to_security_level` — the
reference fits a 2-D polynomial to lattice-estimator data). Here we use
the homomorphicencryption.org HE-Standard tables for ternary/binary
secrets, which the same estimator underlies: the admissible
log2(q/sigma_min) budget scales linearly in n per security level.

The per-level slopes are the HE-Standard table ratios (max log2 Q at
sigma = 3.19 for dimension n): lambda=128 -> ~0.0266*n, 192 ->
~0.0186*n, 256 -> ~0.0145*n.
"""

from __future__ import annotations

import math

# log2(q_max)/n at sigma=3.19, from the HE-Standard tables
_SLOPE = {128: 218 / 8192, 192: 152 / 8192, 256: 118 / 8192}
_SIGMA_REF = 3.19
_Q_REF_OFFSET = math.log2(_SIGMA_REF)


def lwe_security_level_to_std(dimension: int, modulus: float,
                              security_level: float = 128.0) -> float:
    """Minimum noise std-dev (absolute, not torus-relative) for an LWE
    instance of the given dimension/modulus to reach `security_level`
    bits (binary/ternary secret)."""
    slope = _interp_slope(security_level)
    # require log2(q / sigma) <= slope * n + log2(sigma_ref)
    max_log_ratio = slope * dimension + _Q_REF_OFFSET
    sigma = modulus / 2.0 ** max_log_ratio
    return max(sigma, 0.0)


def lwe_std_to_security_level(dimension: int, modulus: float,
                              std: float) -> float:
    """Approximate security level in bits for the given noise level."""
    if std <= 0:
        return 0.0
    log_ratio = math.log2(modulus / std) - _Q_REF_OFFSET
    # invert lambda -> slope interpolation
    lo, hi = 1.0, 1024.0
    for _ in range(60):
        mid = (lo + hi) / 2
        if _interp_slope(mid) * dimension >= log_ratio:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def _interp_slope(security_level: float) -> float:
    """Slope of max log2(q/sigma) per dimension at a security level —
    log-linear interpolation between table anchors."""
    pts = sorted(_SLOPE.items())
    if security_level <= pts[0][0]:
        # extrapolate: slope ~ c / lambda
        return pts[0][1] * pts[0][0] / max(security_level, 1.0)
    if security_level >= pts[-1][0]:
        return pts[-1][1] * pts[-1][0] / security_level
    for (l0, s0), (l1, s1) in zip(pts, pts[1:]):
        if l0 <= security_level <= l1:
            f = (security_level - l0) / (l1 - l0)
            return s0 + f * (s1 - s0)
    raise AssertionError


def probe_security(poly_degree: int, total_modulus_bits: int,
                   security_level: int) -> bool:
    """True if an RLWE instance with the given ring degree and total
    modulus bits meets the level (used by BfvParams validation)."""
    from sunscreen_tpu.bfv.params import MAX_LOG_Q
    limit = MAX_LOG_Q.get(security_level, {}).get(poly_degree)
    return limit is not None and total_modulus_bits <= limit
