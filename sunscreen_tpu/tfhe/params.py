"""TFHE parameter definitions.

Replaces `sunscreen_tfhe/src/params.rs` (LweDef/GlweDef/
RadixDecomposition with `assert_valid`) and the test parameter sets in
`src/high_level.rs:9-57`. Torus modulus is 2^64 (same as the
reference's `Torus<u64>`).
"""

from __future__ import annotations

from dataclasses import dataclass

TORUS_BITS = 64


@dataclass(frozen=True)
class LweDef:
    """dim: length of the LWE mask a; std: noise standard deviation as a
    fraction of the torus."""

    dim: int
    std: float

    def assert_valid(self):
        assert self.dim > 0
        assert 0 <= self.std < 0.5


@dataclass(frozen=True)
class GlweDef:
    """size: number of mask polynomials k; poly_degree: N (power of 2)."""

    size: int
    poly_degree: int
    std: float

    def assert_valid(self):
        assert self.size > 0
        n = self.poly_degree
        assert n > 0 and n & (n - 1) == 0
        assert 0 <= self.std < 0.5

    @property
    def as_lwe(self) -> LweDef:
        """The LWE instance produced by sample extraction."""
        return LweDef(self.size * self.poly_degree, self.std)


@dataclass(frozen=True)
class RadixDecomposition:
    """count: number of digits l; radix_log: bits per digit (base 2^b)."""

    count: int
    radix_log: int

    def assert_valid(self):
        assert self.count > 0 and self.radix_log > 0
        assert self.count * self.radix_log <= TORUS_BITS


# Test parameters (reference: TEST_LWE_DEF_*/TEST_GLWE_DEF_* in
# high_level.rs — tiny N with tiny sigma for fast deterministic tests).
TEST_LWE_DEF_1 = LweDef(dim=512, std=1e-16)
TEST_GLWE_DEF_1 = GlweDef(size=1, poly_degree=256, std=1e-16)
TEST_GLWE_DEF_2 = GlweDef(size=2, poly_degree=256, std=1e-16)
TEST_RADIX = RadixDecomposition(count=3, radix_log=4)
TEST_RADIX_FINE = RadixDecomposition(count=8, radix_log=4)

# Production-flavored 128-bit parameters (TFHE-lib style shapes).
LWE_128 = LweDef(dim=722, std=2.0**-13.8)
GLWE_128 = GlweDef(size=1, poly_degree=2048, std=2.0**-52.0)
RADIX_128 = RadixDecomposition(count=2, radix_log=23)
