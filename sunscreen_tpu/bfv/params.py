"""BFV encryption parameters + standard security tables.

Replaces `seal_fhe/src/encryption_parameters.rs` (BfvEncryptionParameters
Builder), `seal_fhe/src/modulus.rs:18-250` (CoefficientModulus::bfv_default,
PlainModulus::batching) and the security-level plumbing in
`sunscreen_runtime/src/metadata.rs:72` (`Params`).

The max-log(Q) table is the homomorphicencryption.org HE-Standard table
for ternary secrets (classical security) — the same table SEAL's
`seal::util::global_variables` defaults conform to.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from sunscreen_tpu.math import primes

# HE-Standard: max log2(q*p) for (security, N), ternary secret, classical.
MAX_LOG_Q = {
    128: {1024: 27, 2048: 54, 4096: 109, 8192: 218, 16384: 438, 32768: 881},
    192: {1024: 19, 2048: 37, 4096: 75, 8192: 152, 16384: 305, 32768: 611},
    256: {1024: 14, 2048: 29, 4096: 58, 8192: 118, 16384: 237, 32768: 476},
}

# SEAL allows limbs up to 60 bits; we cap at 56 so every modulus (incl.
# the special keyswitch prime and the HPS aux base) satisfies the MXU
# matmul-NTT precondition n1*q^2 < q*2^64 (math/mntt.py). The 4 lost
# bits of p_sp cost ~4 bits of keyswitch-noise headroom — far below the
# multiply noise floor — and give Q 4 more budget bits.
SEALISH_MAX_LIMB_BITS = 56

# u32 engine: every modulus < 2^30 -> uint32 ciphertext storage and
# native 32-bit modular arithmetic on TPU (math/modular.py u32 section;
# measured round-3 lever per benchmarks/PERF_NOTES.md). More, smaller
# limbs than the u64 engine at the same total log(Q*P).
U32_MAX_LIMB_BITS = 30


def default_moduli_u32(poly_degree: int, security: int = 128
                       ) -> tuple[tuple[int, ...], int]:
    """u32-engine analogue of `default_moduli`: 30-bit-capped ciphertext
    primes + one 30-bit-capped special keyswitch prime inside the
    HE-standard budget."""
    total = MAX_LOG_Q[security][poly_degree]
    special_bits = min(U32_MAX_LIMB_BITS, max(total // 3, 2))
    rem = total - special_bits
    count = max(1, math.ceil(rem / U32_MAX_LIMB_BITS))
    base = rem // count
    sizes = [base + (1 if i < rem - base * count else 0)
             for i in range(count)]
    special = primes.gen_ntt_primes(special_bits, 1, poly_degree)[0]
    qs: list[int] = []
    for b in sorted(set(sizes)):
        need = sizes.count(b)
        qs += primes.gen_ntt_primes(b, need, poly_degree,
                                    skip=tuple([special] + qs))
    assert len(qs) == count
    return tuple(sorted(qs)), special


def batching_plain_modulus(poly_degree: int, bits: int) -> int:
    """Smallest-count prime of `bits` bits with p = 1 mod 2N (enables SIMD
    batching). Mirrors SEAL `PlainModulus::batching`."""
    return primes.gen_ntt_primes(bits, 1, poly_degree)[0]


def coefficient_modulus_create(poly_degree: int,
                               bit_sizes: list[int]) -> tuple[int, ...]:
    """SEAL `CoeffModulus::Create` semantics: for each distinct bit
    size, generate as many NTT-friendly primes as requested (descending
    from the top of the range), then assign them to the requested
    positions smallest-first within each size group. Pinned against the
    reference's published output vector in tests/test_reference_anchors
    (`seal_fhe/src/modulus.rs` `can_create_custom_coefficient_modulus`).
    """
    by_size: dict[int, list[int]] = {}
    for b in set(bit_sizes):
        by_size[b] = primes.gen_ntt_primes(b, bit_sizes.count(b),
                                           poly_degree)
    return tuple(by_size[b].pop() for b in bit_sizes)


# SEAL's hardcoded BFVDefault 128-bit modulus chains (seal::util::
# global_variables defaults — published constants; the reference
# re-exports them as `logproof/src/rings.rs` SealQ128_{1024..8192} and
# via `seal_fhe/src/modulus.rs` CoefficientModulus::bfv_default).
# Carried so users can run our engine on SEAL's exact chains; anchor
# properties (primality, 2N-congruence, HE-standard budget) pinned in
# tests/test_reference_anchors.py.
SEAL_BFV_DEFAULT_128 = {
    1024: (0x7e00001,),
    2048: (0x3fffffff000001,),
    4096: (0xffffee001, 0xffffc4001, 0x1ffffe0001),
    8192: (0x7fffffd8001, 0x7fffffc8001, 0xfffffffc001,
           0xffffff6c001, 0xfffffebc001),
}
# bfv_default single-prime chains at N=1024 for the higher security
# tiers (seal_fhe modulus.rs test `can_create_default_coefficient_
# modulus`): TC192 -> 520193, TC256 -> 12289. These two DO coincide
# with descending-from-top get_primes output, so they pin
# `gen_ntt_primes` directly.
SEAL_BFV_DEFAULT_1024 = {128: (0x7e00001,), 192: (520193,),
                         256: (12289,)}


def default_moduli(poly_degree: int, security: int = 128
                   ) -> tuple[tuple[int, ...], int]:
    """(ciphertext coeff moduli, special keyswitch prime) within the
    HE-standard budget for (N, lambda). Mirrors the role of SEAL
    `CoefficientModulus::bfv_default` — the last default prime there is
    likewise reserved for key switching."""
    total = MAX_LOG_Q[security][poly_degree]
    special_bits = min(SEALISH_MAX_LIMB_BITS, max(total // 3, 2))
    rem = total - special_bits
    count = max(1, math.ceil(rem / 56))
    base = rem // count
    sizes = [base + (1 if i < rem - base * count else 0)
             for i in range(count)]
    special = primes.gen_ntt_primes(special_bits, 1, poly_degree)[0]
    qs: list[int] = []
    for b in sorted(set(sizes)):
        need = sizes.count(b)
        qs += primes.gen_ntt_primes(b, need, poly_degree,
                                    skip=tuple([special] + qs))
    assert len(qs) == count
    return tuple(sorted(qs)), special


@dataclass(frozen=True)
class BfvParams:
    """Scheme parameters. `coeff_modulus` are the ciphertext primes Q;
    `special_modulus` is the key-switching prime P (SEAL: the trailing
    prime of the encryption-parameter modulus chain).

    Equivalent of the reference's `sunscreen_runtime::Params`
    (`metadata.rs:72`): {lattice_dimension, coeff_modulus, plain_modulus,
    security_level, scheme_type='bfv'}.
    """

    poly_degree: int
    plain_modulus: int
    coeff_modulus: tuple[int, ...]
    special_modulus: int
    security_level: int = 128

    @staticmethod
    def default(poly_degree: int, plain_modulus: int | None = None,
                security: int = 128, batching: bool = True) -> "BfvParams":
        if plain_modulus is None:
            plain_modulus = (batching_plain_modulus(poly_degree, 20)
                             if batching else 1 << 18)
        qs, sp = default_moduli(poly_degree, security)
        return BfvParams(poly_degree, plain_modulus, qs, sp, security)

    @staticmethod
    def default_u32(poly_degree: int, plain_modulus: int | None = None,
                    security: int = 128, batching: bool = True
                    ) -> "BfvParams":
        """u32-engine defaults: all moduli < 2^30 -> uint32 ciphertext
        storage (see `default_moduli_u32`). Same plaintext space and
        security budget as `default`; more (smaller) RNS limbs."""
        if plain_modulus is None:
            plain_modulus = (batching_plain_modulus(poly_degree, 20)
                             if batching else 1 << 18)
        qs, sp = default_moduli_u32(poly_degree, security)
        return BfvParams(poly_degree, plain_modulus, qs, sp, security)

    @staticmethod
    def insecure_u32(poly_degree: int = 1024,
                     plain_modulus: int | None = None,
                     limbs: int = 3, limb_bits: int = 28) -> "BfvParams":
        """Small u32-engine test parameters (every modulus < 2^30)."""
        assert limb_bits + 2 <= U32_MAX_LIMB_BITS
        if plain_modulus is None:
            plain_modulus = batching_plain_modulus(poly_degree, 16)
        sp = primes.gen_ntt_primes(limb_bits + 2, 1, poly_degree)[0]
        qs = tuple(primes.gen_ntt_primes(limb_bits, limbs, poly_degree,
                                         skip=(sp,)))
        return BfvParams(poly_degree, plain_modulus, qs, sp,
                         security_level=0)

    @property
    def word_bits(self) -> int:
        """Engine word: 32 iff every modulus < 2^30 (see math/modular)."""
        mods = self.coeff_modulus + (self.special_modulus,)
        return 32 if max(q.bit_length() for q in mods) <= 30 else 64

    @staticmethod
    def insecure(poly_degree: int = 1024, plain_modulus: int | None = None,
                 limbs: int = 2, limb_bits: int = 40) -> "BfvParams":
        """Small test parameters (reference: `SealContext::new_insecure`,
        `seal_fhe/src/context.rs:92` + the `insecure-params` feature).
        When the limbs fit the u32 engine (< 2^30) the special modulus
        is capped at 30 bits too so the whole chain stays one word."""
        if plain_modulus is None:
            plain_modulus = batching_plain_modulus(poly_degree, 16)
        sp_bits = limb_bits + 4
        if limb_bits <= 30:
            sp_bits = min(sp_bits, 30)
        sp = primes.gen_ntt_primes(sp_bits, 1, poly_degree)[0]
        qs = tuple(primes.gen_ntt_primes(limb_bits, limbs, poly_degree,
                                         skip=(sp,)))
        return BfvParams(poly_degree, plain_modulus, qs, sp,
                         security_level=0)

    def __post_init__(self):
        from sunscreen_tpu.errors import ParamsError
        n = self.poly_degree
        if n & (n - 1) != 0 or n < 8:
            raise ParamsError(f"poly_degree must be a power of two >= 8, "
                              f"got {n}")
        if self.plain_modulus < 2:
            raise ParamsError("plain_modulus must be >= 2")
        if self.plain_modulus >= min(self.coeff_modulus):
            raise ParamsError(
                "plain modulus must be smaller than every coefficient "
                "modulus")
        if self.security_level:
            total = sum(q.bit_length() for q in self.coeff_modulus)
            total += self.special_modulus.bit_length()
            limit = MAX_LOG_Q[self.security_level].get(n, 0)
            if total > limit:
                raise ParamsError(
                    f"log2(Q*P)={total} exceeds {self.security_level}-bit "
                    f"security budget {limit} for N={n}")

    @property
    def q_product(self) -> int:
        out = 1
        for q in self.coeff_modulus:
            out *= q
        return out

    @property
    def supports_batching(self) -> bool:
        t, n = self.plain_modulus, self.poly_degree
        return t % (2 * n) == 1 and primes.is_prime(t)
