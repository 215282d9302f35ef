"""Exact 64-bit modular arithmetic on JAX arrays.

This is the arithmetic substrate of every RNS polynomial kernel: the
TPU-native replacement for the reference's Barrett backend
(`sunscreen_math/src/ring/barrett.rs:18-37`) and for SEAL's
`util/uintarithsmallmod` (used throughout `seal_fhe`).

Design notes (TPU-first):
  * All values are `uint64` JAX arrays. On TPU, XLA emulates 64-bit integer
    ops with 32-bit pairs; the hot paths (NTT butterflies, pointwise
    products) are later replaced by Pallas kernels operating on 32-bit
    limbs directly — this module is the semantics-defining reference path
    and is itself jit-compatible and fully vectorized (no scalar loops).
  * Products of two 64-bit words are computed exactly via 32-bit-half
    schoolbook (four 64-bit multiplies, no overflow).
  * Barrett reduction follows the classic 128-bit-input variant with a
    2-word ratio floor(2^128/q); Shoup multiplication is used where one
    operand is a precomputable constant (NTT twiddles, CRT idempotents).

Moduli are required to be < 2^62 so that lazy [0, 4q) representations fit
in a word with headroom (same bound SEAL imposes on user moduli).
"""

from __future__ import annotations

import jax.numpy as jnp

U64 = jnp.uint64
_M32 = jnp.uint64(0xFFFFFFFF)
_S32 = jnp.uint64(32)

MAX_MODULUS_BITS = 62


def mul_wide(a, b):
    """Exact 64x64 -> 128 multiply. Returns (hi, lo) uint64 words."""
    a = a.astype(U64) if hasattr(a, "astype") else U64(a)
    b = b.astype(U64) if hasattr(b, "astype") else U64(b)
    a0 = a & _M32
    a1 = a >> _S32
    b0 = b & _M32
    b1 = b >> _S32
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    # mid <= (2^32-1) + 2*(2^32-1)^2 >> 32 terms: each masked term < 2^32,
    # (p00>>32) < 2^32 -> mid < 3*2^32, exact in u64.
    mid = (p00 >> _S32) + (p01 & _M32) + (p10 & _M32)
    lo = (p00 & _M32) | ((mid & _M32) << _S32)
    hi = p11 + (p01 >> _S32) + (p10 >> _S32) + (mid >> _S32)
    return hi, lo


def mul_hi(a, b):
    """High 64 bits of the 128-bit product."""
    return mul_wide(a, b)[0]


def add_mod(a, b, q):
    """(a + b) mod q for a, b in [0, q). q may be broadcast."""
    s = a + b
    return jnp.where(s >= q, s - q, s)


def sub_mod(a, b, q):
    """(a - b) mod q for a, b in [0, q)."""
    d = a - b
    return jnp.where(a >= b, d, d + q)


def neg_mod(a, q):
    """(-a) mod q for a in [0, q)."""
    return jnp.where(a == 0, a, q - a)


def barrett_ratio(q: int) -> tuple[int, int]:
    """Host-side: floor(2^128 / q) as (hi, lo) python ints."""
    assert 1 < q < (1 << MAX_MODULUS_BITS)
    r = (1 << 128) // q
    return (r >> 64) & ((1 << 64) - 1), r & ((1 << 64) - 1)


def barrett_reduce_128(hi, lo, q, r_hi, r_lo):
    """Reduce a 128-bit value (hi*2^64 + lo) < q*2^64 modulo q.

    Classic Barrett with 2-word ratio (cf. BEHZ'16 §2 and SEAL's
    barrett_reduce_128): estimate the quotient from the top words,
    subtract, and apply one conditional correction.
    """
    one = U64(1)
    zero = U64(0)
    # round 1: carry = HIGH(lo * r_lo)
    carry = mul_hi(lo, r_lo)
    h2, l2 = mul_wide(lo, r_hi)
    tmp1 = l2 + carry
    c1 = jnp.where(tmp1 < l2, one, zero)
    tmp3 = h2 + c1
    # round 2
    h3, l3 = mul_wide(hi, r_lo)
    tmp1b = tmp1 + l3
    c2 = jnp.where(tmp1b < l3, one, zero)
    carry2 = h3 + c2
    # quotient estimate (mod 2^64)
    qhat = hi * r_hi + tmp3 + carry2
    r = lo - qhat * q
    return jnp.where(r >= q, r - q, r)


def barrett_reduce_64(a, q, r_hi, r_lo):
    """Reduce a full 64-bit word modulo q (q < 2^62)."""
    return barrett_reduce_128(jnp.zeros_like(a), a, q, r_hi, r_lo)


def mul_mod(a, b, q, r_hi, r_lo):
    """(a * b) mod q, exact, for a, b in [0, q)."""
    hi, lo = mul_wide(a, b)
    return barrett_reduce_128(hi, lo, q, r_hi, r_lo)


def shoup_ratio(w: int, q: int) -> int:
    """Host-side Shoup precomputation floor(w * 2^64 / q) for constant w < q."""
    assert 0 <= w < q
    return (w << 64) // q


def mul_mod_shoup(x, w, w_shoup, q):
    """(x * w) mod q with precomputed w_shoup = floor(w*2^64/q).

    Requires x in [0, 2q) and w in [0, q); returns a value in [0, 2q)
    (lazy — call `reduce_2q` to normalize). This is the Harvey/Shoup
    butterfly multiply used for all NTT twiddle products.
    """
    hi = mul_hi(x, w_shoup)
    return w * x - hi * q  # wraps mod 2^64; result provably in [0, 2q)


def reduce_2q(x, q):
    """Normalize a lazy value in [0, 2q) to [0, q)."""
    return jnp.where(x >= q, x - q, x)


# ---------------------------------------------------------------------------
# u32 engine (small moduli q < 2^30): the TPU-native fast path.
#
# Round-2 measurements on the v5e (benchmarks/PERF_NOTES.md) showed the
# u64 emulation chains are the throughput ceiling: every 64-bit multiply
# synthesizes ~4 32-bit multiplies and XLA does not fuse the chains.
# With all moduli < 2^30 ("u32 engine"), ciphertexts are stored uint32
# (half the HBM traffic) and every modular primitive is 1-6 32-bit
# products instead of 4-12 synthesized 64-bit ones. Replaces the same
# SEAL small-modulus arithmetic as the u64 path above (SEAL supports
# word-size choice too; cf. `seal_fhe` Modulus bounds).
#
# The `w_*` wrappers dispatch on the dtype of `q` so the RNS/NTT/BFV
# layers are word-generic: a modulus set with max bits <= 30 uses the
# u32 engine, anything else the u64 engine.
# ---------------------------------------------------------------------------

U32 = jnp.uint32

U32_MAX_MODULUS_BITS = 30  # 4q < 2^32 (lazy headroom) and Shoup q < beta/4


def word_dtype_for(moduli) -> "jnp.dtype":
    """Engine word for a modulus set: u32 iff every q < 2^30."""
    return (U32 if max(int(q).bit_length() for q in moduli)
            <= U32_MAX_MODULUS_BITS else U64)


def mul_hi32(a, b):
    """High 32 bits of the exact 32x32 product (reference path: via a
    single widening u64 multiply; the Pallas kernels use 16-bit halves)."""
    return ((a.astype(U64) * b.astype(U64)) >> jnp.uint64(32)).astype(U32)


def shoup_ratio32(w: int, q: int) -> int:
    """Host-side Shoup precomputation floor(w * 2^32 / q), w < q < 2^30."""
    assert 0 <= w < q < (1 << U32_MAX_MODULUS_BITS)
    return (w << 32) // q


def mul_mod_shoup32(x, w, w_sh, q):
    """(x * w) mod q, lazy: x in [0, 2q), w < q < 2^30, result in [0, 2q).
    Harvey/Shoup with beta = 2^32 (valid since q < beta/4)."""
    hi = mul_hi32(x, w_sh)
    return w * x - hi * q  # u32 wrap; provably in [0, 2q)


def barrett32_consts(q: int) -> tuple[int, int]:
    """Host-side (mu, s1) for `reduce_long32`: s1 = max(0, 2b-32),
    mu = floor(2^(s1+32) / q) < 2^(b+2) <= 2^32."""
    b = q.bit_length()
    s1 = max(0, 2 * b - 32)
    mu = (1 << (s1 + 32)) // q
    assert mu < (1 << 32)
    return mu, s1


def reduce_long32(x, q, mu, s1):
    """Reduce u64 x < 2^(2*bits(q)) (and in any case < 4q*2^s1... the
    product/sum bounds used by callers) modulo q < 2^30 -> u32 in [0, q).

    qhat = floor((x >> s1) * mu / 2^32) with mu = floor(2^(s1+32)/q)
    under-estimates floor(x/q) by < 4, so r = x - qhat*q < 4q < 2^32 is
    exact in u32 wrap arithmetic; two conditional subtracts (2q then q)
    normalize. Verified exhaustively-at-random across 17..30-bit moduli
    in tests/test_modular.py.
    """
    x = x.astype(U64)
    s1 = jnp.asarray(s1, U64)
    mu = jnp.asarray(mu, U64)
    qhat = (((x >> s1) * mu) >> jnp.uint64(32)).astype(U32)
    r = x.astype(U32) - qhat * q  # wrap-exact: true r < 4q < 2^32
    q2 = q + q
    r = jnp.where(r >= q2, r - q2, r)
    return jnp.where(r >= q, r - q, r)


def mul_mod32(a, b, q, mu, s1):
    """(a * b) mod q exact for a, b in [0, q), q < 2^30."""
    return reduce_long32(a.astype(U64) * b.astype(U64), q, mu, s1)


# -- word-generic wrappers (dispatch on q.dtype) ----------------------------


def w_shoup_host(w: int, q: int, word) -> int:
    return shoup_ratio32(w, q) if word == U32 else shoup_ratio(w, q)


def w_consts_host(q: int, word) -> tuple[int, int]:
    """(c0, c1) reduction constants: u64 -> Barrett (ratio_hi, ratio_lo);
    u32 -> (mu, s1)."""
    if word == U32:
        return barrett32_consts(q)
    return barrett_ratio(q)


def w_shoup_mul(x, w, w_sh, q):
    """Lazy Shoup multiply, word-generic: x in [0,2q) -> [0,2q)."""
    if q.dtype == U32:
        return mul_mod_shoup32(x, w, w_sh, q)
    return mul_mod_shoup(x, w, w_sh, q)


def w_mul_mod(a, b, q, c0, c1):
    """Exact (a*b) mod q for a, b in [0, q), word-generic."""
    if q.dtype == U32:
        return mul_mod32(a, b, q, c0, c1)
    return mul_mod(a, b, q, c0, c1)


def w_reduce(x, q, c0, c1):
    """Reduce a raw word (u32 engine: u64 sums/products < 2^(2b);
    u64 engine: any u64) to [0, q)."""
    if q.dtype == U32:
        return reduce_long32(x, q, c0, c1)
    return barrett_reduce_64(x, q, c0, c1)


def w_sum_reduce(x, q, c0, c1, axis=-3):
    """Exact sum of reduced residues along `axis`, then one reduction.
    u32 engine: accumulate widened (k*q can exceed 2^32); u64: raw sums
    cannot wrap for k*q < 2^64 (all callers)."""
    if q.dtype == U32:
        return reduce_long32(jnp.sum(x.astype(U64), axis=axis), q, c0, c1)
    return barrett_reduce_64(jnp.sum(x, axis=axis), q, c0, c1)


# ---------------------------------------------------------------------------
# Host-side (python int) number theory helpers. These run at plan-build
# time only; nothing here touches the device.
# ---------------------------------------------------------------------------


def pow_mod_host(base: int, exp: int, q: int) -> int:
    return pow(base, exp, q)


def inv_mod_host(a: int, q: int) -> int:
    return pow(a, -1, q)
