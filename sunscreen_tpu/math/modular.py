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
# Host-side (python int) number theory helpers. These run at plan-build
# time only; nothing here touches the device.
# ---------------------------------------------------------------------------


def pow_mod_host(base: int, exp: int, q: int) -> int:
    return pow(base, exp, q)


def inv_mod_host(a: int, q: int) -> int:
    return pow(a, -1, q)
