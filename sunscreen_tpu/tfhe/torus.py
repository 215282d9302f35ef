"""Torus (Z / 2^64) arithmetic + signed radix decomposition.

Replaces `sunscreen_tfhe/src/math/torus.rs` and the gadget/radix
decomposition in `src/math/radix.rs`. All ops vectorized on uint64
arrays (wrapping arithmetic is native mod-2^64).
"""

from __future__ import annotations

import jax.numpy as jnp

from sunscreen_tpu.tfhe.params import TORUS_BITS

U64 = jnp.uint64


def encode(msg, plaintext_bits: int):
    """Integer message -> torus: m * 2^(64 - bits)."""
    return (jnp.asarray(msg, dtype=U64)
            << jnp.uint64(TORUS_BITS - plaintext_bits))


def decode(t, plaintext_bits: int):
    """Torus -> integer message with rounding."""
    shift = jnp.uint64(TORUS_BITS - plaintext_bits)
    half = jnp.uint64(1) << (shift - jnp.uint64(1))
    return ((jnp.asarray(t, dtype=U64) + half) >> shift) \
        & jnp.uint64((1 << plaintext_bits) - 1)


def signed_decompose(t, radix_log: int, count: int):
    """Balanced base-2^radix_log decomposition of the `count` most
    significant digits (gadget decomposition).

    Returns int64 digits [count, ...] with digit i in
    (-B/2, B/2], ordered most-significant first, satisfying
      sum_i d_i * 2^(64 - (i+1)*radix_log) ~= t  (closest multiple).
    """
    t = jnp.asarray(t, dtype=U64)
    beta = radix_log
    total = beta * count
    shift = TORUS_BITS - total
    # round to the closest multiple of 2^shift (wrapping)
    if shift > 0:
        rounded = (t + (U64(1) << jnp.uint64(shift - 1))) >> jnp.uint64(
            shift)
    else:
        rounded = t
    # rounded is a `total`-bit value (mod 2^total)
    mask_total = jnp.uint64((1 << total) - 1) if total < 64 else \
        jnp.uint64(0xFFFFFFFFFFFFFFFF)
    rounded = rounded & mask_total
    b = 1 << beta
    half_b = b // 2
    digits = []
    cur = rounded
    for _ in range(count):  # least significant first
        d = (cur & jnp.uint64(b - 1)).astype(jnp.int64)
        cur = cur >> jnp.uint64(beta)
        carry = (d > half_b) | ((d == half_b) & ((cur & U64(1)) == U64(1)))
        d = jnp.where(carry, d - b, d)
        cur = cur + carry.astype(U64)
        digits.append(d)
    digits.reverse()  # most significant first
    return jnp.stack(digits)


def recompose(digits, radix_log: int):
    """Inverse of signed_decompose (up to the dropped low bits)."""
    count = digits.shape[0]
    acc = jnp.zeros(digits.shape[1:], dtype=U64)
    for i in range(count):
        shift = jnp.uint64(TORUS_BITS - (i + 1) * radix_log)
        acc = acc + (digits[i].astype(jnp.int64).astype(U64) << shift)
    return acc
