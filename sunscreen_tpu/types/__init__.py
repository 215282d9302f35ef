"""FHE/ZKP DSL types (replaces `sunscreen/src/types/`)."""

from sunscreen_tpu.types.bfv_types import (  # noqa: F401
    Array, Batched, BfvType, Cipher, Fractional, Rational, Signed,
    Unsigned, Unsigned64, Unsigned128)
