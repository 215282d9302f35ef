"""TFHE over the 2^64 torus (replaces the reference's `sunscreen_tfhe`
crate, SURVEY.md §2.4). Polynomial products are exact via CRT NTT
rather than the reference's f64 FFT — see `tfhe.poly`."""

from sunscreen_tpu.tfhe.params import (  # noqa: F401
    GlweDef, LweDef, RadixDecomposition, TEST_GLWE_DEF_1,
    TEST_GLWE_DEF_2, TEST_LWE_DEF_1, TEST_RADIX, TEST_RADIX_FINE)
