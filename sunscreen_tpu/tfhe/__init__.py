"""TFHE over the 2^64 torus (replaces the reference's `sunscreen_tfhe`
crate, SURVEY.md §2.4). Polynomial products are exact via CRT NTT
rather than the reference's f64 FFT — see `tfhe.poly`."""

from sunscreen_tpu.tfhe.params import (  # noqa: F401
    GLWE_1_512_128, GLWE_1_1024_80, GLWE_1_1024_128, GLWE_1_2048_128,
    GLWE_5_256_80, GLWE_5_256_128, GlweDef, LWE_512_80, LWE_512_128,
    LweDef, RadixDecomposition, TEST_GLWE_DEF_1, TEST_GLWE_DEF_2,
    TEST_LWE_DEF_1, TEST_RADIX, TEST_RADIX_FINE)
