"""Typed FHE runtime (replaces `sunscreen_runtime`)."""

from sunscreen_tpu.runtime.runtime import (  # noqa: F401
    Ciphertext, FheRuntime, FheZkpRuntime, PrivateKey, PublicKeySet,
    Runtime, TooMuchNoise, ZkpRuntime)
