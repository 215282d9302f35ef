"""SDLP lattice proofs (replaces the reference's `logproof` crate:
short discrete log proofs of A·S = T over Z_q[X]/(X^N+1) with
per-coefficient bounds, ZK inner product argument, BFV statement
builders)."""

from sunscreen_tpu.logproof.linear_relation import (  # noqa: F401
    LogProof, LogProofGenerators, ProverKnowledge, VerifierKnowledge,
    create, verify)
