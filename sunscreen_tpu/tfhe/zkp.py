"""TFHE <-> SDLP bridge: prove an LWE ciphertext validly encrypts a
bounded message under a binary secret key.

Replaces `sunscreen_tfhe/src/zkp.rs:20-60` (links LWE encryptions to
`logproof`). The LWE relation b = <a, s> + m*2^(64-bits) + e becomes a
1-row lattice statement over Z_{2^64}[X]/(X+1) (degree-1 ring = plain
mod-2^64 arithmetic) with witness columns [s_1..s_n, m, e] bounded as
[1 bit each, plaintext_bits, noise_bits].
"""

from __future__ import annotations

import numpy as np

from sunscreen_tpu.logproof import inner_product as lp_ipp
from sunscreen_tpu.logproof import linear_relation as lr
from sunscreen_tpu.tfhe.params import TORUS_BITS, LweDef
from sunscreen_tpu.zk.merlin import Transcript

Q = 1 << TORUS_BITS
TRANSCRIPT_LABEL = b"sunscreen_tpu tfhe sdlp"


def lwe_statement(ct, params: LweDef, plaintext_bits: int,
                  noise_bits: int = 16) -> lr.VerifierKnowledge:
    """A = [a_1 .. a_n, 2^(64-bits), 1], T = [b]."""
    ct = np.asarray(ct, dtype=np.uint64)
    a_row = [[int(c)] for c in ct[:-1]]
    a_row.append([1 << (TORUS_BITS - plaintext_bits)])
    a_row.append([1])
    bounds = [[[1]] for _ in range(params.dim)]
    bounds.append([[plaintext_bits]])
    bounds.append([[noise_bits]])
    return lr.VerifierKnowledge(
        a=[a_row], t=[[[int(ct[-1])]]], bounds=bounds, f=[1, 1], q=Q)


def prove_lwe_encryption(ct, sk, msg: int, e: int, params: LweDef,
                         plaintext_bits: int, noise_bits: int = 16
                         ) -> tuple[lr.LogProof, lr.VerifierKnowledge]:
    """Prove knowledge of (s, m, e) with b = <a,s> + m*Delta + e."""
    vk = lwe_statement(ct, params, plaintext_bits, noise_bits)
    sk_np = np.asarray(sk, dtype=np.uint64)
    s_col = [[[int(b)]] for b in sk_np]
    s_col.append([[int(msg) % Q]])
    s_col.append([[int(e) % Q]])
    pk = lr.ProverKnowledge(vk, s_col)
    gens = lr.LogProofGenerators(vk.l)
    proof = lr.create(Transcript(TRANSCRIPT_LABEL), pk, gens.g, gens.h,
                      lp_ipp.get_u(), gens=gens)
    return proof, vk


def verify_lwe_encryption(proof: lr.LogProof,
                          vk: lr.VerifierKnowledge) -> bool:
    gens = lr.LogProofGenerators(vk.l)
    return lr.verify(proof, Transcript(TRANSCRIPT_LABEL), vk, gens.g,
                     gens.h, lp_ipp.get_u(), gens=gens)
