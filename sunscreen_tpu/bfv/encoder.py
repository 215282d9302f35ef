"""Batch (SIMD) encoder: N integers mod t <-> one plaintext polynomial.

Replaces `seal_fhe/src/encoder.rs:39-228` (`BFVEncoder`) / SEAL's
`BatchEncoder`. Requires a prime plain modulus t = 1 mod 2N; the slots
form a 2 x (N/2) matrix (reference: `sunscreen/src/types/bfv/batched.rs:68`,
FHE IR ops ShiftLeft/ShiftRight/SwapRows). Row rotations act cyclically
within each row via the Galois element 3^steps; column rotation swaps the
rows via the element 2N-1.

Slot j of row r is the evaluation of the plaintext polynomial at
zeta^(3^j) (r=0) / zeta^(-3^j) (r=1), zeta a primitive 2N-th root mod t —
computed with the same negacyclic NTT machinery used for the ciphertext
ring (one extra tiny plan over (t,)).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.bfv.context import BfvContext
from sunscreen_tpu.math import ntt, primes


class BatchEncoder:
    def __init__(self, ctx: BfvContext):
        params = ctx.params
        t, n = params.plain_modulus, params.poly_degree
        assert params.supports_batching, (
            "batching requires a prime plain modulus = 1 mod 2N")
        self.t, self.n = t, n
        self.plan = ntt.get_plan(n, (t,))
        # Recover which evaluation point each NTT output position holds by
        # transforming the monomial x: output[i] = psi^{e_i}.
        mono = np.zeros((1, n), dtype=np.uint64)
        mono[0, 1] = 1
        evals = np.asarray(self.plan.fwd(jnp.asarray(mono)))[0].tolist()
        psi = primes.min_root_of_unity(2 * n, t)
        exp_of = {}
        cur = 1
        for e in range(2 * n):
            exp_of[cur] = e
            cur = cur * psi % t
        pos_of_exp = {exp_of[v]: i for i, v in enumerate(evals)}
        pos = np.empty(n, dtype=np.int32)
        g = 1  # 3^j mod 2N
        for j in range(n // 2):
            pos[j] = pos_of_exp[g]
            pos[n // 2 + j] = pos_of_exp[2 * n - g]
            g = g * 3 % (2 * n)
        self.slot_pos = jnp.asarray(pos)

    def encode(self, values):
        """[..., N] ints mod t -> plaintext polynomial [..., N]."""
        v = jnp.asarray(values, dtype=jnp.uint64) % jnp.uint64(self.t)
        ntt_form = jnp.zeros(v.shape, dtype=jnp.uint64)
        ntt_form = ntt_form.at[..., self.slot_pos].set(v)
        return self.plan.inv(ntt_form[..., None, :])[..., 0, :]

    def decode(self, poly):
        """plaintext polynomial [..., N] -> slot values [..., N]."""
        evals = self.plan.fwd(poly[..., None, :])[..., 0, :]
        return evals[..., self.slot_pos]

    def encode_signed(self, values):
        """Signed ints in (-t/2, t/2] -> plaintext (SEAL ±encode)."""
        v = jnp.asarray(values, dtype=jnp.int64)
        t = jnp.int64(self.t)
        return self.encode(jnp.where(v < 0, v + t, v).astype(jnp.uint64))

    def decode_signed(self, poly):
        v = self.decode(poly).astype(jnp.int64)
        t = jnp.int64(self.t)
        return jnp.where(v > t // 2, v - t, v)
