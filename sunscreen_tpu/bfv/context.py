"""BfvContext: every precomputed plan/table for one parameter set.

The TPU-native analogue of SEAL's `SEALContext` + `util::RNSTool`
(`seal_fhe/src/context.rs:45-92` wraps the C++ context chain): NTT plans
over the ciphertext base Q, the multiply base Q∪B, and the key base
Q∪{p_sp}; base converters and scalers; Galois permutation tables; the
plaintext Δ-scaling tables. Host-built once per params (lru-cached),
then closed over by jitted ops as device constants.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.bfv.params import BfvParams
from sunscreen_tpu.math import modular as m
from sunscreen_tpu.math import ntt, primes, rns

U64 = jnp.uint64

AUX_PRIME_BITS = 56  # <= 56 keeps the MXU matmul-NTT bound (mntt.py)
AUX_PRIME_BITS_U32 = 30  # u32 engine: every modulus < 2^30


def _aux_base_size(params: BfvParams, aux_bits: int) -> int:
    """#aux primes B so that B holds round(t*x/Q) for tensor coefficients:
    need prod(B)/2 > t*N*Q/4 (centered operands)."""
    bound_bits = (params.plain_modulus.bit_length()
                  + params.poly_degree.bit_length()
                  + params.q_product.bit_length() + 2)
    return max(len(params.coeff_modulus) + 1,
               math.ceil(bound_bits / aux_bits))


class BfvContext:
    def __init__(self, params: BfvParams):
        self.params = params
        n = params.poly_degree
        self.n = n
        t = params.plain_modulus
        self.t = t
        q_mods = params.coeff_modulus
        self.k = len(q_mods)

        # --- bases ---------------------------------------------------------
        self.q_base = rns.RnsBase(q_mods)
        # engine word (u32 iff all moduli < 2^30): the aux/multiply base
        # must stay inside the same engine so every hot array is one word
        self.word = self.q_base.word
        if self.word == m.U32:
            assert params.special_modulus < (1 << 30), \
                "u32 engine requires the special modulus < 2^30 too"
        aux_bits = (AUX_PRIME_BITS_U32 if self.word == m.U32
                    else AUX_PRIME_BITS)
        skip = tuple(q_mods) + (params.special_modulus,)
        aux = tuple(primes.gen_ntt_primes(
            aux_bits, _aux_base_size(params, aux_bits), n, skip=skip))
        self.aux_base = rns.RnsBase(aux)
        self.mul_base = rns.RnsBase(q_mods + aux)          # Q ∪ B
        self.key_mods = q_mods + (params.special_modulus,)  # Q ∪ {p}
        self.key_base = rns.RnsBase(self.key_mods)

        # --- NTT plans -------------------------------------------------------
        self.plan_q = ntt.get_plan(n, q_mods)
        self.plan_mul = ntt.get_plan(n, self.mul_base.moduli)
        self.plan_key = ntt.get_plan(n, self.key_mods)

        # --- converters / scalers -------------------------------------------
        self.conv_q_to_aux = rns.BaseConverter(self.q_base, self.aux_base)
        self.conv_aux_to_q = rns.BaseConverter(self.aux_base, self.q_base)
        self.scale_mul_to_aux = rns.ScaleAndRound(
            self.mul_base, self.q_base, self.aux_base, t)
        self.decrypt_scaler = rns.DecryptScaler(self.q_base, t)
        self.mod_down = rns.ModDown(self.q_base, params.special_modulus)
        # drop-last-limb rescale for mod_switch_to_next
        if self.k >= 2:
            self.mod_switch_down = rns.ModDown(
                rns.RnsBase(q_mods[:-1]), q_mods[-1])
        else:
            self.mod_switch_down = None

        # --- Δ = round(Q*m/t) tables (exact; see ops.scale_plain) -----------
        Q = params.q_product
        w = Q // t
        wnp = np.uint32 if self.word == m.U32 else np.uint64
        self.delta_mod_q = jnp.asarray(np.array(
            [w % q for q in q_mods], dtype=wnp))
        self.delta_mod_q_sh = jnp.asarray(np.array(
            [m.w_shoup_host(w % q, q, self.word) for q in q_mods],
            dtype=wnp))
        fr = (((Q % t) << 128) + t - 1) // t  # ceil; error positive
        self.delta_frac_hi = jnp.asarray(
            np.array([(fr >> 64) & ((1 << 64) - 1)], dtype=np.uint64))
        self.delta_frac_lo = jnp.asarray(
            np.array([fr & ((1 << 64) - 1)], dtype=np.uint64))

        # p_sp * D_i mod key-modulus table for keyswitch key generation:
        # D_i = CRT idempotent of q_i in Q (1 mod q_i, 0 mod q_j).
        P = params.special_modulus
        tab = np.empty((self.k, self.k + 1),
                       dtype=np.uint32 if self.word == m.U32
                       else np.uint64)
        for i in range(self.k):
            d_i = self.q_base.punctured[i] * self.q_base.inv_punctured[i]
            for j, qj in enumerate(self.key_mods):
                tab[i, j] = (P * d_i) % qj
        self.ksk_factor = jnp.asarray(tab)

        # --- Galois tables (built lazily per element) ------------------------
        self._galois_tables: dict[int, tuple[jnp.ndarray, jnp.ndarray]] = {}

        # plain-lift helper: plaintext coeffs in [0, t) lift verbatim since
        # t < min(q_i) (asserted in params)
        self.q_dev = self.q_base.q_dev

    # -- Galois -------------------------------------------------------------

    def galois_table_host(self, g: int):
        """(src_index[int32 N], negate[bool N]) numpy tables for
        a(x) -> a(x^g). Host-side cache — convert with jnp.asarray at
        use sites (a cached jnp array created during one trace would
        leak as a tracer into others under JAX's constant lifting)."""
        if g not in self._galois_tables:
            n = self.n
            assert g % 2 == 1 and 0 < g < 2 * n
            ginv = pow(g, -1, 2 * n)
            idx = np.empty(n, dtype=np.int32)
            neg = np.empty(n, dtype=bool)
            for j in range(n):
                i = j * ginv % (2 * n)
                if i < n:
                    idx[j], neg[j] = i, False
                else:
                    idx[j], neg[j] = i - n, True
            self._galois_tables[g] = (idx, neg)
        return self._galois_tables[g]

    def galois_table(self, g: int):
        idx, neg = self.galois_table_host(g)
        return jnp.asarray(idx), jnp.asarray(neg)

    def rotate_rows_element(self, steps: int) -> int:
        """Galois element for a cyclic row rotation by `steps` slots
        (SEAL: `GaloisTool::get_elt_from_step`)."""
        n = self.n
        half = n // 2
        steps = steps % half
        return pow(3, steps, 2 * n)

    @property
    def rotate_columns_element(self) -> int:
        return 2 * self.n - 1

    def __hash__(self):
        return hash(self.params)

    def __eq__(self, other):
        return isinstance(other, BfvContext) and self.params == other.params


@lru_cache(maxsize=16)
def get_context(params: BfvParams) -> BfvContext:
    return BfvContext(params)
