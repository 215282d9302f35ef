"""TFHE operations: LWE/GLWE encryption, external product, CMUX, blind
rotation, sample extraction, keyswitching, programmable bootstrapping.

Replaces `sunscreen_tfhe/src/ops/` (encryption, keyswitch/
{lwe_keyswitch_key,...}, bootstrapping/{blind_rotation,
programmable_bootstrapping}) and `src/high_level.rs`'s keygen/encrypt/
eval API surface. Conventions (same as reference): ciphertext
b = <a, s> + m + e over the 2^64 torus; GLWE masks are the first k rows
of a [k+1, N] array, body last; GGSW is [k+1, l, k+1, N] with unit
contributions -s_i B_j (mask rows) / B_j (body row).

TPU shape: everything is batched jnp math; blind rotation is a
`lax.fori_loop` over the LWE dimension with the whole GGSW bootstrap
key as a stacked array — one fused XLA computation per bootstrap, many
bootstraps batchable via leading axes (SURVEY.md §7 step 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sunscreen_tpu.tfhe import poly, torus
from sunscreen_tpu.tfhe.params import TORUS_BITS, GlweDef, LweDef, \
    RadixDecomposition
from sunscreen_tpu.tfhe.poly import get_torus_plan, \
    negacyclic_monomial_mul

U64 = jnp.uint64
I64 = jnp.int64


def _noise(key, shape, std: float):
    e = jax.random.normal(key, shape) * (std * 2.0**TORUS_BITS)
    return jnp.round(e).astype(I64).astype(U64)


# --------------------------------------------------------------------------
# key generation
# --------------------------------------------------------------------------

def generate_binary_lwe_sk(params: LweDef, key):
    return jax.random.bernoulli(key, 0.5, (params.dim,)).astype(U64)


def generate_binary_glwe_sk(params: GlweDef, key):
    return jax.random.bernoulli(
        key, 0.5, (params.size, params.poly_degree)).astype(U64)


def generate_uniform_lwe_sk(params: LweDef, key):
    """Uniform (non-binary) LWE secret key — key-share arithmetic
    producing binary keys from uniform shares (reference:
    `generate_uniform_lwe_sk`, high_level.rs:114). The LWE dot is
    wrapping mod 2^64, so decryption is exact for any u64 key."""
    return jax.random.bits(key, (params.dim,), dtype=jnp.uint64)


def generate_uniform_glwe_sk(params: GlweDef, key):
    """Uniform GLWE secret key (reference: `generate_uniform_glwe_sk`,
    high_level.rs:173). The mask.sk dot runs on the 3-prime CRT plan,
    exact for full torus x torus products."""
    return jax.random.bits(key, (params.size, params.poly_degree),
                           dtype=jnp.uint64)


def decrypt_lwe_with_carry(ct, sk, plaintext_bits: int,
                           carry_bits: int):
    """Decode reading the message BELOW `carry_bits` of headroom —
    the carry-arithmetic decode (reference: `decrypt_lwe_with_carry`,
    high_level.rs:551: round at bit 64-p-c-1, keep p bits)."""
    assert plaintext_bits + carry_bits < TORUS_BITS
    phase = decrypt_lwe_torus(ct, sk)
    shift = jnp.uint64(TORUS_BITS - plaintext_bits - carry_bits)
    round_bit = (phase >> (shift - jnp.uint64(1))) & jnp.uint64(1)
    return ((phase >> shift) + round_bit) \
        & jnp.uint64((1 << plaintext_bits) - 1)


# --------------------------------------------------------------------------
# LWE
# --------------------------------------------------------------------------

def encrypt_lwe(msg_torus, sk, params: LweDef, key):
    """msg_torus: u64 scalar/array. Returns ct [..., n+1]."""
    k_a, k_e = jax.random.split(key)
    msg = jnp.asarray(msg_torus, dtype=U64)
    a = jax.random.bits(k_a, msg.shape + (params.dim,), dtype=jnp.uint64)
    e = _noise(k_e, msg.shape, params.std)
    b = jnp.sum(a * sk, axis=-1) + msg + e
    return jnp.concatenate([a, b[..., None]], axis=-1)


def encrypt_lwe_return_components(msg_torus, sk, params: LweDef, key):
    """Like `encrypt_lwe` but also returns the noise e (signed int64) —
    needed for SDLP encryption statements (reference:
    `encrypt_lwe_secret_and_return_randomness`)."""
    k_a, k_e = jax.random.split(key)
    msg = jnp.asarray(msg_torus, dtype=U64)
    a = jax.random.bits(k_a, msg.shape + (params.dim,), dtype=jnp.uint64)
    e_signed = jnp.round(
        jax.random.normal(k_e, msg.shape)
        * (params.std * 2.0**TORUS_BITS)).astype(I64)
    b = jnp.sum(a * sk, axis=-1) + msg + e_signed.astype(U64)
    return jnp.concatenate([a, b[..., None]], axis=-1), e_signed


def trivial_lwe(msg_torus, params: LweDef):
    msg = jnp.asarray(msg_torus, dtype=U64)
    a = jnp.zeros(msg.shape + (params.dim,), dtype=U64)
    return jnp.concatenate([a, msg[..., None]], axis=-1)


def decrypt_lwe_torus(ct, sk):
    """Raw phase b - <a, s>."""
    a = ct[..., :-1]
    b = ct[..., -1]
    return b - jnp.sum(a * sk, axis=-1)


def decrypt_lwe(ct, sk, plaintext_bits: int):
    return torus.decode(decrypt_lwe_torus(ct, sk), plaintext_bits)


def lwe_add(a, b):
    return a + b


def lwe_sub(a, b):
    return a - b


def lwe_scalar_mul(ct, k: int):
    return ct * U64(k)


# --------------------------------------------------------------------------
# GLWE
# --------------------------------------------------------------------------

def _glwe_mask_dot_sk(masks, sk, params: GlweDef):
    """sum_j masks[j] * sk[j] (negacyclic, exact mod 2^64). Uses the
    3-prime plan (C ~ 2^186) so FULL torus x torus products stay exact
    — this is what makes UNIFORM (non-binary) secret keys valid, not
    just binary ones (|sum| < N * 2^128 << C/2)."""
    plan = get_torus_plan(params.poly_degree, k=3)
    acc = None
    for j in range(params.size):
        term_rns = plan.pointwise(
            plan.fwd(plan.torus_to_rns(sk[j].astype(U64))),
            plan.fwd(plan.torus_to_rns(masks[..., j, :])))
        acc = term_rns if acc is None else plan.add(acc, term_rns)
    return plan.to_torus(plan.plan.inv(acc))


def encrypt_glwe(msg_poly, sk, params: GlweDef, key):
    """msg_poly: u64 [..., N] torus poly. Returns [..., k+1, N]."""
    k_a, k_e = jax.random.split(key)
    msg = jnp.asarray(msg_poly, dtype=U64)
    n = params.poly_degree
    a = jax.random.bits(
        k_a, msg.shape[:-1] + (params.size, n), dtype=jnp.uint64)
    e = _noise(k_e, msg.shape, params.std)
    body = _glwe_mask_dot_sk(a, sk, params) + msg + e
    return jnp.concatenate([a, body[..., None, :]], axis=-2)


def trivial_glwe(msg_poly, params: GlweDef):
    msg = jnp.asarray(msg_poly, dtype=U64)
    a = jnp.zeros(msg.shape[:-1] + (params.size, params.poly_degree),
                  dtype=U64)
    return jnp.concatenate([a, msg[..., None, :]], axis=-2)


def decrypt_glwe_torus(ct, sk, params: GlweDef):
    masks = ct[..., :params.size, :]
    body = ct[..., params.size, :]
    return body - _glwe_mask_dot_sk(masks, sk, params)


def decrypt_glwe(ct, sk, params: GlweDef, plaintext_bits: int):
    return torus.decode(decrypt_glwe_torus(ct, sk, params),
                        plaintext_bits)


def generate_rlwe_public_key(sk, params: GlweDef, key):
    """RLWE public key = GLWE encryption of 0 (reference:
    `generate_rlwe_public_key`, high_level.rs:321)."""
    return encrypt_glwe(jnp.zeros(params.poly_degree, dtype=U64), sk,
                        params, key)


def encrypt_glwe_public(msg_poly, pk, params: GlweDef, key):
    """Public-key GLWE encryption: c = u*pk + (e_1..e_k, e_b + m) with
    ternary u."""
    from sunscreen_tpu.math import sampling
    plan = get_torus_plan(params.poly_degree)
    k_u, k_e = jax.random.split(key)
    n = params.poly_degree
    u = sampling.ternary(k_u, (n,)).astype(jnp.int64)
    u_hat = plan.fwd(plan.signed_to_rns(u))
    comps = []
    for i in range(params.size + 1):
        prod = plan.to_torus(plan.plan.inv(plan.pointwise(
            u_hat, plan.fwd(plan.torus_to_rns(pk[i])))))
        e = _noise(jax.random.fold_in(k_e, i), (n,), params.std)
        comps.append(prod + e)
    comps[-1] = comps[-1] + jnp.asarray(msg_poly, dtype=U64)
    return jnp.stack(comps)


# --------------------------------------------------------------------------
# GGSW + external product
# --------------------------------------------------------------------------

def encrypt_glev(msg_poly, sk, params: GlweDef,
                 radix: RadixDecomposition, key):
    """GLEV: [l, k+1, N] — level j encrypts msg * B_j (reference:
    entities/glev_ciphertext)."""
    msg = jnp.asarray(msg_poly, dtype=U64)
    lvl = []
    for j in range(radix.count):
        bj = U64(1) << jnp.uint64(TORUS_BITS - (j + 1) * radix.radix_log)
        lvl.append(encrypt_glwe(msg * bj, sk, params,
                                jax.random.fold_in(key, j)))
    return jnp.stack(lvl)


def trivial_glev(msg_poly, params: GlweDef, radix: RadixDecomposition):
    """Trivial (zero-mask) GLEV of `msg_poly` — no security, useful as
    constants (reference: `trivial_binary_glev`, high_level.rs:743)."""
    msg = jnp.asarray(msg_poly, dtype=U64)
    lvl = []
    for j in range(radix.count):
        bj = U64(1) << jnp.uint64(TORUS_BITS - (j + 1) * radix.radix_log)
        lvl.append(trivial_glwe(msg * bj, params))
    return jnp.stack(lvl)


def encrypt_rlev_public(msg_poly, pk, params: GlweDef,
                        radix: RadixDecomposition, key):
    """RLEV (GLEV with size == 1) of a binary-coefficient message
    under an RLWE PUBLIC key — level j encrypts msg * B_j (reference:
    `encrypt_binary_msg_rlev`, high_level.rs:764 /
    `encrypt_rlev_ciphertext`)."""
    assert params.size == 1, "RLEV requires GLWE size 1"
    msg = jnp.asarray(msg_poly, dtype=U64)
    lvl = []
    for j in range(radix.count):
        bj = U64(1) << jnp.uint64(TORUS_BITS - (j + 1) * radix.radix_log)
        lvl.append(encrypt_glwe_public(msg * bj, pk, params,
                                       jax.random.fold_in(key, j)))
    return jnp.stack(lvl)


def decrypt_glev(glev, sk, params: GlweDef, radix: RadixDecomposition):
    """Recover the level-0 message (scaled by B_1 = 2^(64-radix_log))."""
    t0 = decrypt_glwe_torus(glev[0], sk, params)
    shift = jnp.uint64(TORUS_BITS - radix.radix_log)
    half = U64(1) << (shift - jnp.uint64(1))
    return ((t0 + half) >> shift) & jnp.uint64(
        (1 << radix.radix_log) - 1)


def encrypt_ggsw(msg, sk, params: GlweDef,
                 radix: RadixDecomposition, key):
    """msg: small integer scalar OR integer polynomial [N]. Returns
    [k+1, l, k+1, N] — rows (i, j) = GLWE(0) + msg * B_j * u_i."""
    n = params.poly_degree
    kk = params.size
    msg_poly = jnp.zeros(n, dtype=U64)
    if jnp.ndim(msg) == 0:
        msg_poly = msg_poly.at[0].set(jnp.asarray(msg, dtype=U64))
    else:
        msg_poly = jnp.asarray(msg, dtype=U64)
    rows = []
    for i in range(kk + 1):
        lvl = []
        for j in range(radix.count):
            sub = jax.random.fold_in(key, i * radix.count + j)
            z = encrypt_glwe(jnp.zeros(n, dtype=U64), sk, params, sub)
            bj = U64(1) << jnp.uint64(
                TORUS_BITS - (j + 1) * radix.radix_log)
            unit = jnp.zeros((kk + 1, n), dtype=U64)
            unit = unit.at[i].set(msg_poly * bj)
            lvl.append(z + unit)
        rows.append(jnp.stack(lvl))
    return jnp.stack(rows)


def external_product(ggsw, glwe, params: GlweDef,
                     radix: RadixDecomposition):
    """GGSW(m) ⊡ GLWE(c) -> GLWE(m*c). All products exact via CRT NTT
    (reference hot loop: gadget decompose + negacyclic FFT mul,
    `blind_rotation.rs:79-230`)."""
    plan = get_torus_plan(params.poly_degree)
    kk = params.size
    acc_rns = None
    for i in range(kk + 1):
        comp = glwe[..., i, :]
        digits = torus.signed_decompose(comp, radix.radix_log,
                                        radix.count)
        for j in range(radix.count):
            d_hat = plan.fwd(plan.signed_to_rns(digits[j]))
            row = ggsw[..., i, j, :, :]  # [k+1, N]
            row_hat = plan.fwd(plan.torus_to_rns(row))
            term = plan.pointwise(d_hat[..., None, :, :], row_hat)
            acc_rns = term if acc_rns is None else plan.add(acc_rns, term)
    return plan.to_torus(plan.plan.inv(acc_rns))


def cmux(sel_ggsw, d0, d1, params: GlweDef, radix: RadixDecomposition):
    """d0 + sel ⊡ (d1 - d0) (reference: `ops/homomorphisms/cmux`)."""
    return d0 + external_product(sel_ggsw, d1 - d0, params, radix)


def glev_cmux(sel_ggsw, d0, d1, params: GlweDef,
              radix: RadixDecomposition):
    """CMUX over GLEV ciphertexts [l, k+1, N] — the same selector
    applied per level, used when muxing circuit-bootstrap outputs
    (reference: `glev_cmux`, high_level.rs:928 / fft_ops.rs). The
    external product batches over the leading level axis."""
    return cmux(sel_ggsw, d0, d1, params, radix)


# --------------------------------------------------------------------------
# blind rotation + sample extract + keyswitch
# --------------------------------------------------------------------------

def generate_bootstrap_key(lwe_sk, glwe_sk, lwe: LweDef, glwe: GlweDef,
                           radix: RadixDecomposition, key):
    """GGSW encryption of every LWE secret bit
    (reference: `generate_bootstrap_key`)."""
    import numpy as np
    bits = np.asarray(lwe_sk).astype(int)
    rows = [encrypt_ggsw(int(bits[i]), glwe_sk, glwe, radix,
                         jax.random.fold_in(key, i))
            for i in range(lwe.dim)]
    return jnp.stack(rows)  # [n, k+1, l, k+1, N]


class NttBootstrapKey:
    """Bootstrap key pre-transformed to the u32 CRT NTT domain — the
    analogue of the reference keeping its bootstrap keys in Fourier
    form (`blind_rotation.rs` consumes `BootstrapKeyFft`). rows:
    [n_lwe, (k+1)*l, k+1, n_primes, N] u32, digit axis ordered
    (glwe_component i2, level j). Converting ONCE removes the
    (k+1)^2*l GGSW-row forward transforms from every CMUX: a blind-
    rotation step is then (k+1)*l digit transforms + one fused
    contraction/inverse kernel instead of 14 transforms."""

    def __init__(self, rows, glwe: GlweDef, radix: RadixDecomposition):
        self.rows = rows
        self.glwe = glwe
        self.radix = radix

    def tree_flatten(self):
        return (self.rows,), (self.glwe, self.radix)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


jax.tree_util.register_pytree_node(
    NttBootstrapKey,
    lambda b: b.tree_flatten(),
    NttBootstrapKey.tree_unflatten)


def bootstrap_key_to_ntt(bsk, glwe: GlweDef,
                         radix: RadixDecomposition) -> NttBootstrapKey:
    """[n, k+1, l, k+1, N] u64 torus GGSW stack -> NttBootstrapKey
    (u32 CRT NTT domain, one-time cost)."""
    plan = poly.get_torus_plan_u32(glwe.poly_degree)
    n_lwe, kk1, l, kk1b, n = bsk.shape
    rows = bsk.reshape(n_lwe, kk1 * l, kk1b, n)
    hat = plan.fwd(plan.torus_to_rns(rows))
    return NttBootstrapKey(hat, glwe, radix)


def _blind_rotate_ntt(test_poly, lwe_ct, bsk: NttBootstrapKey,
                      glwe: GlweDef, radix: RadixDecomposition,
                      log_v: int = 0):
    """blind_rotate with an NTT-domain bootstrap key: per step, the
    CMUX runs as acc += ToTorus(InvNtt(sum_dig Ntt(decomp(rot - acc))
    * bsk_hat)) — (k+1)*l forward transforms and ONE fused
    contraction+inverse Pallas kernel (pmntt.inv_ks); bit-identical to
    the u64 path (both are exact integer pipelines)."""
    n = glwe.poly_degree
    kk = glwe.size
    plan = poly.get_torus_plan_u32(n)
    a = lwe_ct[..., :-1]
    b = lwe_ct[..., -1]
    b_t = _mod_switch_2n(b, n, log_v)
    a_t = _mod_switch_2n(a, n, log_v)
    acc = trivial_glwe(negacyclic_monomial_mul(
        jnp.asarray(test_poly, dtype=U64), 2 * n - b_t, n), glwe)
    kdig = (kk + 1) * radix.count

    def body(i, acc):
        rotated = negacyclic_monomial_mul(acc, a_t[..., i], n)
        diff = rotated - acc          # exact torus subtraction mod 2^64
        digits = torus.signed_decompose(diff, radix.radix_log,
                                        radix.count)     # [l, ..., k+1, N]
        d = jnp.moveaxis(digits, 0, -2)                  # [..., k+1, l, N]
        d = d.reshape(*d.shape[:-3], kdig, n)
        ks = jax.lax.dynamic_index_in_dim(
            bsk.rows, i, 0, keepdims=False)              # [kdig, k+1, kp, N]
        import os
        if kk == 1 and os.environ.get(
                "SUNSCREEN_TPU_TFHE_KSFULL", "0") != "0":
            # OPT-IN megakernel: the step's digit forward transforms,
            # contraction, and inverse as ONE Pallas launch. Measured
            # round 5 (real chip, b64): latency 34.7 ms vs 25.7 and
            # throughput 46.7 vs 51.7 PBS/s for the two-kernel path —
            # the longer sequential body loses more to lost intra-step
            # pipelining than the saved launch gains (same verdict as
            # the BFV ks_full). Kept selectable + selfchecked.
            upd = plan.ks_full(plan.signed_to_rns(d), ks[:, 0], ks[:, 1])
        elif kk == 1:
            d_hat = plan.fwd(plan.signed_to_rns(d))      # [..., kdig, kp, N]
            # the fused pmntt keyswitch kernel: digit contraction +
            # inverse transform in one VMEM residency
            upd = plan.contract_inv(d_hat, ks[:, 0], ks[:, 1])
        else:
            # generic GLWE size: u64 contraction (each product < q^2 <
            # 2^60, kdig <= 16 terms cannot wrap) + plain inverse
            from sunscreen_tpu.math import modular as m
            d_hat = plan.fwd(plan.signed_to_rns(d))      # [..., kdig, kp, N]
            kp = plan.base.k
            acc64 = jnp.sum(
                d_hat.astype(U64)[..., :, None, :, :] * ks.astype(U64),
                axis=-4)
            red = m.barrett_reduce_64(
                acc64, plan.base.q64_dev.reshape(kp, 1),
                plan.base.ratio_hi_dev.reshape(kp, 1),
                plan.base.ratio_lo_dev.reshape(kp, 1)).astype(jnp.uint32)
            upd = plan.plan.inv(red)
        return acc + plan.to_torus(upd)                  # wrap add == CMUX

    return jax.lax.fori_loop(0, a.shape[-1], body, acc)


def _mod_switch_2n(x, n: int, log_v: int = 0):
    """Torus u64 -> Z_2N with rounding. `log_v > 0` zeroes the bottom
    log_v bits (rounds to a multiple of 2^log_v) so a multifunctional
    LUT's interleave alignment survives the rotation (reference:
    `lwe_ciphertext_modulus_switch`'s log_v parameter,
    `programmable_bootstrapping.rs:340-373`)."""
    shift = TORUS_BITS - (n.bit_length() - 1) - 1 + log_v
    half = U64(1) << jnp.uint64(shift - 1)
    y = ((x + half) >> jnp.uint64(shift)).astype(I64) << log_v
    return y % (2 * n)


def blind_rotate(test_poly, lwe_ct, bsk, glwe: GlweDef,
                 radix: RadixDecomposition, log_v: int = 0):
    """acc = X^{-b~} * v; for each i: acc = CMUX(bsk_i, acc,
    X^{a~_i} * acc). Returns GLWE([..., k+1, N]) whose phase is
    v * X^{-phase~} (reference: `blind_rotation.rs:202`).

    Accepts either a raw u64 GGSW stack (exact CRT path per CMUX) or an
    NttBootstrapKey (pre-transformed u32 NTT domain — the fast TPU
    path; bit-identical outputs)."""
    if isinstance(bsk, NttBootstrapKey):
        return _blind_rotate_ntt(test_poly, lwe_ct, bsk, glwe, radix,
                                 log_v)
    n = glwe.poly_degree
    a = lwe_ct[..., :-1]
    b = lwe_ct[..., -1]
    b_t = _mod_switch_2n(b, n, log_v)
    a_t = _mod_switch_2n(a, n, log_v)
    acc = trivial_glwe(negacyclic_monomial_mul(
        jnp.asarray(test_poly, dtype=U64), 2 * n - b_t, n), glwe)

    def body(i, acc):
        rotated = negacyclic_monomial_mul(acc, a_t[..., i], n)
        return cmux(bsk[i], acc, rotated, glwe, radix)

    return jax.lax.fori_loop(0, a.shape[-1], body, acc)


def sample_extract(glwe_ct, params: GlweDef, coeff: int = 0):
    """GLWE -> LWE of coefficient `coeff` under the flattened key
    (reference: `sample_extract`; the coeff > 0 form serves multi-value
    PBS, which reads consecutive coefficients of one blind rotation).

    a'_{j,t} = mask_j[(coeff - t) mod N], negated where t > coeff
    (the X^N = -1 wrap)."""
    kk, n = params.size, params.poly_degree
    h = int(coeff)
    assert 0 <= h < n
    masks = glwe_ct[..., :kk, :]
    body = glwe_ct[..., kk, :]
    # flip(roll(m, -(h+1)))[t] = m[(h - t) mod N]
    rev = jnp.flip(jnp.roll(masks, -(h + 1), axis=-1), axis=-1)
    if h + 1 < n:
        neg_tail = (-rev[..., :, h + 1:].astype(I64)).astype(U64)
        a = jnp.concatenate([rev[..., :, :h + 1], neg_tail], axis=-1)
    else:
        a = rev
    a = a.reshape(*a.shape[:-2], kk * n)
    return jnp.concatenate([a, body[..., h:h + 1]], axis=-1)


def flatten_glwe_sk(glwe_sk):
    return glwe_sk.reshape(-1)


def generate_keyswitch_key(from_sk, to_sk, to_params: LweDef,
                           radix: RadixDecomposition, key):
    """KSK_{i,j} = LWE_to(from_sk_i * B_j)
    (reference: `generate_ksk`)."""
    n_in = from_sk.shape[0]
    rows = []
    for i in range(n_in):
        lvl = []
        for j in range(radix.count):
            bj = U64(1) << jnp.uint64(
                TORUS_BITS - (j + 1) * radix.radix_log)
            msg = from_sk[i] * bj
            lvl.append(encrypt_lwe(
                msg, to_sk, to_params,
                jax.random.fold_in(key, i * radix.count + j)))
        rows.append(jnp.stack(lvl))
    return jnp.stack(rows)  # [n_in, l, n_out+1]


def keyswitch_lwe_to_lwe(ct, ksk, to_params: LweDef,
                         radix: RadixDecomposition):
    """(reference: `keyswitch_lwe_to_lwe`)."""
    a = ct[..., :-1]
    b = ct[..., -1]
    digits = torus.signed_decompose(a, radix.radix_log, radix.count)
    # result = (0, b) - sum_{i,j} d_{i,j} * KSK_{i,j}
    terms = digits.astype(U64)[..., None] * ksk.swapaxes(0, 1)
    # digits: [l, ..., n_in]; ksk.swap: [l, n_in, n_out+1]
    acc = jnp.sum(terms.astype(U64), axis=(0, -2))
    out = -acc
    return out.at[..., -1].add(b)


# --------------------------------------------------------------------------
# programmable bootstrapping
# --------------------------------------------------------------------------

def test_polynomial_for(fn, plaintext_bits: int, glwe: GlweDef,
                        output_bits: int | None = None):
    """Test polynomial v with v's blocks encoding fn over the message
    space [0, 2^bits). Messages must keep the top (padding) bit clear
    for negacyclic correctness (reference univariate PBS convention).

    `output_bits` selects the OUTPUT value encoding independently of
    the input layout. Default (None) keeps this engine's chainable
    convention: outputs re-encoded at `plaintext_bits` (padding bit
    clear), directly usable as the next PBS input, at the cost of one
    bit of decode margin (boundary 2^(63-bits+1)). The reference's
    `generate_lut` (`programmable_bootstrapping.rs:126-173`,
    `PlaintextBits` = MESSAGE bits) encodes outputs WITHOUT the
    padding bit — `output_bits = plaintext_bits - 1` reproduces it and
    doubles the noise margin (what lets the reference's doctest run
    radix (3,4) at LWE_512_80/GLWE_1_1024_80); decode such outputs
    with `output_bits`."""
    import numpy as np
    n = glwe.poly_degree
    space = 1 << plaintext_bits
    out_bits = plaintext_bits if output_bits is None else output_bits
    v = np.zeros(n, dtype=np.uint64)
    block = n // (space // 2) if space > 1 else n
    for i in range(n):
        msg = (i // block) % space if space > 1 else 0
        val = int(fn(msg)) % (1 << out_bits)
        v[i] = val << (TORUS_BITS - out_bits)
    # center bins: rotate by half a block (negacyclic)
    half = block // 2
    if half:
        rolled = np.roll(v, -half)
        rolled[-half:] = (-rolled[-half:].astype(np.int64)).astype(
            np.uint64)
        v = rolled
    return jnp.asarray(v)


def programmable_bootstrap_univariate(
        lwe_ct, test_poly, bsk, ksk, lwe: LweDef, glwe: GlweDef,
        pbs_radix: RadixDecomposition, ks_radix: RadixDecomposition):
    """LWE -> blind rotate -> sample extract -> keyswitch -> LWE
    (reference: `programmable_bootstrapping.rs:288`)."""
    rotated = blind_rotate(test_poly, lwe_ct, bsk, glwe, pbs_radix)
    extracted = sample_extract(rotated, glwe)
    return keyswitch_lwe_to_lwe(extracted, ksk, lwe, ks_radix)


def test_polynomial_multi(fns, plaintext_bits: int, glwe: GlweDef):
    """Multifunctional test polynomial: the v functions are interleaved
    within each message block so ONE blind rotation evaluates all of
    them — output j is read by `sample_extract(.., coeff=j)`
    (reference: `generate_lut` with multiple maps,
    `programmable_bootstrapping.rs:126-170`, and the
    `trivivial_multifunctional` entity constructor,
    `entities/univariate_lookup_table.rs:52-77`).

    Layout matches `test_polynomial_for`'s centered-bin convention:
    the interleave index is assigned POST-centering so the extracted
    coefficients 0..v-1 sit mid-block at the rotation's landing point.
    Requires ceil_pow2(len(fns)) <= block/2 so all outputs land inside
    one message bin."""
    import numpy as np
    n = glwe.poly_degree
    space = 1 << plaintext_bits
    block = n // (space // 2) if space > 1 else n
    half = block // 2
    v = len(fns)
    assert v >= 1
    ceil_v = 1 << (v - 1).bit_length()
    assert ceil_v <= max(1, block // 2), (
        f"{v} functions need blocks >= {2 * ceil_v} coefficients "
        f"(N={n}, bits={plaintext_bits} gives block={block})")
    out = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        idx = i + half
        wrap = idx >= n
        idx_m = idx - n if wrap else idx
        msg = (idx_m // block) % space if space > 1 else 0
        fid = i % ceil_v
        val = int(fns[fid](msg)) % space if fid < v else 0
        enc = val << (TORUS_BITS - plaintext_bits)
        out[i] = (-enc) % (1 << 64) if wrap else enc
    return jnp.asarray(out)


def programmable_bootstrap_multifunctional(
        lwe_ct, test_poly_multi, n_fns: int, bsk, ksk, lwe: LweDef,
        glwe: GlweDef, pbs_radix: RadixDecomposition,
        ks_radix: RadixDecomposition):
    """Multi-value PBS: ONE blind rotation, `n_fns` sample extractions
    at consecutive coefficients, batched keyswitch. Returns
    [n_fns, lwe_n+1] — row j encrypts fns[j](m) (reference: the
    multifunctional LUT consumed by `generalized_programmable_bootstrap`
    and friends, `programmable_bootstrapping.rs:34-170`)."""
    log_v = (n_fns - 1).bit_length()
    rotated = blind_rotate(test_poly_multi, lwe_ct, bsk, glwe,
                           pbs_radix, log_v=log_v)
    extracted = jnp.stack(
        [sample_extract(rotated, glwe, coeff=j) for j in range(n_fns)])
    return jax.vmap(
        lambda c: keyswitch_lwe_to_lwe(c, ksk, lwe, ks_radix))(extracted)


def test_polynomial_torus(fn_torus, plaintext_bits: int, glwe: GlweDef):
    """Like `test_polynomial_for` but fn returns raw torus values
    (needed by circuit bootstrapping to emit m * B_j)."""
    import numpy as np
    n = glwe.poly_degree
    space = 1 << plaintext_bits
    block = n // (space // 2) if space > 1 else n
    v = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        msg = (i // block) % space if space > 1 else 0
        v[i] = np.uint64(int(fn_torus(msg)) % (1 << 64))
    half = block // 2
    if half:
        rolled = np.roll(v, -half)
        rolled[-half:] = (-rolled[-half:].astype(np.int64)).astype(
            np.uint64)
        v = rolled
    return jnp.asarray(v)


def bivariate_test_polynomial(fn, plaintext_bits: int, glwe: GlweDef,
                              carry_bits: int | None = None):
    """Test polynomial for f(a, b) over the packed message
    a * 2^carry_bits + b (reference: `generate_bivariate_lut`,
    `programmable_bootstrapping.rs:429-452` — their
    plaintext_bits <= carry_bits precondition, with carry_bits
    defaulting to plaintext_bits for the symmetric packing)."""
    if carry_bits is None:
        carry_bits = plaintext_bits
    assert plaintext_bits <= carry_bits, (
        "plaintext_bits must be <= carry_bits "
        "(reference precondition, programmable_bootstrapping.rs:439)")
    total_bits = plaintext_bits + carry_bits

    def f2(m):
        hi = m >> carry_bits
        lo = m & ((1 << carry_bits) - 1)
        return int(fn(hi, lo)) % (1 << total_bits)

    return test_polynomial_for(f2, total_bits, glwe)


def programmable_bootstrap_bivariate(
        ct_a, ct_b, fn, bsk, ksk, lwe: LweDef, glwe: GlweDef,
        pbs_radix: RadixDecomposition, ks_radix: RadixDecomposition,
        plaintext_bits: int, carry_bits: int | None = None,
        test_poly=None):
    """f(a, b) via message packing: combined = a * 2^carry + b, then a
    univariate PBS over plaintext_bits + carry_bits (reference:
    `programmable_bootstrapping.rs` bivariate variant).

    IMPORTANT: both inputs must be encrypted at the packed total
    precision (i.e. `torus.encode(v, plaintext_bits + carry_bits)`) so
    the packing shift does not overflow the encoding; the top bit of
    the packed space is the padding bit. Pass `test_poly` (from
    `bivariate_test_polynomial` / `BivariateLookupTable`) to reuse a
    precomputed LUT."""
    if carry_bits is None:
        carry_bits = plaintext_bits
    packed = lwe_add(lwe_scalar_mul(ct_a, 1 << carry_bits), ct_b)
    if test_poly is None:
        test_poly = bivariate_test_polynomial(fn, plaintext_bits, glwe,
                                              carry_bits)
    return programmable_bootstrap_univariate(
        packed, test_poly, bsk, ksk, lwe, glwe, pbs_radix, ks_radix)


# --------------------------------------------------------------------------
# private functional keyswitching (LWE -> GLWE)
# --------------------------------------------------------------------------

def generate_private_functional_keyswitch_key(
        f_poly, from_sk, to_glwe_sk, to_params: GlweDef,
        radix: RadixDecomposition, key):
    """Keys K_{i,j} = GLWE(f(s_i) * B_j) for the secret linear function
    f(x) = f_poly * x (f_poly an integer polynomial), plus the body
    keys K_{n,j} = GLWE(f(1) * B_j) — the function stays hidden inside
    the keys (reference: `ops/keyswitch/private_functional_keyswitch`).
    """
    n_in = from_sk.shape[0]
    f_poly = jnp.asarray(f_poly, dtype=jnp.int64)
    rows = []
    for i in range(n_in + 1):
        if i < n_in:
            # f(s_i) = f_poly * s_i (scalar bit)
            msg = f_poly * from_sk[i].astype(jnp.int64)
        else:
            msg = f_poly
        msg_t = msg.astype(U64)
        lvl = []
        for j in range(radix.count):
            bj = U64(1) << jnp.uint64(
                TORUS_BITS - (j + 1) * radix.radix_log)
            lvl.append(encrypt_glwe(
                msg_t * bj, to_glwe_sk, to_params,
                jax.random.fold_in(key, i * radix.count + j)))
        rows.append(jnp.stack(lvl))
    return jnp.stack(rows)  # [n_in+1, l, k+1, N]


def private_functional_keyswitch(ct, pfksk, to_params: GlweDef,
                                 radix: RadixDecomposition):
    """LWE(m) -> GLWE(f(m)): result = decomp(b).K_n
    - sum_i decomp(a_i).K_i, so phase = f(b) - sum a_i f(s_i) ~ f(m)."""
    a = ct[..., :-1]
    b = ct[..., -1]
    n_in = a.shape[-1]
    digits_a = torus.signed_decompose(a, radix.radix_log, radix.count)
    digits_b = torus.signed_decompose(b, radix.radix_log, radix.count)
    # sum over (i, j): digits [l, n_in] x pfksk [n_in, l, k+1, N]
    keys_a = jnp.swapaxes(pfksk[:n_in], 0, 1)  # [l, n_in, k+1, N]
    term_a = jnp.sum(
        digits_a.astype(U64)[..., None, None] * keys_a, axis=(0, 1))
    term_b = jnp.sum(
        digits_b.astype(U64)[:, None, None] * pfksk[n_in], axis=0)
    return term_b - term_a


# --------------------------------------------------------------------------
# circuit bootstrapping + scheme switching
# --------------------------------------------------------------------------

def generate_cbs_pfksk(glwe_extracted_sk, to_glwe_sk, glwe: GlweDef,
                       radix: RadixDecomposition, key):
    """Private functional keyswitch keys for circuit bootstrapping: one
    pfksk per GGSW row — mask row i applies f_i(x) = -s'_i(X) * x,
    body row applies f(x) = x (reference: `generate_cbs_ksk`)."""
    import numpy as np
    kk = glwe.size
    n = glwe.poly_degree
    keys_out = []
    for i in range(kk + 1):
        if i < kk:
            f_poly = -np.asarray(to_glwe_sk[i]).astype(np.int64)
        else:
            f_poly = np.zeros(n, dtype=np.int64)
            f_poly[0] = 1
        keys_out.append(generate_private_functional_keyswitch_key(
            jnp.asarray(f_poly), glwe_extracted_sk, to_glwe_sk, glwe,
            radix, jax.random.fold_in(key, i)))
    return jnp.stack(keys_out)  # [k+1, n_in+1, l, k+1, N]


def circuit_bootstrap(lwe_ct, bsk, cbs_pfksk, lwe: LweDef,
                      glwe: GlweDef, pbs_radix: RadixDecomposition,
                      out_radix: RadixDecomposition,
                      pfks_radix: RadixDecomposition):
    """LWE(bit) -> GGSW(bit): for each output level j, a PBS emits
    LWE(m * B_j) under the extracted key; a private functional
    keyswitch then maps it into each GGSW row (reference:
    `circuit_bootstrapping.rs:148-317`)."""
    kk = glwe.size
    rows = [[None] * out_radix.count for _ in range(kk + 1)]
    for j in range(out_radix.count):
        bj = 1 << (TORUS_BITS - (j + 1) * out_radix.radix_log)
        tp = test_polynomial_torus(lambda m: m * bj, 2, glwe)
        rotated = blind_rotate(tp, lwe_ct, bsk, glwe, pbs_radix)
        extracted = sample_extract(rotated, glwe)  # LWE(m*B_j), key kN
        for i in range(kk + 1):
            rows[i][j] = private_functional_keyswitch(
                extracted, cbs_pfksk[i], glwe, pfks_radix)
    return jnp.stack([jnp.stack(r) for r in rows])


def generate_scheme_switch_key(glwe_sk, glwe: GlweDef,
                               radix: RadixDecomposition, key):
    """GGSW(-s_i) per mask index (reference `scheme_switch.rs` uses
    GLEV(s_i s_j) products; this equivalent form reuses the external
    product)."""
    import numpy as np
    out = []
    for i in range(glwe.size):
        neg_si = (-np.asarray(glwe_sk[i]).astype(np.int64))
        out.append(encrypt_ggsw(jnp.asarray(neg_si).astype(U64), glwe_sk,
                                glwe, radix,
                                jax.random.fold_in(key, i)))
    return jnp.stack(out)  # [k, k+1, l, k+1, N]


def scheme_switch(glev, ssk, glwe: GlweDef,
                  ssk_radix: RadixDecomposition,
                  out_radix: RadixDecomposition):
    """GLEV(m) -> GGSW(m): mask rows (i, j) = GGSW(-s_i) ⊡ GLEV_j,
    body rows = GLEV_j (reference: `scheme_switch.rs:22-254`).

    `ssk_radix` (the switch keys' decomposition) must be much finer
    than `out_radix` (the produced GGSW's level structure): the
    external-product decomposition error is amplified by ||s_i||_1 ~
    N/2, so ssk_radix needs ~log2(N) more precision bits — the reason
    the reference's scheme-switch keys get their own radix params."""
    kk = glwe.size
    rows = []
    for i in range(kk):
        rows.append(jnp.stack([
            external_product(ssk[i], glev[j], glwe, ssk_radix)
            for j in range(out_radix.count)]))
    rows.append(glev)
    return jnp.stack(rows)


# --------------------------------------------------------------------------
# GLWE keyswitch / public functional keyswitch / LWE public keys /
# generalized PBS (round-2 completion items)
# --------------------------------------------------------------------------

def generate_glwe_keyswitch_key(from_sk, to_sk, to_params: GlweDef,
                                radix: RadixDecomposition, key):
    """GKSK_i = GLEV(from_sk_i) under to_sk, one per from-key mask poly
    (reference: `ops/keyswitch/glwe_keyswitch.rs` —
    `generate_keyswitch_key_glwe`). Shape [k_from, l, k+1, N]."""
    rows = []
    for i in range(from_sk.shape[0]):
        rows.append(encrypt_glev(from_sk[i].astype(U64), to_sk,
                                 to_params, radix,
                                 jax.random.fold_in(key, i)))
    return jnp.stack(rows)


def keyswitch_glwe_to_glwe(ct, gksk, to_params: GlweDef,
                           radix: RadixDecomposition):
    """GLWE under s -> GLWE under s': (0, b) - sum_i <decomp(a_i),
    GLEV(s_i)> (reference: `keyswitch_glwe_to_glwe`,
    glwe_keyswitch.rs). Exact CRT-NTT polynomial products."""
    plan = get_torus_plan(to_params.poly_degree)
    k_from = gksk.shape[0]
    a = ct[..., :k_from, :]
    b = ct[..., -1, :]
    acc_rns = None
    for i in range(k_from):
        digits = torus.signed_decompose(a[..., i, :], radix.radix_log,
                                        radix.count)
        for j in range(radix.count):
            d_hat = plan.fwd(plan.signed_to_rns(digits[j]))
            row_hat = plan.fwd(plan.torus_to_rns(gksk[i, j]))
            term = plan.pointwise(d_hat[..., None, :, :], row_hat)
            acc_rns = term if acc_rns is None else plan.add(acc_rns,
                                                            term)
    acc = plan.to_torus(plan.plan.inv(acc_rns))
    out = -acc
    return out.at[..., -1, :].add(b)


def generate_public_functional_keyswitch_key(
        from_sk, to_glwe_sk, to_params: GlweDef,
        radix: RadixDecomposition, key):
    """PubFKSK_i = GLEV(s_i) under the target GLWE key, one per source
    LWE mask index (reference:
    `ops/keyswitch/public_functional_keyswitch.rs` — the functional
    morphism stays PUBLIC and is applied at switch time, unlike the
    private variant whose keys hide it)."""
    n_in = from_sk.shape[0]
    rows = []
    for i in range(n_in):
        msg = jnp.zeros(to_params.poly_degree, dtype=U64)
        msg = msg.at[0].set(from_sk[i].astype(U64))
        rows.append(encrypt_glev(msg, to_glwe_sk, to_params, radix,
                                 jax.random.fold_in(key, i)))
    return jnp.stack(rows)  # [n_in, l, k+1, N]


def public_functional_keyswitch(cts, pub_ksk, f_weights,
                                to_params: GlweDef,
                                radix: RadixDecomposition):
    """p LWE ciphertexts -> one GLWE of f(m_1..m_p), f the PUBLIC
    linear morphism f(x)[c] = sum_j x_j * f_weights[j][c] (integer
    weight polys; reference `public_functional_keyswitch`).

    out = (0, f(b)) - sum_i <decomp(f(a_.i)), GLEV(s_i)>.
    """
    plan = get_torus_plan(to_params.poly_degree)
    cts = jnp.asarray(cts)                   # [p, n+1]
    w = jnp.asarray(f_weights, dtype=U64)    # [p, N]
    a = cts[..., :-1]                        # [p, n]
    b = cts[..., -1]                         # [p]
    n_in = a.shape[-1]
    # f applied across the p ciphertexts (linear combination of weight
    # polys; wrapping u64 arithmetic is exact on the torus)
    fa = jnp.einsum("pn,pc->nc", a, w)       # [n, N] torus polys
    fb = jnp.einsum("p,pc->c", b, w)         # [N]
    acc_rns = None
    for i in range(n_in):
        digits = torus.signed_decompose(fa[i], radix.radix_log,
                                        radix.count)
        for j in range(radix.count):
            d_hat = plan.fwd(plan.signed_to_rns(digits[j]))
            row_hat = plan.fwd(plan.torus_to_rns(pub_ksk[i, j]))
            term = plan.pointwise(d_hat[..., None, :, :], row_hat)
            acc_rns = term if acc_rns is None else plan.add(acc_rns,
                                                            term)
    acc = plan.to_torus(plan.plan.inv(acc_rns))
    out = -acc
    return out.at[..., -1, :].add(fb)


def generate_lwe_public_key(sk, params: LweDef, count: int, key):
    """LWE public key = `count` encryptions of zero (reference:
    `entities/lwe_public_key.rs`; count ~ n log n for leftover-hash
    security)."""
    keys = jax.random.split(key, count)
    return jax.vmap(lambda k: encrypt_lwe(U64(0), sk, params, k))(keys)


def encrypt_lwe_public(msg_torus, pk, params: LweDef, key):
    """Public LWE encryption: ct = sum_i r_i * pk_i + (0, m) + e' with
    binary r (reference: `encrypt_lwe_secret_with_public_key`)."""
    k_r, k_e = jax.random.split(key)
    count = pk.shape[0]
    r = jax.random.bernoulli(k_r, 0.5, (count,)).astype(U64)
    ct = jnp.sum(r[:, None] * pk, axis=0)
    e = _noise(k_e, (), params.std)
    return ct.at[..., -1].add(jnp.asarray(msg_torus, dtype=U64) + e)


def generalized_programmable_bootstrap(
        lwe_ct, fn, plaintext_bits: int, bsk, lwe: LweDef,
        glwe: GlweDef, pbs_radix: RadixDecomposition,
        out_radix: RadixDecomposition):
    """Generalized PBS: emits a LEV-style stack of extracted LWEs
    [l_out, kN+1], level j encrypting f(m) * B_j under the extracted
    GLWE key (reference: `programmable_bootstrapping.rs:34-572` — the
    multi-level generalized form consumed by circuit bootstrapping;
    the univariate PBS is the l_out=1, delta-scaled special case).

    `fn` must map [0, 2^(bits-1)) into [0, 2^(bits-1)) — the top
    (padding) bit stays clear, the usual negacyclic PBS contract."""
    outs = []
    for j in range(out_radix.count):
        bj = 1 << (TORUS_BITS - (j + 1) * out_radix.radix_log)
        tp = test_polynomial_torus(lambda mm: fn(mm) * bj,
                                   plaintext_bits, glwe)
        rotated = blind_rotate(tp, lwe_ct, bsk, glwe, pbs_radix)
        outs.append(sample_extract(rotated, glwe))
    return jnp.stack(outs)
