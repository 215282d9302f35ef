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

from sunscreen_tpu.tfhe import torus
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
    """sum_j masks[j] * sk[j] (negacyclic, exact)."""
    plan = get_torus_plan(params.poly_degree)
    acc = None
    for j in range(params.size):
        term_rns = plan.pointwise(
            plan.fwd(plan.signed_to_rns(sk[j].astype(I64))),
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


# --------------------------------------------------------------------------
# GGSW + external product
# --------------------------------------------------------------------------

def encrypt_ggsw(msg_int, sk, params: GlweDef,
                 radix: RadixDecomposition, key):
    """msg_int: small integer (scalar). Returns
    [k+1, l, k+1, N] — rows (i, j) = GLWE(0) + msg * B_j * u_i."""
    n = params.poly_degree
    kk = params.size
    rows = []
    msg = int(msg_int)
    for i in range(kk + 1):
        lvl = []
        for j in range(radix.count):
            sub = jax.random.fold_in(key, i * radix.count + j)
            z = encrypt_glwe(jnp.zeros(n, dtype=U64), sk, params, sub)
            bj = U64(1) << jnp.uint64(
                TORUS_BITS - (j + 1) * radix.radix_log)
            unit = jnp.zeros((kk + 1, n), dtype=U64)
            unit = unit.at[i, 0].set(U64(msg % (1 << 64)) * bj)
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


def _mod_switch_2n(x, n: int):
    """Torus u64 -> Z_2N with rounding."""
    shift = TORUS_BITS - (n.bit_length() - 1) - 1  # log2(2N) kept bits
    half = U64(1) << jnp.uint64(shift - 1)
    return ((x + half) >> jnp.uint64(shift)).astype(I64) % (2 * n)


def blind_rotate(test_poly, lwe_ct, bsk, glwe: GlweDef,
                 radix: RadixDecomposition):
    """acc = X^{-b~} * v; for each i: acc = CMUX(bsk_i, acc,
    X^{a~_i} * acc). Returns GLWE([..., k+1, N]) whose phase is
    v * X^{-phase~} (reference: `blind_rotation.rs:202`)."""
    n = glwe.poly_degree
    a = lwe_ct[..., :-1]
    b = lwe_ct[..., -1]
    b_t = _mod_switch_2n(b, n)
    a_t = _mod_switch_2n(a, n)
    acc = trivial_glwe(negacyclic_monomial_mul(
        jnp.asarray(test_poly, dtype=U64), 2 * n - b_t, n), glwe)

    def body(i, acc):
        rotated = negacyclic_monomial_mul(acc, a_t[..., i], n)
        return cmux(bsk[i], acc, rotated, glwe, radix)

    return jax.lax.fori_loop(0, a.shape[-1], body, acc)


def sample_extract(glwe_ct, params: GlweDef, coeff: int = 0):
    """GLWE -> LWE of coefficient `coeff` under the flattened key
    (reference: `sample_extract`)."""
    assert coeff == 0, "only coefficient 0 extraction (reference parity)"
    kk, n = params.size, params.poly_degree
    masks = glwe_ct[..., :kk, :]
    body = glwe_ct[..., kk, :]
    # a'_{j,0} = mask_j[0]; a'_{j,t} = -mask_j[N-t] for t > 0
    flipped = jnp.flip(masks[..., :, 1:], axis=-1)
    neg = (-flipped.astype(I64)).astype(U64)
    a = jnp.concatenate([masks[..., :, :1], neg], axis=-1)
    a = a.reshape(*a.shape[:-2], kk * n)
    return jnp.concatenate([a, body[..., :1]], axis=-1)


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

def test_polynomial_for(fn, plaintext_bits: int, glwe: GlweDef):
    """Test polynomial v with v's blocks encoding fn over the message
    space [0, 2^bits). Messages must keep the top (padding) bit clear
    for negacyclic correctness (reference univariate PBS convention)."""
    import numpy as np
    n = glwe.poly_degree
    space = 1 << plaintext_bits
    block = n // (space // 2) if space > 1 else n
    v = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        msg = (i // block) % space if space > 1 else 0
        val = int(fn(msg)) % space
        v[i] = val << (TORUS_BITS - plaintext_bits)
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
