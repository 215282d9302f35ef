"""BFV key generation: secret/public keys, relinearization + Galois keys.

Replaces `seal_fhe/src/key_generator.rs:17-741` (KeyGenerator,
Compact{Public,Relin,Galois}Keys) and SEAL's C++ keygen. Key switching
uses the RNS-digit decomposition with one special prime p_sp (SEAL's
trailing coeff modulus): key for digit i encrypts p_sp * D_i * w where
D_i is the CRT idempotent of q_i — see `context.BfvContext.ksk_factor`.

All key material is sampled from a jax PRNG key (deterministic; the
reference's `deterministic` feature is the default here) and stored in
NTT domain for zero-cost use inside evaluator ops.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from sunscreen_tpu.bfv.context import BfvContext
from sunscreen_tpu.math import modular as m
from sunscreen_tpu.math import sampling


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SecretKey:
    s: jnp.ndarray             # int8 [N] ternary
    s_ntt_q: jnp.ndarray       # [k, N] NTT over Q
    s_ntt_key: jnp.ndarray     # [k+1, N] NTT over Q ∪ {p_sp}


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PublicKey:
    p0: jnp.ndarray            # [k, N] NTT domain
    p1: jnp.ndarray            # [k, N] NTT domain


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class KswKey:
    """One key-switching key: digit-major [k, k+1, N], NTT domain."""
    k0: jnp.ndarray
    k1: jnp.ndarray


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GaloisKeys:
    keys: dict[int, KswKey] = field(default_factory=dict)

    def __getitem__(self, g: int) -> KswKey:
        return self.keys[g]

    def __contains__(self, g: int) -> bool:
        return g in self.keys


def gen_secret_key(ctx: BfvContext, key) -> SecretKey:
    s = sampling.ternary(key, (ctx.n,))
    s_q = sampling.signed_to_rns(s, ctx.q_base.q_dev)
    s_key = sampling.signed_to_rns(s, ctx.key_base.q_dev)
    return SecretKey(s, ctx.plan_q.fwd(s_q), ctx.plan_key.fwd(s_key))


def _uniform_ntt(ctx, key, base):
    return sampling.uniform_mod_q(key, (ctx.n,), base)


def _noise_ntt(ctx, key, base, plan):
    e = sampling.cbd(key, (ctx.n,))
    return plan.fwd(sampling.signed_to_rns(e, base.q_dev))


def gen_public_key(ctx: BfvContext, sk: SecretKey, key) -> PublicKey:
    k_a, k_e = jax.random.split(key)
    a = _uniform_ntt(ctx, k_a, ctx.q_base)  # uniform is NTT-domain invariant
    e = _noise_ntt(ctx, k_e, ctx.q_base, ctx.plan_q)
    q = ctx.q_base.q_dev.reshape(ctx.k, 1)
    p0 = m.neg_mod(
        m.add_mod(ctx.plan_q.pointwise_mul(a, sk.s_ntt_q), e, q), q)
    return PublicKey(p0, a)


def gen_ksw_key(ctx: BfvContext, sk: SecretKey, w_ntt_key, key) -> KswKey:
    """Key switching key for target w (given in NTT form over the key
    base): for each digit i, k0[i] = -(a_i*s + e_i) + p_sp*D_i*w."""
    kb = ctx.key_base
    q = kb.q_dev.reshape(ctx.k + 1, 1)
    k0s, k1s = [], []
    for i in range(ctx.k):
        k_a, k_e = jax.random.split(jax.random.fold_in(key, i))
        a = _uniform_ntt(ctx, k_a, kb)
        e = _noise_ntt(ctx, k_e, kb, ctx.plan_key)
        fac = ctx.ksk_factor[i].reshape(ctx.k + 1, 1)
        body = m.w_mul_mod(w_ntt_key, fac, q,
                           kb.c0_dev.reshape(ctx.k + 1, 1),
                           kb.c1_dev.reshape(ctx.k + 1, 1))
        mask = m.add_mod(ctx.plan_key.pointwise_mul(a, sk.s_ntt_key), e, q)
        k0s.append(m.sub_mod(body, mask, q))
        k1s.append(a)
    return KswKey(jnp.stack(k0s), jnp.stack(k1s))


def gen_relin_key(ctx: BfvContext, sk: SecretKey, key) -> KswKey:
    s2 = ctx.plan_key.pointwise_mul(sk.s_ntt_key, sk.s_ntt_key)
    return gen_ksw_key(ctx, sk, s2, jax.random.fold_in(key, 0x5e11))


def gen_galois_keys(ctx: BfvContext, sk: SecretKey, key,
                    elements: tuple[int, ...]) -> GaloisKeys:
    """Keys for a(x) -> a(x^g) keyswitching, one per Galois element.

    vmapped over elements so the traced keygen graph contains ONE
    keyswitch-key body regardless of how many rotation keys are made
    (the reference generates each sequentially; compile-time relevant
    here because keygen is one fused XLA computation)."""
    import numpy as np
    idx_stack = jnp.asarray(np.stack(
        [ctx.galois_table_host(g)[0] for g in elements]))
    neg_stack = jnp.asarray(np.stack(
        [ctx.galois_table_host(g)[1] for g in elements]))

    def one(idx, neg, k):
        s_perm = jnp.where(neg, -sk.s[idx], sk.s[idx])
        w = ctx.plan_key.fwd(
            sampling.signed_to_rns(s_perm, ctx.key_base.q_dev))
        return gen_ksw_key(ctx, sk, w, k)

    stacked = jax.vmap(one)(
        idx_stack, neg_stack,
        jax.vmap(lambda g: jax.random.fold_in(key, g))(
            jnp.asarray(elements)))
    return GaloisKeys({
        g: KswKey(stacked.k0[i], stacked.k1[i])
        for i, g in enumerate(elements)})


def default_rotation_elements(ctx: BfvContext) -> tuple[int, ...]:
    """All power-of-two row rotations both directions + column swap
    (mirrors SEAL `GaloisTool::get_elts_all` used by
    `KeyGenerator::create_galois_keys`)."""
    n = ctx.n
    half = n // 2
    elems = {ctx.rotate_columns_element}
    step = 1
    while step < half:
        elems.add(ctx.rotate_rows_element(step))
        elems.add(ctx.rotate_rows_element(-step))
        step *= 2
    return tuple(sorted(elems))
