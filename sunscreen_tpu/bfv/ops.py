"""BFV evaluator ops as pure jittable array functions.

Replaces the SEAL C++ evaluator + `seal_fhe/src/evaluator.rs:12-279`
(add/sub/negate/multiply/relinearize/rotate/multiply_plain/...) and
`encryptor_decryptor.rs` (encrypt/decrypt/invariant noise). Where SEAL
dispatches one FFI call per IR node (reference hot loop:
`sunscreen_runtime/src/run.rs:166-336`), here every op is a pure function
on uint64 arrays — a whole FHE program composes into ONE fused XLA
computation (SURVEY.md §7 architecture stance).

Ciphertext layout: uint64 [..., n_comp, k, N] in coefficient domain
(SEAL BFV convention). Plaintexts: uint64 [..., N] with coeffs in [0, t).
Multiplication is the HPS RNS variant with exact fixed-point corrections
(see `sunscreen_tpu.math.rns`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.bfv.context import BfvContext
from sunscreen_tpu.bfv.keys import (GaloisKeys, KswKey, PublicKey, SecretKey)
from sunscreen_tpu.errors import InvalidArgument
from sunscreen_tpu.math import modular as m
from sunscreen_tpu.math import rns, sampling

_FUSED_CACHE: dict = {}


def _fused_pointwise(kind: str, moduli: tuple[int, ...]):
    """Fused u32 pointwise kernels (math/prns.py) on the TPU backend;
    None when the XLA path should run (u64 engine, CPU eager,
    SUNSCREEN_TPU_FUSED_RNS=0)."""
    import os
    if (jax.default_backend() != "tpu"
            or os.environ.get("SUNSCREEN_TPU_FUSED_RNS") == "0"
            or max(q.bit_length() for q in moduli) > 30):
        return None
    key = (kind, moduli)
    if key not in _FUSED_CACHE:
        from sunscreen_tpu.math import prns
        cls = {"tensor3": prns.FusedTensor3,
               "ks": prns.FusedKsInner}[kind]
        _FUSED_CACHE[key] = cls(moduli)
    return _FUSED_CACHE[key]


def _plan_fused(ctx, plan) -> bool:
    """True when the plan's fused-inverse kernels (convolution /
    keyswitch prologues riding the inverse transform) should run:
    pallas NTT mode, unless SUNSCREEN_TPU_FUSED_RNS=0 (all fused
    pipelines) or SUNSCREEN_TPU_FUSE_INV=0 (just these) opts out."""
    import os
    return (getattr(plan, "mode", "") == "pallas"
            and os.environ.get("SUNSCREEN_TPU_FUSED_RNS") != "0"
            and os.environ.get("SUNSCREEN_TPU_FUSE_INV") != "0")


def _env_on(name: str, default: str = "1") -> bool:
    import os
    return os.environ.get(name, default) != "0"


def _scale_convert(ctx, tensor):
    """round(t * tensor / Q) mapped into base Q: one chained Pallas
    kernel on the TPU u32 path, else the two-stage XLA pipeline."""
    import os
    if (tensor.dtype == m.U32 and jax.default_backend() == "tpu"
            and os.environ.get("SUNSCREEN_TPU_FUSED_RNS") != "0"
            and os.environ.get("SUNSCREEN_TPU_FUSE_SC") != "0"):
        if not hasattr(ctx, "_fused_scale_convert_op"):
            from sunscreen_tpu.math import prns
            ctx._fused_scale_convert_op = prns.FusedScaleConvert(
                ctx.scale_mul_to_aux, ctx.conv_aux_to_q)
        return ctx._fused_scale_convert_op(tensor)
    scaled_aux = ctx.scale_mul_to_aux.apply(tensor)
    return ctx.conv_aux_to_q.convert(scaled_aux, centered=True)

U64 = jnp.uint64


def _q(ctx):
    return ctx.q_base.q_dev.reshape(ctx.k, 1)


# --------------------------------------------------------------------------
# plaintext scaling Δm = round(Q*m/t)
# --------------------------------------------------------------------------

def scale_plain(ctx: BfvContext, pt):
    """[..., N] plaintext (coeffs < t) -> [..., k, N] = [round(Q*m/t)]_Q.

    round(Q*m/t) = m*floor(Q/t) + round(m*frac(Q/t)) — the second term via
    exact 128-bit fixed point (SEAL: `multiply_add_plain_with_scaling_
    variant`).
    """
    (r_hi, r_lo), _ = rns.fixed_point_dot(
        pt[..., None, :], ctx.delta_frac_hi, ctx.delta_frac_lo,
        add_half=True)
    q = _q(ctx)
    ptw = pt[..., None, :].astype(ctx.word)
    base = m.reduce_2q(
        m.w_shoup_mul(ptw, ctx.delta_mod_q.reshape(ctx.k, 1),
                      ctx.delta_mod_q_sh.reshape(ctx.k, 1), q), q)
    # r < t <= q_i: single-word correction
    r = jnp.broadcast_to(r_lo.astype(ctx.word)[..., None, :], base.shape)
    return m.add_mod(base, jnp.where(r >= q, r - q, r), q)


# --------------------------------------------------------------------------
# encrypt / decrypt / noise
# --------------------------------------------------------------------------

def encrypt(ctx: BfvContext, pk: PublicKey, pt, key):
    """Asymmetric encryption: c = (pk0*u + e1 + Δm, pk1*u + e2).

    SEAL: `Encryptor::encrypt` (`encryptor_decryptor.rs:82-123`)."""
    k_u, k_e1, k_e2 = jax.random.split(key, 3)
    q = _q(ctx)
    u = ctx.plan_q.fwd(sampling.signed_to_rns(
        sampling.ternary(k_u, (ctx.n,)), ctx.q_base.q_dev))
    c0 = ctx.plan_q.inv(ctx.plan_q.pointwise_mul(pk.p0, u))
    c1 = ctx.plan_q.inv(ctx.plan_q.pointwise_mul(pk.p1, u))
    e1 = sampling.signed_to_rns(sampling.cbd(k_e1, (ctx.n,)),
                                ctx.q_base.q_dev)
    e2 = sampling.signed_to_rns(sampling.cbd(k_e2, (ctx.n,)),
                                ctx.q_base.q_dev)
    c0 = m.add_mod(m.add_mod(c0, e1, q), scale_plain(ctx, pt), q)
    c1 = m.add_mod(c1, e2, q)
    return jnp.stack([c0, c1], axis=-3)


def encrypt_return_components(ctx: BfvContext, pk: PublicKey, pt, key):
    """Like `encrypt` but also returns the randomness (u, e0, e1) as
    small signed int64 polys — needed to build SDLP encryption
    statements (SEAL: `Encryptor::encrypt_return_components`,
    `encryptor_decryptor.rs:82-123`)."""
    k_u, k_e1, k_e2 = jax.random.split(key, 3)
    q = _q(ctx)
    u_small = sampling.ternary(k_u, (ctx.n,))
    e0_small = sampling.cbd(k_e1, (ctx.n,))
    e1_small = sampling.cbd(k_e2, (ctx.n,))
    u = ctx.plan_q.fwd(sampling.signed_to_rns(u_small, ctx.q_base.q_dev))
    c0 = ctx.plan_q.inv(ctx.plan_q.pointwise_mul(pk.p0, u))
    c1 = ctx.plan_q.inv(ctx.plan_q.pointwise_mul(pk.p1, u))
    e0 = sampling.signed_to_rns(e0_small, ctx.q_base.q_dev)
    e1 = sampling.signed_to_rns(e1_small, ctx.q_base.q_dev)
    c0 = m.add_mod(m.add_mod(c0, e0, q), scale_plain(ctx, pt), q)
    c1 = m.add_mod(c1, e1, q)
    ct = jnp.stack([c0, c1], axis=-3)
    return ct, (u_small.astype(jnp.int64), e0_small.astype(jnp.int64),
                e1_small.astype(jnp.int64))


def encrypt_symmetric_return_components(ctx: BfvContext, sk: SecretKey,
                                        pt, key):
    """Symmetric variant: returns (ct, e) with c0 = Δm + r - c1*s - e
    ... i.e. c0 = -(a*s + e) + Δm, c1 = a."""
    k_a, k_e = jax.random.split(key)
    q = _q(ctx)
    a = sampling.uniform_mod_q(k_a, (ctx.n,), ctx.q_base)
    e_small = sampling.cbd(k_e, (ctx.n,))
    e = sampling.signed_to_rns(e_small, ctx.q_base.q_dev)
    as_ = ctx.plan_q.inv(ctx.plan_q.pointwise_mul(ctx.plan_q.fwd(a),
                                                  sk.s_ntt_q))
    c0 = m.add_mod(m.neg_mod(m.add_mod(as_, e, q), q),
                   scale_plain(ctx, pt), q)
    return jnp.stack([c0, a], axis=-3), e_small.astype(jnp.int64)


def encrypt_symmetric(ctx: BfvContext, sk: SecretKey, pt, key):
    """c = (-(a*s + e) + Δm, a). SEAL: `Encryptor::encrypt_symmetric`."""
    k_a, k_e = jax.random.split(key)
    q = _q(ctx)
    a = sampling.uniform_mod_q(k_a, (ctx.n,), ctx.q_base)
    e = sampling.signed_to_rns(sampling.cbd(k_e, (ctx.n,)),
                               ctx.q_base.q_dev)
    as_ = ctx.plan_q.inv(ctx.plan_q.pointwise_mul(ctx.plan_q.fwd(a),
                                                  sk.s_ntt_q))
    c0 = m.add_mod(m.neg_mod(m.add_mod(as_, e, q), q),
                   scale_plain(ctx, pt), q)
    return jnp.stack([c0, a], axis=-3)


def _ct_dot_s(ctx: BfvContext, ct, sk: SecretKey):
    """v = sum_j c_j * s^j mod Q (NTT-domain Horner)."""
    n_comp = ct.shape[-3]
    q = _q(ctx)
    c_hat = ctx.plan_q.fwd(ct)
    acc = c_hat[..., n_comp - 1, :, :]
    for j in range(n_comp - 2, -1, -1):
        acc = m.add_mod(ctx.plan_q.pointwise_mul(acc, sk.s_ntt_q),
                        c_hat[..., j, :, :], q)
    return ctx.plan_q.inv(acc)


def decrypt(ctx: BfvContext, sk: SecretKey, ct):
    """[..., n_comp, k, N] -> [..., N] plaintext coeffs in [0, t)."""
    v = _ct_dot_s(ctx, ct, sk)
    msg, _ = ctx.decrypt_scaler.apply(v)
    return msg


def noise_distance_words(ctx: BfvContext, sk: SecretKey, ct):
    """Max over coefficients of min(f, 1-f) where f is the exact
    128-bit fractional part of t*c(s)/Q — pure integer math (works
    inside jit on any backend). Returns (hi, lo) u64 words of the
    2^-128-scaled distance."""
    v = _ct_dot_s(ctx, ct, sk)
    _, (frac_hi, frac_lo) = ctx.decrypt_scaler.apply(v)
    # 1 - f as a 128-bit value: (2^128 - f)
    neg_lo = (~frac_lo) + U64(1)
    neg_hi = (~frac_hi) + jnp.where(frac_lo == 0, U64(1), U64(0))
    f_smaller = (frac_hi < neg_hi) | ((frac_hi == neg_hi)
                                      & (frac_lo <= neg_lo))
    d_hi = jnp.where(f_smaller, frac_hi, neg_hi)
    d_lo = jnp.where(f_smaller, frac_lo, neg_lo)
    # max over coefficients by (hi, lo) lexicographic order
    m_hi = jnp.max(d_hi, axis=-1)
    is_max_hi = d_hi == m_hi[..., None]
    m_lo = jnp.max(jnp.where(is_max_hi, d_lo, U64(0)), axis=-1)
    return m_hi, m_lo


def invariant_noise_budget(ctx: BfvContext, sk: SecretKey, ct):
    """-log2(2*|v|) where t/Q*(c(s)) = m + v + a*t, |v| in [0, 1/2).

    SEAL: `Decryptor::invariant_noise_budget`
    (`encryptor_decryptor.rs:588+`). The device computes c(s) mod Q; the
    epilogue CRT-composes each coefficient with exact python ints and
    takes floor(log2(Q / (2*max|centered(t*c(s) mod Q)|))) — bit-exact at
    any chain length (the in-jit `noise_distance_words` path is 128-bit
    fixed point, whose one-sided constant error floors the measurable
    budget at ~log2(Q) - 2*max_limb_bits; fine for the >0 runtime guard,
    not for wide chains like N>=8192 where SEAL reports 149+ bits)."""
    v = np.asarray(jax.device_get(_ct_dot_s(ctx, ct, sk)), dtype=np.uint64)
    moduli = ctx.q_base.moduli
    big_q = ctx.q_base.product
    t = int(ctx.t)
    lifts = np.array(
        [p * i % big_q for p, i in zip(ctx.q_base.punctured,
                                       ctx.q_base.inv_punctured)],
        dtype=object)
    k = len(moduli)
    lead = v.shape[:-2]
    flat = v.reshape((-1, k, v.shape[-1])).astype(object)
    out = np.empty((flat.shape[0],), dtype=np.float64)
    for r in range(flat.shape[0]):
        cs = (flat[r] * lifts[:, None]).sum(axis=0) % big_q
        rem = (cs * t) % big_q
        dist = int(np.maximum(np.minimum(rem, big_q - rem), 1).max())
        out[r] = float((big_q // (2 * dist)).bit_length() - 1) \
            if 2 * dist <= big_q else 0.0
    out = out.reshape(lead) if lead else out[0]
    return out


# --------------------------------------------------------------------------
# linear ops
# --------------------------------------------------------------------------

def _pad_components(ct, n_comp):
    have = ct.shape[-3]
    if have == n_comp:
        return ct
    pad = jnp.zeros(ct.shape[:-3] + (n_comp - have,) + ct.shape[-2:],
                    dtype=ct.dtype)
    return jnp.concatenate([ct, pad], axis=-3)


def add(ctx: BfvContext, a, b):
    n_comp = max(a.shape[-3], b.shape[-3])
    return m.add_mod(_pad_components(a, n_comp), _pad_components(b, n_comp),
                     _q(ctx))


def sub(ctx: BfvContext, a, b):
    n_comp = max(a.shape[-3], b.shape[-3])
    return m.sub_mod(_pad_components(a, n_comp), _pad_components(b, n_comp),
                     _q(ctx))


def negate(ctx: BfvContext, a):
    return m.neg_mod(a, _q(ctx))


def add_plain(ctx: BfvContext, ct, pt):
    delta = scale_plain(ctx, pt)
    c0 = m.add_mod(ct[..., 0, :, :], delta, _q(ctx))
    return jnp.concatenate([c0[..., None, :, :], ct[..., 1:, :, :]],
                           axis=-3)


def sub_plain(ctx: BfvContext, ct, pt):
    delta = scale_plain(ctx, pt)
    c0 = m.sub_mod(ct[..., 0, :, :], delta, _q(ctx))
    return jnp.concatenate([c0[..., None, :, :], ct[..., 1:, :, :]],
                           axis=-3)


def multiply_plain(ctx: BfvContext, ct, pt):
    """ct * pt — plaintext lifted verbatim (t < min q_i), NTT pointwise.
    SEAL: `Evaluator::multiply_plain` (no Δ scaling, no relin needed)."""
    pt_hat = ctx.plan_q.fwd(
        jnp.broadcast_to(pt[..., None, :].astype(ctx.word),
                         pt.shape[:-1] + (ctx.k, ctx.n)))
    c_hat = ctx.plan_q.fwd(ct)
    out = ctx.plan_q.pointwise_mul(c_hat, pt_hat[..., None, :, :])
    return ctx.plan_q.inv(out)


# --------------------------------------------------------------------------
# multiplication (HPS RNS) + relinearization
# --------------------------------------------------------------------------

def multiply(ctx: BfvContext, a, b):
    """ct×ct tensor multiply with t/Q scaling; output has
    n_a + n_b - 1 components (relinearize separately).

    Pipeline (SEAL analogue: `Evaluator::bfv_multiply` over the BEHZ
    base; here HPS): centered base-extend Q->B, NTT over Q∪B, component
    convolution, iNTT, exact scale-and-round into B, centered convert
    B->Q."""
    na, nb = a.shape[-3], b.shape[-3]
    # ONE batched centered extension Q -> Q∪B over both operands'
    # components (the fused kernel copies the source limbs through, so
    # there is no concat pass)
    ext = ctx.conv_q_to_aux.extend(
        jnp.concatenate([a, b], axis=-3), centered=True)
    if (na == 2 and nb == 2 and ext.dtype == m.U32
            and _plan_fused(ctx, ctx.plan_mul)
            and _env_on("SUNSCREEN_TPU_FUSE_FT3")):
        # round-5 megakernel: the four forward transforms + component
        # convolution in ONE Pallas call — the operands' NTT image
        # never exists in HBM. full=True additionally fuses the three
        # inverse transforms (seven transforms/instance; separate env
        # gate so each structure is measurable on-device).
        full = _env_on("SUNSCREEN_TPU_FUSE_TFULL", default="0")
        tensor = ctx.plan_mul.fwd_tensor3(ext, full=full)
        if not full:
            tensor = ctx.plan_mul.inv(tensor)
        return _scale_convert(ctx, tensor)
    # ONE batched forward transform over both operands' components
    both = ctx.plan_mul.fwd(ext)
    a_hat = both[..., :na, :, :]
    b_hat = both[..., na:, :, :]
    km = ctx.mul_base.k
    qm = ctx.mul_base.q_dev.reshape(km, 1)
    if (na == 2 and nb == 2 and a_hat.dtype == m.U32
            and _plan_fused(ctx, ctx.plan_mul)
            # OFF by default: measured 3818 vs 4149 ops/s — the three
            # inverse transforms in one kernel force bb=8 (VMEM), which
            # costs more than the saved tensor round trip. The kernel
            # stays available (selfchecked) for future VMEM budgets.
            and _env_on("SUNSCREEN_TPU_FUSE_T3", default="0")):
        # component convolution fused INTO the inverse transform — the
        # NTT-domain tensor never round-trips HBM
        tensor = ctx.plan_mul.inv_tensor3(a_hat, b_hat)
        return _scale_convert(ctx, tensor)
    fused = (_fused_pointwise("tensor3", ctx.mul_base.moduli)
             if na == 2 and nb == 2 and a_hat.dtype == m.U32 else None)
    if fused is not None:
        tensor = ctx.plan_mul.inv(fused(a_hat, b_hat))
        return _scale_convert(ctx, tensor)
    outs = []
    for j in range(na + nb - 1):
        # sum the (< nb) cross terms in plain u64 then reduce once:
        # each term is < q < 2^56, so a handful of terms cannot wrap,
        # and the residue mod q is unchanged (bit-identical results)
        acc = None
        for ia in range(na):
            ib = j - ia
            if 0 <= ib < nb:
                term = ctx.plan_mul.pointwise_mul(
                    a_hat[..., ia, :, :], b_hat[..., ib, :, :])
                acc = term if acc is None else acc + term
        outs.append(m.w_reduce(
            acc, qm, ctx.mul_base.c0_dev.reshape(km, 1),
            ctx.mul_base.c1_dev.reshape(km, 1)))
    tensor = ctx.plan_mul.inv(jnp.stack(outs, axis=-3))
    return _scale_convert(ctx, tensor)


def keyswitch(ctx: BfvContext, d, ksw: KswKey):
    """Switch poly d (coeff domain, [..., k, N]) to the target key:
    returns (u0, u1) over Q after the p_sp mod-down. Core of relinearize
    and rotations (SEAL: `Evaluator::switch_key_inplace`)."""
    kb = ctx.key_base
    kk = ctx.k + 1
    qk = kb.q_dev.reshape(kk, 1)
    c0 = kb.c0_dev.reshape(kk, 1)
    c1 = kb.c1_dev.reshape(kk, 1)
    # all k digits extended + transformed in ONE batched NTT:
    # digits [..., k, N] -> ext [..., k(digit), kk(limb), N]
    if (getattr(ctx.plan_key, "mode", "") == "pallas"
            and _plan_fused(ctx, ctx.plan_key)
            and _env_on("SUNSCREEN_TPU_FUSE_KSFULL", default="0")):
        # OPT-IN megakernel: digit forward transforms + contraction +
        # inverse transform in ONE Pallas call — the [.., k, kk, N]
        # NTT-domain digit stack never exists in HBM. Measured round 5
        # (r5_ab, real chip): consistently ~4% SLOWER than the
        # two-kernel path at b32/b64 — the pipeline is NOT HBM-bound
        # (hbm_probe: transforms run at ~17 GB/s vs the chip's
        # ~170 GB/s streaming), so the longer kernel body only costs
        # pipelining. Kept selectable + selfchecked for future
        # toolchains.
        both = ctx.plan_key.ks_full(d, ksw.k0, ksw.k1)
    else:
        if getattr(ctx.plan_key, "mode", "") == "pallas":
            # the fused MXU plan is exact for ANY u32 input (its
            # byte-dot bound covers 2^32-wide values) and the NTT is
            # linear mod each key modulus, so the raw digit broadcast
            # IS the extension — and fwd_broadcast reads each digit
            # once per limb via the block index map, never
            # materializing the broadcast in HBM
            d_hat = ctx.plan_key.fwd_broadcast(d)
        else:
            d_hat = ctx.plan_key.fwd(m.w_reduce(d[..., :, None, :], qk,
                                                c0, c1))
        # inner products with the key rows: sum over the digit axis
        # (u64 engine: raw u64 sums, k terms each < q < 2^56 cannot
        # wrap; u32 engine: widened sums) + one reduction — residues
        # are identical to the add_mod chain (bit-exact)
        if (d_hat.dtype == m.U32 and _plan_fused(ctx, ctx.plan_key)
                and _env_on("SUNSCREEN_TPU_FUSE_KS")):
            # digit contraction fused INTO the inverse transform of
            # both key components — the inner-product intermediate
            # never round-trips HBM
            both = ctx.plan_key.inv_ks(d_hat, ksw.k0, ksw.k1)
        else:
            fused = (_fused_pointwise("ks", ctx.key_base.moduli)
                     if d_hat.dtype == m.U32 else None)
            if fused is not None:
                acc = fused(d_hat, ksw.k0, ksw.k1)  # [..., 2, kk, N]
            else:
                t0 = ctx.plan_key.pointwise_mul(d_hat, ksw.k0)
                t1 = ctx.plan_key.pointwise_mul(d_hat, ksw.k1)
                acc = jnp.stack(
                    [m.w_sum_reduce(t0, qk, c0, c1, axis=-3),
                     m.w_sum_reduce(t1, qk, c0, c1, axis=-3)],
                    axis=-3)
            both = ctx.plan_key.inv(acc)
    # ONE batched mod-down over both key components
    u = ctx.mod_down.apply(both[..., :ctx.k, :], both[..., ctx.k, :])
    return (u[..., 0, :, :], u[..., 1, :, :])


def relinearize(ctx: BfvContext, ct, rlk: KswKey):
    """3-component -> 2-component. SEAL: `Evaluator::relinearize`;
    reference inserts this after every ct×ct multiply
    (`sunscreen_backend/src/transforms/insert_relinearizations.rs:17-61`).
    """
    if ct.shape[-3] != 3:
        raise InvalidArgument(
            f"relinearize expects a 3-component ct, got {ct.shape[-3]}")
    u0, u1 = keyswitch(ctx, ct[..., 2, :, :], rlk)
    q = _q(ctx)
    c0 = m.add_mod(ct[..., 0, :, :], u0, q)
    c1 = m.add_mod(ct[..., 1, :, :], u1, q)
    return jnp.stack([c0, c1], axis=-3)


def multiply_relin(ctx: BfvContext, a, b, rlk: KswKey):
    return relinearize(ctx, multiply(ctx, a, b), rlk)


def square(ctx: BfvContext, a):
    return multiply(ctx, a, a)


# --------------------------------------------------------------------------
# Galois / rotations
# --------------------------------------------------------------------------

def _permute(ctx: BfvContext, poly, g: int):
    idx, neg = ctx.galois_table(g)
    q = _q(ctx)
    gathered = poly[..., idx]
    return jnp.where(neg, m.neg_mod(gathered, q), gathered)


def apply_galois(ctx: BfvContext, ct, g: int, gks: GaloisKeys):
    """a(x) -> a(x^g) on a 2-component ct + keyswitch back to s.
    SEAL: `Evaluator::apply_galois`."""
    if ct.shape[-3] != 2:
        raise InvalidArgument(
            f"apply_galois expects a 2-component ct, got {ct.shape[-3]}")
    c0p = _permute(ctx, ct[..., 0, :, :], g)
    c1p = _permute(ctx, ct[..., 1, :, :], g)
    u0, u1 = keyswitch(ctx, c1p, gks[g])
    return jnp.stack([m.add_mod(c0p, u0, _q(ctx)), u1], axis=-3)


def rotate_rows(ctx: BfvContext, ct, steps: int, gks: GaloisKeys):
    """Cyclically rotate each batching row by `steps` (SEAL:
    `Evaluator::rotate_rows`). Decomposes into available power-of-two
    key elements when the exact element is missing."""
    half = ctx.n // 2
    steps = steps % half
    if steps == 0:
        return ct
    g = ctx.rotate_rows_element(steps)
    if g in gks:
        return apply_galois(ctx, ct, g, gks)
    # greedy decomposition over available power-of-two steps
    remaining = steps
    out = ct
    bit = 1
    while remaining:
        if remaining & 1:
            gb = ctx.rotate_rows_element(bit)
            if gb not in gks:
                raise KeyError(f"missing galois key for rotation {bit}")
            out = apply_galois(ctx, out, gb, gks)
        remaining >>= 1
        bit <<= 1
    return out


def rotate_columns(ctx: BfvContext, ct, gks: GaloisKeys):
    """Swap the two batching rows (SEAL: `Evaluator::rotate_columns`,
    FHE IR op `SwapRows` — `sunscreen_fhe_program/src/operation.rs`)."""
    return apply_galois(ctx, ct, ctx.rotate_columns_element, gks)


# --------------------------------------------------------------------------
# modulus switching
# --------------------------------------------------------------------------

def mod_switch_to_next(ctx: BfvContext, ct):
    """Drop the last ciphertext modulus: c' = round(c * Q'/Q) per
    component, where Q' = Q/q_last (SEAL:
    `Evaluator::mod_switch_to_next`; `util::RNSTool::divide_and_round_
    q_last_inplace`). Returns arrays over k-1 limbs — decrypt/further
    ops need the context of the reduced parameter set
    (`mod_switch_context`)."""
    if ctx.k < 2:
        raise InvalidArgument("cannot mod-switch below one modulus")
    md = ctx.mod_switch_down
    return md.apply(ct[..., :ctx.k - 1, :], ct[..., ctx.k - 1, :])


def mod_switch_context(ctx: BfvContext) -> BfvContext:
    """Context for ciphertexts after one mod_switch_to_next."""
    from sunscreen_tpu.bfv.context import get_context
    from sunscreen_tpu.bfv.params import BfvParams
    p = ctx.params
    return get_context(BfvParams(
        p.poly_degree, p.plain_modulus, p.coeff_modulus[:-1],
        p.special_modulus, p.security_level))


def exponentiate(ctx: BfvContext, ct, power: int, rlk: KswKey):
    """ct^power by square-and-multiply with relin after each multiply
    (SEAL: `Evaluator::exponentiate`)."""
    if power < 1:
        raise InvalidArgument("exponentiate requires power >= 1")
    result = None
    base = ct
    p = power
    while p:
        if p & 1:
            result = base if result is None else multiply_relin(
                ctx, result, base, rlk)
        p >>= 1
        if p:
            base = multiply_relin(ctx, base, base, rlk)
    return result


def add_many(ctx: BfvContext, cts):
    """Sum a sequence of 2-component ciphertexts (SEAL:
    `Evaluator::add_many`; binding: `seal_fhe/src/evaluator.rs:38`).
    Stacks and reduces in one fused op — noise grows additively."""
    cts = list(cts)
    if not cts:
        raise InvalidArgument("add_many requires at least one ciphertext")
    if len(cts) == 1:
        return cts[0]
    q = _q(ctx)
    acc = cts[0]
    for c in cts[1:]:
        acc = m.add_mod(acc, c, q)
    return acc


def multiply_many(ctx: BfvContext, cts, rlk: KswKey):
    """Product of a sequence of ciphertexts as a balanced tree of
    multiply+relinearize (SEAL: `Evaluator::multiply_many`; binding:
    `seal_fhe/src/evaluator.rs:46-52`). Tree depth log2(len) keeps
    noise growth minimal vs a left fold."""
    level = list(cts)
    if not level:
        raise InvalidArgument(
            "multiply_many requires at least one ciphertext")
    while len(level) > 1:
        nxt = [multiply_relin(ctx, level[i], level[i + 1], rlk)
               for i in range(0, len(level) - 1, 2)]
        if len(level) % 2:
            nxt.append(level[-1])
        level = nxt
    return level[0]
