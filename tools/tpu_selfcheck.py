"""Real-TPU lowering self-check: verifies every Pallas/Mosaic hot path
bit-exact ON THE DEVICE against independent oracles. The CPU test suite
runs Pallas in interpret mode, which executes jnp semantics and CANNOT
catch device miscompiles — round 3 found one (jnp.dot(u8, u8) inside a
kernel lowers as a SIGNED i8 dot on this toolchain), so any change to
the fused kernels must re-run this on hardware:

    python tools/tpu_selfcheck.py            # ~2-4 min on a quiet chip

Checks: pmntt fwd/inv roundtrip + negacyclic_mul vs numpy convolution,
fused RNS conversions vs the unfused XLA path, fused tensor/keyswitch
kernels vs the generic pointwise path, and a full multiply_relin
decrypt vs a plaintext oracle. Exits non-zero on any mismatch.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SUNSCREEN_TPU_NTT", "pallas")

import jax
import jax.numpy as jnp
import numpy as np

FAILED = []


def check(name, ok):
    print(f"{'ok ' if ok else 'FAIL'}  {name}", flush=True)
    if not ok:
        FAILED.append(name)


def main():
    assert jax.default_backend() == "tpu", (
        "selfcheck must run on the real chip; backend="
        + jax.default_backend())

    from sunscreen_tpu.math import pmntt, primes

    N, K = 4096, 3
    mods = tuple(int(q) for q in primes.gen_ntt_primes(29, K, N))
    plan = pmntt.PallasMatmulNttPlan(N, mods)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(0, min(mods), (4, K, N)), jnp.uint32)
    rt = np.asarray(jax.jit(lambda v: plan.inv(plan.fwd(v)))(x))
    check("pmntt fwd/inv roundtrip", np.array_equal(rt, np.asarray(x)))

    # negacyclic product vs exact numpy convolution (per limb)
    a = rng.integers(0, min(mods), N).astype(np.int64)
    b = rng.integers(0, min(mods), N).astype(np.int64)
    stack = jnp.asarray(np.broadcast_to(a, (K, N)).copy(), jnp.uint32)
    stackb = jnp.asarray(np.broadcast_to(b, (K, N)).copy(), jnp.uint32)
    got = np.asarray(jax.jit(plan.negacyclic_mul)(stack, stackb))
    ok = True
    for j, q in enumerate(mods):
        am = a % q
        bm = b % q
        conv = np.convolve(am, bm)  # < N * q^2 = 2^12 * 2^58 — NOT
        # int64-safe at 29-bit moduli; reduce via object dtype chunks
        conv = (np.convolve((am >> 15).astype(np.int64), bm) % q
                * (1 << 15)
                + np.convolve((am & 0x7FFF).astype(np.int64), bm)) % q
        want = conv[:N].copy()
        want[:N - 1] = (want[:N - 1] - conv[N:]) % q
        ok &= np.array_equal(got[j] % q, want % q)
    check("pmntt negacyclic_mul vs numpy", bool(ok))

    # fused RNS kernels vs the unfused XLA path
    from sunscreen_tpu.bfv import BfvParams, get_context, keys, ops
    params = BfvParams.default_u32(8192)
    ctx = get_context(params)
    xr = jnp.asarray(
        rng.integers(0, 1 << 30, (2, ctx.k, ctx.n)), jnp.uint32)
    xr = xr % ctx.q_dev.astype(jnp.uint32).reshape(ctx.k, 1)
    conv = ctx.conv_q_to_aux
    fused = jax.jit(lambda v: conv._fused()(v))
    got = np.asarray(fused(xr))

    os.environ["SUNSCREEN_TPU_FUSED_RNS"] = "0"

    def unfused(v):
        return conv.convert(v, centered=True)

    want = np.asarray(jax.jit(unfused)(xr))
    os.environ["SUNSCREEN_TPU_FUSED_RNS"] = "1"
    check("fused base-extend vs XLA path", np.array_equal(got, want))

    # fused inverse-transform prologues (round-3 merges) vs their
    # two-kernel compositions, on-device
    from sunscreen_tpu.math import ntt as nttmod
    from sunscreen_tpu.math import prns
    plan_m = ctx.plan_mul
    if getattr(plan_m, "mode", "") == "pallas":
        km = ctx.mul_base.k
        a_t = jnp.asarray(rng.integers(0, 1 << 28, (2, 2, km, ctx.n)),
                          jnp.uint32)
        b_t = jnp.asarray(rng.integers(0, 1 << 28, (2, 2, km, ctx.n)),
                          jnp.uint32)
        ten = prns.FusedTensor3(ctx.mul_base.moduli)
        want = np.asarray(jax.jit(lambda u, v: plan_m.inv(ten(u, v)))(
            a_t, b_t))
        got = np.asarray(jax.jit(plan_m.inv_tensor3)(a_t, b_t))
        check("inv_tensor3 vs pointwise+inv", np.array_equal(got, want))

        plan_k = ctx.plan_key
        kk = ctx.k + 1
        d_t = jnp.asarray(rng.integers(0, 1 << 28, (2, ctx.k, kk, ctx.n)),
                          jnp.uint32)
        k0_t = jnp.asarray(rng.integers(0, 1 << 28, (ctx.k, kk, ctx.n)),
                           jnp.uint32)
        k1_t = jnp.asarray(rng.integers(0, 1 << 28, (ctx.k, kk, ctx.n)),
                           jnp.uint32)
        inner = prns.FusedKsInner(ctx.key_base.moduli)
        want = np.asarray(jax.jit(
            lambda d, u, v: plan_k.inv(inner(d, u, v)))(d_t, k0_t, k1_t))
        got = np.asarray(jax.jit(plan_k.inv_ks)(d_t, k0_t, k1_t))
        check("inv_ks vs inner+inv", np.array_equal(got, want))

        # round-5 tensor megakernel (both variants) vs fwd + pointwise
        ext_t = jnp.asarray(rng.integers(0, 1 << 28, (2, 4, km, ctx.n)),
                            jnp.uint32)
        bh = jax.jit(plan_m.fwd)(ext_t)
        want_hat = np.asarray(jax.jit(
            lambda u, v: ten(u, v))(bh[:, :2], bh[:, 2:]))
        got_hat = np.asarray(jax.jit(
            lambda x: plan_m.fwd_tensor3(x, full=False))(ext_t))
        check("fwd_tensor3 vs fwd+pointwise",
              np.array_equal(got_hat, want_hat))
        want_full = np.asarray(jax.jit(plan_m.inv)(jnp.asarray(want_hat)))
        got_full = np.asarray(jax.jit(
            lambda x: plan_m.fwd_tensor3(x, full=True))(ext_t))
        check("fwd_tensor3 full vs fwd+pointwise+inv",
              np.array_equal(got_full, want_full))

        # round-5 keyswitch megakernel vs the two-kernel composition,
        # with FULL-RANGE u32 raw digits (the exactness envelope)
        d_raw = jnp.asarray(
            rng.integers(0, 1 << 32, (2, ctx.k, ctx.n), dtype=np.uint64)
            .astype(np.uint32))
        want = np.asarray(jax.jit(lambda d, u, v: plan_k.inv_ks(
            plan_k.fwd_broadcast(d), u, v))(d_raw, k0_t, k1_t))
        got = np.asarray(jax.jit(plan_k.ks_full)(d_raw, k0_t, k1_t))
        check("ks_full vs fwd_broadcast+inv_ks", np.array_equal(got, want))

        # per-limb-residue variant (TFHE signed-digit shape)
        want = np.asarray(jax.jit(lambda d, u, v: plan_k.inv_ks(
            plan_k.fwd(d), u, v))(d_t, k0_t, k1_t))
        got = np.asarray(jax.jit(plan_k.ks_full_limbs)(d_t, k0_t, k1_t))
        check("ks_full_limbs vs fwd+inv_ks", np.array_equal(got, want))

        x_t = jnp.asarray(
            rng.integers(0, 1 << 28, (2, ctx.mul_base.k, ctx.n)),
            jnp.uint32) % jnp.asarray(
                np.array(ctx.mul_base.moduli, np.uint32)).reshape(-1, 1)
        sc = prns.FusedScaleConvert(ctx.scale_mul_to_aux,
                                    ctx.conv_aux_to_q)
        want = np.asarray(jax.jit(lambda v: ctx.conv_aux_to_q.convert(
            ctx.scale_mul_to_aux.apply(v), centered=True))(x_t))
        got = np.asarray(jax.jit(sc)(x_t))
        check("fused scale+convert chain", np.array_equal(got, want))
    del nttmod

    # full multiply_relin decrypt vs plaintext oracle
    t = int(ctx.t)
    key = jax.random.key(0)

    @jax.jit
    def setup(key):
        sk = keys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
        pk = keys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
        rlk = keys.gen_relin_key(ctx, sk, jax.random.fold_in(key, 2))
        return sk, pk, rlk

    sk, pk, rlk = setup(key)
    pa = np.arange(ctx.n, dtype=np.uint64) % np.uint64(t)
    pb = (np.arange(ctx.n, dtype=np.uint64) * 7 + 3) % np.uint64(t)

    @jax.jit
    def mul_dec(key):
        ca = ops.encrypt(ctx, pk, jnp.asarray(pa),
                         jax.random.fold_in(key, 3))
        cb = ops.encrypt(ctx, pk, jnp.asarray(pb),
                         jax.random.fold_in(key, 4))
        return ops.decrypt(ctx, sk, ops.multiply_relin(ctx, ca, cb, rlk))

    got = np.asarray(mul_dec(key)).astype(np.int64)
    conv = np.convolve(pa.astype(np.int64), pb.astype(np.int64))
    want = conv[:ctx.n].copy()
    want[:ctx.n - 1] -= conv[ctx.n:]
    want = np.mod(want, t)
    check("multiply_relin decrypt vs plaintext oracle",
          np.array_equal(np.mod(got, t), want))

    # TFHE u32 engine: NTT-domain bootstrap-key blind rotate vs the
    # exact per-CMUX CRT path, on-device (short LWE dim: the check is
    # the kernel lowering, not the full 512-step loop)
    from sunscreen_tpu.tfhe import ops as tops
    from sunscreen_tpu.tfhe import torus
    from sunscreen_tpu.tfhe.params import (GlweDef, LweDef,
                                           RadixDecomposition)
    tlwe = LweDef(dim=8, std=1e-16)
    tglwe = GlweDef(size=1, poly_degree=1024, std=1e-16)
    tradix = RadixDecomposition(count=2, radix_log=23)
    tkey = jax.random.key(5)
    lwe_sk = tops.generate_binary_lwe_sk(tlwe, jax.random.fold_in(tkey, 0))
    glwe_sk = tops.generate_binary_glwe_sk(tglwe,
                                           jax.random.fold_in(tkey, 1))
    bsk = tops.generate_bootstrap_key(lwe_sk, glwe_sk, tlwe, tglwe,
                                      tradix, jax.random.fold_in(tkey, 2))
    tp = tops.test_polynomial_for(lambda v: (v + 1) % 2, 2, tglwe)
    ct = tops.encrypt_lwe(torus.encode(jnp.uint64(1), 2), lwe_sk, tlwe,
                          jax.random.fold_in(tkey, 3))
    want = np.asarray(jax.jit(lambda c: tops.blind_rotate(
        tp, c, bsk, tglwe, tradix))(ct))
    bsk_hat = tops.bootstrap_key_to_ntt(bsk, tglwe, tradix)
    got = np.asarray(jax.jit(lambda c: tops.blind_rotate(
        tp, c, bsk_hat, tglwe, tradix))(ct))
    check("tfhe u32 ntt-bsk blind rotate vs exact CRT path",
          np.array_equal(got, want))

    if FAILED:
        print("SELFCHECK FAILED:", FAILED, flush=True)
        raise SystemExit(1)
    print("selfcheck: all device lowerings bit-exact", flush=True)


if __name__ == "__main__":
    main()
