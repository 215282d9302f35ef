"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4 "TPU translation": same jitted fns on 1 vs N devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sunscreen_tpu.math import ntt, primes
from sunscreen_tpu.parallel import (DistributedNttPlan,
                                    make_distributed_negacyclic_mul)

RNG = np.random.default_rng(9)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual devices"
    return Mesh(np.array(devs[:8]), axis_names=("coeff",))


def test_distributed_ntt_matches_single_device(mesh):
    n = 256
    moduli = tuple(primes.gen_ntt_primes(50, 2, n))
    dplan = DistributedNttPlan(n, moduli)
    ref_plan = ntt.get_plan(n, moduli)
    k = len(moduli)
    a = np.stack([RNG.integers(0, q, n, dtype=np.uint64)
                  for q in moduli])
    b = np.stack([RNG.integers(0, q, n, dtype=np.uint64)
                  for q in moduli])
    expect = np.asarray(ref_plan.negacyclic_mul(jnp.asarray(a),
                                                jnp.asarray(b)))
    fn = make_distributed_negacyclic_mul(dplan, mesh)
    am = a.reshape(k, dplan.n1, dplan.n2)
    bm = b.reshape(k, dplan.n1, dplan.n2)
    sharding = NamedSharding(mesh, P(None, None, "coeff"))
    got = np.asarray(fn(jax.device_put(am, sharding),
                        jax.device_put(bm, sharding)))
    np.testing.assert_array_equal(got.reshape(k, n), expect)


def test_distributed_ntt_roundtrip_identity(mesh):
    n = 128
    moduli = tuple(primes.gen_ntt_primes(50, 1, n))
    dplan = DistributedNttPlan(n, moduli)
    a = np.stack([RNG.integers(0, q, n, dtype=np.uint64)
                  for q in moduli])
    am = a.reshape(1, dplan.n1, dplan.n2)
    spec = P(None, None, "coeff")

    def body(x):
        return dplan.inv_local(dplan.fwd_local(x, "coeff"), "coeff")

    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(spec,),
                               out_specs=spec))
    sharding = NamedSharding(mesh, P(None, None, "coeff"))
    got = np.asarray(fn(jax.device_put(am, sharding)))
    np.testing.assert_array_equal(got, am)


def test_batched_limb_sharded_bfv_multiply(mesh):
    # ct batch over 'coeff'-renamed axis: reuse the 8 devices as a
    # batch axis for whole-ciphertext data parallelism
    import jax.random as jr

    from sunscreen_tpu.bfv import BfvParams, get_context, keys, ops
    params = BfvParams.insecure(poly_degree=256, limbs=2, limb_bits=30)
    ctx = get_context(params)
    key = jr.key(0)
    sk = keys.gen_secret_key(ctx, jr.fold_in(key, 0))
    pk = keys.gen_public_key(ctx, sk, jr.fold_in(key, 1))
    rlk = keys.gen_relin_key(ctx, sk, jr.fold_in(key, 2))
    batch = 8
    pts = (np.arange(batch * ctx.n, dtype=np.uint64)
           .reshape(batch, ctx.n) % ctx.t)
    cts = jax.vmap(lambda p, k: ops.encrypt(ctx, pk, p, k))(
        jnp.asarray(pts), jr.split(jr.fold_in(key, 3), batch))
    sharding = NamedSharding(mesh, P("coeff", None, None, None))
    cts_sh = jax.device_put(cts, sharding)

    @jax.jit
    def step(c):
        return ops.multiply_relin(ctx, c, c, rlk)

    out = np.asarray(step(cts_sh))
    plan_t = ntt.get_plan(ctx.n, (ctx.t,))
    expect = np.asarray(plan_t.negacyclic_mul(
        jnp.asarray(pts)[:, None, :], jnp.asarray(pts)[:, None, :]))[:, 0]
    got = np.stack([np.asarray(ops.decrypt(ctx, sk, out[i]))
                    for i in range(batch)])
    np.testing.assert_array_equal(got, expect)


def test_sharded_multiply_relin_matches_single_chip():
    """Coefficient-sharded HPS multiply + hybrid keyswitch over an
    8-device mesh is bit-identical to the single-chip evaluator
    (dntt wired into bfv ops — SURVEY §2.5 scale dimension)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sunscreen_tpu.bfv import BfvParams, get_context
    from sunscreen_tpu.bfv import keys as bkeys
    from sunscreen_tpu.bfv import ops as bops
    from sunscreen_tpu.parallel import sharded_bfv as sb

    # tiny N: the distributed DFT matrices unroll n1+n2 mod-mat-vec
    # steps inside an 8-way shard_map — keep the traced graph small
    # enough for the single-core CI compile budget
    params = BfvParams.insecure(poly_degree=64, limbs=2, limb_bits=30)
    ctx = get_context(params)
    key = jax.random.key(5)
    sk = bkeys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
    pk = bkeys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
    rlk = bkeys.gen_relin_key(ctx, sk, jax.random.fold_in(key, 2))
    pt = (np.arange(ctx.n, dtype=np.uint64) * 31) % ctx.t
    ct = bops.encrypt(ctx, pk, pt, jax.random.fold_in(key, 3))

    want = np.asarray(bops.multiply_relin(ctx, ct, ct, rlk))

    devices = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, axis_names=("coeff",))
    ct4 = jax.device_put(
        sb.to_sharded_layout(ct, ctx),
        NamedSharding(mesh, P(None, None, None, "coeff")))
    srlk = sb.sharded_relin_key(ctx, rlk, mesh)
    out4 = sb.sharded_multiply_relin(ctx, mesh, ct4, ct4, srlk)
    got = np.asarray(sb.from_sharded_layout(jax.device_get(out4), ctx))
    np.testing.assert_array_equal(got, want)
    # and it still decrypts to the plaintext square
    dec = np.asarray(bops.decrypt(ctx, sk, jnp.asarray(got)))
    dec_want = np.asarray(bops.decrypt(ctx, sk, jnp.asarray(want)))
    np.testing.assert_array_equal(dec, dec_want)


def test_sharded_full_program_lowering():
    """A whole compiled FHE program (mul+relin, rotation, adds) run
    with GSPMD batch x limb sharding is bit-identical to the
    single-chip lowering (compiler/lower.py lower_program_sharded —
    VERDICT round-2 item 6: mesh-aware full-program execution)."""
    import jax.random as jr

    from sunscreen_tpu.bfv import BfvParams
    from sunscreen_tpu.compiler import Compiler
    from sunscreen_tpu.compiler.lower import lower_program_sharded
    from sunscreen_tpu.compiler.trace import fhe_program
    from sunscreen_tpu.runtime import Runtime
    from sunscreen_tpu.types import Batched, Cipher

    params = BfvParams.insecure(poly_degree=64, limbs=2, limb_bits=40)
    rt = Runtime.new_fhe_zkp(params)
    pub, priv = rt.generate_keys(seed=9)

    @fhe_program(scheme="bfv")
    def workload(a: Cipher[Batched], b: Cipher[Batched]):
        prod = a * b
        rot = prod << 1
        return rot + a - b

    app = Compiler().with_params(params).fhe_program(workload).compile()
    prog = app.get_program(workload)

    batch = 4
    rows = np.arange(params.poly_degree, dtype=np.uint64) % 17
    pt = rt.ctx.params  # noqa: F841 (context sanity)
    a_cts = jnp.stack([
        rt.encrypt(Batched(rows + i), pub, seed=30 + i).cts[0]
        for i in range(batch)])
    b_cts = jnp.stack([
        rt.encrypt(Batched(rows * 2 + i), pub, seed=40 + i).cts[0]
        for i in range(batch)])

    from sunscreen_tpu.compiler.lower import lower_program
    single = lower_program(prog, rt.ctx, rlk=pub.relin_key,
                           gks=pub.galois_keys)
    want = np.asarray(single(a_cts, b_cts)[0])

    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, axis_names=("batch", "limb"))
    sharded = lower_program_sharded(prog, rt.ctx, mesh,
                                    rlk=pub.relin_key,
                                    gks=pub.galois_keys)
    got = np.asarray(sharded(a_cts, b_cts)[0])
    np.testing.assert_array_equal(got, want)


def test_sharded_full_program_coeff_axis():
    """The same whole-program GSPMD lowering with the COEFFICIENT axis
    sharded: multiply, keyswitch, AND the rotation's galois
    permutation run with N split across devices, XLA inserting the
    collective permutes/gathers (round-3 gap: coefficient-sharded full
    programs — until now only one hand-written op was coeff-sharded)."""
    import jax.random as jr  # noqa: F401

    from sunscreen_tpu.bfv import BfvParams
    from sunscreen_tpu.compiler import Compiler
    from sunscreen_tpu.compiler.lower import (lower_program,
                                              lower_program_sharded)
    from sunscreen_tpu.compiler.trace import fhe_program
    from sunscreen_tpu.runtime import Runtime
    from sunscreen_tpu.types import Batched, Cipher

    params = BfvParams.insecure(poly_degree=64, limbs=2, limb_bits=40)
    rt = Runtime.new_fhe_zkp(params)
    pub, priv = rt.generate_keys(seed=9)

    @fhe_program(scheme="bfv")
    def workload(a: Cipher[Batched], b: Cipher[Batched]):
        prod = a * b
        rot = prod << 1
        return rot + a - b

    app = Compiler().with_params(params).fhe_program(workload).compile()
    prog = app.get_program(workload)

    batch = 2
    rows = np.arange(params.poly_degree, dtype=np.uint64) % 17
    a_cts = jnp.stack([
        rt.encrypt(Batched(rows + i), pub, seed=60 + i).cts[0]
        for i in range(batch)])
    b_cts = jnp.stack([
        rt.encrypt(Batched(rows * 3 + i), pub, seed=70 + i).cts[0]
        for i in range(batch)])

    single = lower_program(prog, rt.ctx, rlk=pub.relin_key,
                           gks=pub.galois_keys)
    want = np.asarray(single(a_cts, b_cts)[0])

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, axis_names=("batch", "coeff"))
    sharded = lower_program_sharded(
        prog, rt.ctx, mesh, rlk=pub.relin_key, gks=pub.galois_keys,
        ct_spec=P("batch", None, None, "coeff"))
    got = np.asarray(sharded(a_cts, b_cts)[0])
    np.testing.assert_array_equal(got, want)


def test_batch_sharded_pbs_bit_exact():
    """Batch-axis-sharded PBS (parallel/sharded_tfhe.py) matches the
    single-device bootstrap exactly — keys replicated, ciphertext batch
    split over the mesh (the TFHE throughput-serving layout,
    VERDICT r4 #5)."""
    from sunscreen_tpu.parallel.sharded_tfhe import batch_sharded_pbs
    from sunscreen_tpu.tfhe import ops as tops
    from sunscreen_tpu.tfhe import torus as ttorus
    from sunscreen_tpu.tfhe.params import (GlweDef, LweDef,
                                           RadixDecomposition)

    key = jax.random.key(41)
    lwe = LweDef(dim=8, std=1e-16)
    glwe = GlweDef(size=1, poly_degree=256, std=1e-16)
    pbs_radix = RadixDecomposition(count=3, radix_log=4)
    ks_radix = RadixDecomposition(count=8, radix_log=6)
    lwe_sk = tops.generate_binary_lwe_sk(lwe, jax.random.fold_in(key, 0))
    glwe_sk = tops.generate_binary_glwe_sk(glwe,
                                           jax.random.fold_in(key, 1))
    bsk = tops.generate_bootstrap_key(lwe_sk, glwe_sk, lwe, glwe,
                                      pbs_radix,
                                      jax.random.fold_in(key, 2))
    ksk = tops.generate_keyswitch_key(
        tops.flatten_glwe_sk(glwe_sk), lwe_sk, lwe, ks_radix,
        jax.random.fold_in(key, 3))
    bits = 2
    tp = tops.test_polynomial_for(lambda v: (v + 1) % 2, bits, glwe)
    batch = 8
    msgs = jnp.arange(batch, dtype=jnp.uint64) % 2
    cts = jax.vmap(lambda v, k: tops.encrypt_lwe(
        ttorus.encode(v, bits), lwe_sk, lwe, k))(
        msgs, jax.random.split(jax.random.fold_in(key, 4), batch))

    want = np.asarray(jax.vmap(
        lambda c: tops.programmable_bootstrap_univariate(
            c, tp, bsk, ksk, lwe, glwe, pbs_radix, ks_radix))(cts))

    pmesh = Mesh(np.array(jax.devices()[:8]), axis_names=("batch",))
    got = np.asarray(batch_sharded_pbs(pmesh, cts, tp, bsk, ksk, lwe,
                                       glwe, pbs_radix, ks_radix))
    np.testing.assert_array_equal(got, want)


def test_coeff_sharded_external_product_bit_exact(mesh):
    """Coefficient-axis-sharded external product (DistributedNttPlan
    transforms + local decomposition/reconstruction) is bit-identical
    to tfhe.ops.external_product (the TFHE latency layout)."""
    from sunscreen_tpu.parallel.sharded_tfhe import (
        coeff_sharded_external_product)
    from sunscreen_tpu.tfhe import ops as tops
    from sunscreen_tpu.tfhe import torus as ttorus
    from sunscreen_tpu.tfhe.params import GlweDef, RadixDecomposition

    key = jax.random.key(43)
    glwe = GlweDef(size=1, poly_degree=256, std=1e-16)
    radix = RadixDecomposition(count=3, radix_log=4)
    sk = tops.generate_binary_glwe_sk(glwe, jax.random.fold_in(key, 0))
    sel = tops.encrypt_ggsw(1, sk, glwe, radix,
                            jax.random.fold_in(key, 1))
    msgs = jnp.asarray(RNG.integers(0, 2, glwe.poly_degree,
                                    dtype=np.uint64))
    ct = tops.encrypt_glwe(ttorus.encode(msgs, 2), sk, glwe,
                           jax.random.fold_in(key, 2))

    want = np.asarray(tops.external_product(sel, ct, glwe, radix))
    got = np.asarray(coeff_sharded_external_product(
        mesh, sel, ct, glwe, radix))
    np.testing.assert_array_equal(got, want)
