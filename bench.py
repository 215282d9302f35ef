"""Benchmark: BFV ct×ct multiply + relinearize throughput, N=8192, 3 RNS
limbs (the BASELINE.json headline metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against hand-optimized SEAL on the reference's CPU
class: SEAL BFV ct×ct multiply+relinearize at N=8192 (3-limb ciphertext
modulus) costs ~4 ms single-threaded on a 3 GHz Xeon (derived from the
reference's chi-sq end-to-end budget, `sunscreen_docs/src/fhe/compiler/
performance.md:21` — 0.053 s for keygen + 4 encryptions + 5 muls + adds)
=> ~250 op/s baseline.
"""

import json
import os
import time

# Round-3 configuration: the u32 engine through the fused MXU/Pallas
# pipeline (NTT mode "pallas" = math/pmntt.py stage kernels; RNS glue
# and pointwise contractions fused via math/prns.py). Measured fastest
# end-to-end on the v5e (benchmarks/PERF_NOTES.md round-3 tables); the
# u64 path remains via SUNSCREEN_TPU_BENCH_WORD=u64.
os.environ.setdefault("SUNSCREEN_TPU_NTT", "pallas")

import jax
import jax.numpy as jnp

BASELINE_OPS_PER_S = 250.0
N = 8192
LIMBS = 3          # the metric's u64-equivalent parameter point
# batch 64 measured fastest round 5 (r5_ab: b64 4391 vs b32 4074 in
# the ft3-only config; b128 overruns the remote compile helper)
BATCH = int(os.environ.get("SUNSCREEN_TPU_BENCH_BATCH", "64"))
WORD = os.environ.get("SUNSCREEN_TPU_BENCH_WORD", "u32")


def main():
    from sunscreen_tpu.bfv import BfvParams, get_context, keys, ops
    from sunscreen_tpu.bfv.keys import KswKey

    if WORD == "u32":
        # same 128-bit-secure parameter point as the u64 3x54-bit
        # config (log Q+P = 218): 7 sub-30-bit limbs + a 30-bit
        # special prime — the metric stays the SEAL-class
        # "N=8192, 218-bit modulus chain" mul+relin
        params = BfvParams.default_u32(N)
    else:
        os.environ["SUNSCREEN_TPU_NTT"] = "unrolled"
        params = BfvParams.default(N)
        assert len(params.coeff_modulus) == LIMBS, params.coeff_modulus
    ctx = get_context(params)
    key = jax.random.key(0)

    # one fused keygen+encrypt computation — per-op dispatch to a
    # tunneled TPU is latency-bound, so the whole setup is jitted
    @jax.jit
    def setup(key):
        sk = keys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
        pk = keys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
        rlk = keys.gen_relin_key(ctx, sk, jax.random.fold_in(key, 2))
        pts = (jnp.arange(BATCH * ctx.n, dtype=jnp.uint64)
               .reshape(BATCH, ctx.n) % jnp.uint64(ctx.t))
        cts = jax.vmap(lambda p, k: ops.encrypt(ctx, pk, p, k))(
            pts, jax.random.split(jax.random.fold_in(key, 3), BATCH))
        return sk, rlk, cts

    sk, rlk, cts = jax.block_until_ready(setup(key))

    # correctness gate BEFORE timing: one mul of known plaintexts must
    # decrypt to the exact product (catches silently-wrong device
    # lowering — e.g. the round-3 Mosaic signed-i8-dot hazard, which a
    # decrypt-doesn't-crash check missed entirely)
    import numpy as np
    t = int(ctx.t)
    pa = np.arange(ctx.n, dtype=np.uint64) % np.uint64(t)
    one_mul = jax.jit(lambda a, b, k0, k1, sk_: ops.decrypt(
        ctx, sk_, ops.multiply_relin(ctx, a, b, KswKey(k0, k1))))
    got = np.asarray(one_mul(cts[0], cts[0], rlk.k0, rlk.k1, sk))
    # independent numpy oracle: negacyclic convolution mod t (t is a
    # 20-bit prime, so int64 products are exact: N * t^2 < 2^63)
    conv = np.convolve(pa.astype(np.int64), pa.astype(np.int64))
    res = conv[:N].copy()
    res[:N - 1] -= conv[N:]
    want = np.mod(res, t).astype(np.uint64)
    if not np.array_equal(got.astype(np.uint64), want):
        raise SystemExit("bench correctness gate FAILED: device "
                         "multiply_relin decrypts wrong")

    @jax.jit
    def step(a, b, k0, k1):
        return ops.multiply_relin(ctx, a, b, KswKey(k0, k1))

    out = jax.block_until_ready(step(cts, cts, rlk.k0, rlk.k1))  # compile
    # real fetch of THIS executable's output: through the tunnel,
    # block_until_ready returns early for a freshly compiled step even
    # after other fetches in the process (measured round 5: a b64 run
    # without this read 680k "ops/s")
    np.asarray(out[0, 0, 0, :4])

    # timed: REPEATED measurement, median-of-reps — single 20-iter
    # loops showed a ~10% tunnel-jitter band across driver captures
    # (r03 4071 vs r04 3823 on near-identical code), which swallowed
    # real 5% gains. Median of >=5 reps is stable to ~+-2%.
    iters = int(os.environ.get("SUNSCREEN_TPU_BENCH_ITERS", "20"))
    reps = int(os.environ.get("SUNSCREEN_TPU_BENCH_REPS", "5"))
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(out, cts, rlk.k0, rlk.k1)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        rates.append(BATCH * iters / dt)
    rates.sort()
    ops_per_s = rates[len(rates) // 2]
    # plausibility guard: the exact-arithmetic MAC floor of this op on
    # a single v5e is ~10 us (PERF_NOTES round-5 accounting) — a
    # median implying < 20 us/op means timing ran async (early-return
    # block) and the number is fantasy; fail loudly instead
    if ops_per_s > 50_000:
        raise SystemExit(
            f"bench timing implausible ({ops_per_s:.0f} ops/s): "
            f"async early-return detected — fix the real-fetch guard")

    # correctness guard: decrypting the batched result must not crash
    # (sanity that we benchmarked a real op)
    _ = jax.block_until_ready(
        jax.jit(lambda c: ops.decrypt(ctx, sk, c))(out[:1]))

    print(json.dumps({
        "metric": f"bfv_mul_relin_n{N}_k{LIMBS}",
        "value": round(ops_per_s, 3),
        "unit": "ops/s",
        "vs_baseline": round(ops_per_s / BASELINE_OPS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
