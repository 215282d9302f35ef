"""Round-5 tuning sweep for the bench.py workload: batch size x block
sizes (BB/FBB) x fusion flags, measured as whole multiply_relin steps
on the real chip. Run on an IDLE host (concurrent python inflates
numbers 2-30x — PERF_NOTES round-3 hygiene note). Usage:
  python benchmarks/r5_sweep.py [batch ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SUNSCREEN_TPU_NTT", "pallas")

import jax
import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.bfv import BfvParams, get_context, keys, ops
from sunscreen_tpu.bfv.keys import KswKey

N = 8192
batches = [int(a) for a in sys.argv[1:]] or [32, 64, 128]
params = BfvParams.default_u32(N)
ctx = get_context(params)
key = jax.random.key(0)


def make_inputs(batch):
    @jax.jit
    def setup(key):
        sk = keys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
        pk = keys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
        rlk = keys.gen_relin_key(ctx, sk, jax.random.fold_in(key, 2))
        pts = (jnp.arange(batch * ctx.n, dtype=jnp.uint64)
               .reshape(batch, ctx.n) % jnp.uint64(ctx.t))
        cts = jax.vmap(lambda p, k: ops.encrypt(ctx, pk, p, k))(
            pts, jax.random.split(jax.random.fold_in(key, 3), batch))
        return sk, rlk, cts
    return jax.block_until_ready(setup(key))


def measure(cts, rlk, iters=20, reps=5):
    step = jax.jit(lambda a, b, k0, k1: ops.multiply_relin(
        ctx, a, b, KswKey(k0, k1)))
    out = jax.block_until_ready(step(cts, cts, rlk.k0, rlk.k1))
    np.asarray(out[0, 0, 0, :4])  # real fetch: defeat early-return block
    rates = []
    batch = cts.shape[0]
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(out, cts, rlk.k0, rlk.k1)
        jax.block_until_ready(out)
        rates.append(batch * iters / (time.perf_counter() - t0))
    rates.sort()
    return rates[len(rates) // 2]


for batch in batches:
    sk, rlk, cts = make_inputs(batch)
    r = measure(cts, rlk)
    print(f"batch={batch:4d}  BB_KB={os.environ.get('SUNSCREEN_TPU_PMNTT_BB_KB', '1024')}"
          f"  FBB_KB={os.environ.get('SUNSCREEN_TPU_PMNTT_FBB_KB', '256')}"
          f"  FUSE_KS={os.environ.get('SUNSCREEN_TPU_FUSE_KS', '1')}"
          f"  -> {r:8.1f} ops/s", flush=True)
