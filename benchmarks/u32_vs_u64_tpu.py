"""Real-TPU measurement: u32-engine vs u64-engine multiply_relin at
N=8192, default (128-bit secure) parameters. Round-3 lever validation
(benchmarks/PERF_NOTES.md). Usage:
  python benchmarks/u32_vs_u64_tpu.py [u32|u64] [ntt_mode] [batch]
"""
import os
import sys
import time

# NOTE: do NOT launch with PYTHONPATH=/root/repo — that env var breaks
# the axon TPU plugin's backend registration. Self-path instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

word = sys.argv[1] if len(sys.argv) > 1 else "u32"
mode = sys.argv[2] if len(sys.argv) > 2 else "unrolled"
batch = int(sys.argv[3]) if len(sys.argv) > 3 else 32
os.environ["SUNSCREEN_TPU_NTT"] = mode

import jax
import jax.numpy as jnp

from sunscreen_tpu.bfv import BfvParams, get_context, keys, ops
from sunscreen_tpu.bfv.keys import KswKey

N = 8192
params = (BfvParams.default_u32(N) if word == "u32"
          else BfvParams.default(N))
ctx = get_context(params)
print(f"word={word} mode={mode} batch={batch} k={ctx.k} "
      f"aux={len(ctx.aux_base.moduli)} "
      f"logQ={sum(q.bit_length() for q in params.coeff_modulus)}",
      flush=True)
key = jax.random.key(0)

t0 = time.perf_counter()

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

sk, rlk, cts = jax.block_until_ready(setup(key))
print(f"setup+compile {time.perf_counter()-t0:.1f}s  ct dtype={cts.dtype}",
      flush=True)

@jax.jit
def step(a, b, k0, k1):
    return ops.multiply_relin(ctx, a, b, KswKey(k0, k1))

t0 = time.perf_counter()
out = jax.block_until_ready(step(cts, cts, rlk.k0, rlk.k1))
print(f"step compile {time.perf_counter()-t0:.1f}s", flush=True)

for trial in range(3):
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(out, cts, rlk.k0, rlk.k1)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"trial {trial}: {batch*iters/dt:.0f} ops/s "
          f"({dt/iters*1e3:.2f} ms/step)", flush=True)

# sanity: decrypt one
d = jax.block_until_ready(jax.jit(lambda c: ops.decrypt(ctx, sk, c))(out[:1]))
print("decrypt ok", flush=True)
