"""Round-5 A/B matrix for the multiply_relin fusion flags, measured as
whole steps on the real chip in ONE process (env flags are read at
trace time, so each combo re-traces; the persistent cache makes reruns
cheap). Run on an idle host. Usage:
  python benchmarks/r5_ab.py [batch] [iters] [reps]
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
batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
params = BfvParams.default_u32(N)
ctx = get_context(params)
key = jax.random.key(0)


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
np.asarray(cts[0, 0, 0, :4])  # real fetch: defeat early-return block

COMBOS = [
    # (KSFULL, FT3, TFULL, FBB_KB) — None = leave default
    ("r4 two-kernel paths", dict(SUNSCREEN_TPU_FUSE_KSFULL="0",
                                 SUNSCREEN_TPU_FUSE_FT3="0",
                                 SUNSCREEN_TPU_FUSE_TFULL="0")),
    ("ks_full only", dict(SUNSCREEN_TPU_FUSE_KSFULL="1",
                          SUNSCREEN_TPU_FUSE_FT3="0",
                          SUNSCREEN_TPU_FUSE_TFULL="0")),
    ("ft3 only", dict(SUNSCREEN_TPU_FUSE_KSFULL="0",
                      SUNSCREEN_TPU_FUSE_FT3="1",
                      SUNSCREEN_TPU_FUSE_TFULL="0")),
    ("ks_full + ft3 (bench default)", dict(SUNSCREEN_TPU_FUSE_KSFULL="1",
                                           SUNSCREEN_TPU_FUSE_FT3="1",
                                           SUNSCREEN_TPU_FUSE_TFULL="0")),
    ("ks_full + tfull", dict(SUNSCREEN_TPU_FUSE_KSFULL="1",
                             SUNSCREEN_TPU_FUSE_FT3="1",
                             SUNSCREEN_TPU_FUSE_TFULL="1")),
    ("ks_full + ft3, fbb 512K (bb=16)",
     dict(SUNSCREEN_TPU_FUSE_KSFULL="1", SUNSCREEN_TPU_FUSE_FT3="1",
          SUNSCREEN_TPU_FUSE_TFULL="0", SUNSCREEN_TPU_PMNTT_FBB_KB="512")),
]

extra = os.environ.get("SUNSCREEN_TPU_AB_ONLY")
for name, env in COMBOS:
    if extra and extra not in name:
        continue
    os.environ.update(env)
    step = jax.jit(lambda a, b, k0, k1, _n=name: ops.multiply_relin(
        ctx, a, b, KswKey(k0, k1)))
    try:
        out = jax.block_until_ready(step(cts, cts, rlk.k0, rlk.k1))
    except Exception as e:
        print(f"{name:36s} COMPILE/RUN FAIL: {str(e)[:120]}", flush=True)
        continue
    # real fetch per compiled step: block_until_ready alone can return
    # early for a fresh executable (b128 round-5 runs read 4e6 ops/s
    # without this)
    np.asarray(out[0, 0, 0, :4])
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(out, cts, rlk.k0, rlk.k1)
        jax.block_until_ready(out)
        rates.append(batch * iters / (time.perf_counter() - t0))
    rates.sort()
    print(f"{name:36s} {rates[len(rates)//2]:8.1f} ops/s  "
          f"(min {rates[0]:.0f} max {rates[-1]:.0f})", flush=True)
