"""Per-piece TPU timings of the hybrid pmntt NTT (einsums, recombine
kernel, layout transposes) — small compile units so regressions are
attributable. Usage: python benchmarks/pmntt_pieces.py [rows]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

rows = int(sys.argv[1]) if len(sys.argv) > 1 else 96

import jax
import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.math import pmntt, primes

N = 8192
K = 7
mods = tuple(int(q) for q in primes.gen_ntt_primes(27, K, N))
plan = pmntt.PallasMatmulNttPlan(N, mods)
n1, n2 = plan.n1, plan.n2
NC = pmntt.NC
rng = np.random.default_rng(0)


def bench(label, fn, *args, iters=20):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(*args))
    print(f"{label}: compile {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.3f} ms ({dt/(rows*K)*1e6:.2f} us/poly)",
          flush=True)
    return out


x = jnp.asarray(rng.integers(0, min(mods), (rows, K, N)), jnp.uint32)

# 1. entry transpose [r,k,(i2,i1)] -> [k,r,i1,i2]
bench("entry transpose", lambda v: jnp.transpose(
    v.reshape(rows, K, n2, n1), (1, 0, 3, 2)), x)

# 2. einsum 1 (k-major, adjacent contract+byte)
a = jnp.asarray(rng.integers(0, min(mods), (K, rows, n1, n2)),
                jnp.uint32)
a8 = jax.lax.bitcast_convert_type(a, jnp.uint8)
bench("einsum1 (contract i2)", lambda v: jnp.einsum(
    "krijl,kjlp->krpi", v, plan.m2_big,
    preferred_element_type=jnp.int32), a8)

# 3. recombine kernel with twiddle
p1 = jnp.asarray(rng.integers(0, 1 << 24, (K * rows, NC, N)),
                 jnp.int32)
bb = plan._bb(rows)
print(f"bb={bb}", flush=True)
f1 = pmntt._make_recombine(N, K, rows, bb, twiddle=True,
                           interpret=False)
bench("recombine+twiddle", lambda v: f1(
    plan.consts, v, plan.tw_f, plan.tw_f_sh), p1)

# 4. einsum 2
y = jnp.asarray(rng.integers(0, min(mods), (K, rows, n2, n1)),
                jnp.uint32)
y8 = jax.lax.bitcast_convert_type(y, jnp.uint8)
bench("einsum2 (contract i1)", lambda v: jnp.einsum(
    "krjil,kilp->krpj", v, plan.m1_big,
    preferred_element_type=jnp.int32), y8)

# 5. recombine without twiddle
f2 = pmntt._make_recombine(N, K, rows, bb, twiddle=False,
                           interpret=False)
bench("recombine", lambda v: f2(plan.consts, v), p1)

# 6. full fwd / inv
bench("full fwd", plan.fwd, x)
yy = jax.block_until_ready(jax.jit(plan.fwd)(x))
bench("full inv", plan.inv, yy)
