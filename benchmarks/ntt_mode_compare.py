"""Head-to-head steady-state cost of one forward+inverse NTT pass per
lowering mode on the real TPU (u32 engine envelope: 27-bit moduli,
N=8192). Usage: python benchmarks/ntt_mode_compare.py [mode] [rows]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1] if len(sys.argv) > 1 else "pallas"
rows = int(sys.argv[2]) if len(sys.argv) > 2 else 96

import jax
import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.math import ntt, primes

N = 8192
K = 7
mods = tuple(int(q) for q in primes.gen_ntt_primes(27, K, N))
plan = ntt.get_plan(N, mods, mode=mode)
word = plan.word
print(f"mode={mode} plan={type(plan).__name__} word={np.dtype(word.dtype if hasattr(word, 'dtype') else 'uint32').name if word == jnp.uint32 else 'uint64'} rows={rows} k={K} N={N}", flush=True)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, min(mods), (rows, K, N)), dtype=word)

fwd = jax.jit(plan.fwd)
inv = jax.jit(plan.inv)
both = jax.jit(lambda v: plan.inv(plan.fwd(v)))

t0 = time.perf_counter()
y = jax.block_until_ready(fwd(x))
print(f"fwd compile {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
_ = jax.block_until_ready(inv(y))
print(f"inv compile {time.perf_counter()-t0:.1f}s", flush=True)
_ = jax.block_until_ready(both(x))

for label, fn, arg in (("fwd", fwd, x), ("inv", inv, y), ("fwd+inv", both, x)):
    iters = 20
    out = jax.block_until_ready(fn(arg))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(arg)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    per_poly = dt / (rows * K) * 1e6
    print(f"{label}: {dt*1e3:.3f} ms  ({per_poly:.2f} us/poly)", flush=True)
