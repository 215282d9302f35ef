"""Effective-HBM probe on the attached chip: times pure streaming ops
(u32 copy / add / the pmntt forward transform) and prints achieved
GB/s. Establishes the pass-structure roofline that multiply_relin is
measured against (PERF_NOTES round-5). Run on an idle host."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SUNSCREEN_TPU_NTT", "pallas")

import jax
import jax.numpy as jnp
import numpy as np

MB = 1 << 20


def timeit(name, fn, x, bytes_moved, reps=5, iters=10):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(x))
    np.asarray(out).ravel()[:4]  # real fetch: defeat early-return block
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = x
        for _ in range(iters):
            o = f(o)
        jax.block_until_ready(o)
        dt = time.perf_counter() - t0
        rates.append(bytes_moved * iters / dt)
    rates.sort()
    print(f"{name:44s} {rates[len(rates)//2]/1e9:7.1f} GB/s "
          f"(min {rates[0]/1e9:.1f} max {rates[-1]/1e9:.1f})", flush=True)


def main():
    n = 64 * MB  # 256 MB of u32
    x = jnp.arange(n, dtype=jnp.uint32)
    # read + write = 2 passes
    timeit("u32 negate (R+W, XLA elementwise)", lambda v: ~v, x, 8 * n)
    timeit("u32 add 1 (R+W, XLA elementwise)", lambda v: v + jnp.uint32(1),
           x, 8 * n)

    from sunscreen_tpu.math import ntt, primes
    N = 8192
    mods = tuple(int(q) for q in primes.gen_ntt_primes(29, 8, N))
    plan = ntt.get_plan(N, mods, mode="pallas")
    rows = 96
    y = (jnp.arange(rows * len(mods) * N, dtype=jnp.uint32)
         .reshape(rows, len(mods), N) % jnp.uint32(min(mods)))
    by = 2 * rows * len(mods) * N * 4  # one read + one write
    timeit(f"pmntt fwd transform ({rows}x8x{N})", plan.fwd, y, by)
    timeit(f"pmntt inv transform ({rows}x8x{N})", plan.inv, y, by)


if __name__ == "__main__":
    main()
