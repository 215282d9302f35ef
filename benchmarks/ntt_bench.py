"""NTT throughput per chip (BASELINE.md: "NTT ops/s/chip at >=80% HBM
roofline"). Prints JSON lines with measured transforms/s and the HBM
roofline estimate.

Run on the real TPU: python benchmarks/ntt_bench.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sunscreen_tpu.math import ntt, primes  # noqa: E402

# this machine's chip reports as TPU v5 lite (v5e): ~819 GB/s HBM
HBM_GBS = 819.0


def bench(n: int, k: int, batch: int, iters: int = 10):
    moduli = tuple(primes.gen_ntt_primes(50, k, n))
    plan = ntt.get_plan(n, moduli)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.stack([
        np.stack([rng.integers(0, q, n, dtype=np.uint64)
                  for q in moduli]) for _ in range(batch)]))

    @jax.jit
    def fwd_many(x):
        return plan.fwd(x)

    out = jax.block_until_ready(fwd_many(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd_many(out)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    transforms = batch * k * iters / dt
    # bytes per transform: log2(n) stages x read+write of 8B coeffs
    stages = n.bit_length() - 1
    bytes_per = 2 * 8 * n * stages
    achieved_gbs = transforms * bytes_per / 1e9
    print(json.dumps({
        "metric": f"ntt_fwd_n{n}_k{k}_b{batch}",
        "value": round(transforms, 1),
        "unit": "transforms/s",
        "achieved_GBps_lower_bound": round(achieved_gbs, 1),
        "hbm_roofline_frac": round(achieved_gbs / HBM_GBS, 4),
    }))


if __name__ == "__main__":
    for n, k, b in ((4096, 3, 32), (8192, 3, 16), (16384, 3, 8)):
        bench(n, k, b)
