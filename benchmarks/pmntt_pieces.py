"""Per-piece TPU timings of the fused pmntt NTT (v3 absorbed-weight
stages): the full transforms, each stage kernel alone, the inter-stage
transposes, and a dot-only kernel variant so MXU vs VPU attribution is
direct. Usage: python benchmarks/pmntt_pieces.py [rows]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

rows = int(sys.argv[1]) if len(sys.argv) > 1 else 96

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sunscreen_tpu.math import pmntt, primes

N = 8192
K = 7
mods = tuple(int(q) for q in primes.gen_ntt_primes(27, K, N))
plan = pmntt.PallasMatmulNttPlan(N, mods)
n1, n2 = plan.n1, plan.n2
rng = np.random.default_rng(0)


def bench(label, fn, *args, iters=20):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    # force a real host materialization: on the tunneled chip,
    # block_until_ready alone returns early until a fetch has happened
    # (round-3 measurement gotcha — timings were fantasy without this)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
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

# full transforms
bench("fwd", plan.fwd, x)
bench("inv", plan.inv, x)
bench("fwd+inv", lambda v: plan.inv(plan.fwd(v)), x)

# merged transform kernels alone (input pre-laid-out)
kr = K * rows
bb = plan._bb(rows)
x4 = jnp.asarray(rng.integers(0, min(mods), (rows, K, n2, n1)),
                 jnp.uint32)
consts = jnp.asarray(plan.consts)
s1_m, s1_b = map(jnp.asarray, plan.s1_m)
s2_m, s2_b = map(jnp.asarray, plan.s2_m)
twf = tuple(map(jnp.asarray, plan.tw_f))

ff = pmntt._make_transform(False, N, K, rows, bb, n1, interpret=False)
bench("merged fwd kernel",
      lambda v: ff(consts, v, s1_m, s1_b, s2_m, s2_b, *twf), x4)


# dot-only kernel: the s1 dot shape with no recombine/transpose
def _dot_only(k, rows, bb, n1):
    rpb = rows // bb

    def kernel(x_r, m_r, o_r):
        a = x_r[:].reshape(bb * n1, 512)
        p = jnp.dot(a, m_r[0], preferred_element_type=jnp.int32)
        o_r[:] = p[:, :128].reshape(bb, n1, 128).astype(jnp.uint32)

    def imap_x(i, j):
        return (i * rpb + j, jnp.int32(0), jnp.int32(0))

    def imap_limb(i, j):
        return (i, jnp.int32(0), jnp.int32(0))

    return pl.pallas_call(
        kernel,
        grid=(k, rpb),
        in_specs=[
            pl.BlockSpec((bb, n1, 512), imap_x, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 512, 4 * 128), imap_limb,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, n1, 128), imap_x,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * rows, n1, 128), jnp.uint32),
    )


xb = jnp.asarray(rng.integers(-128, 128, (kr, n1, 512)), jnp.int8)
fd = _dot_only(K, rows, bb, n1)
bench("dot-only kernel", lambda v: fd(v, s1_m), xb)
