"""TFHE micro-op throughput: CMUX (the blind-rotate hot op) and
LWE keyswitch at the reference's 80-bit parameters (reference:
criterion groups `CMux` and keyswitch in
`sunscreen_tfhe/benches/ops.rs:27-404`).

Usage: python benchmarks/tfhe_micro_bench.py [batch] [iters]
Run WITHOUT a cpu override to target the TPU. Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sunscreen_tpu.tfhe import (GlweDef, LweDef,  # noqa: E402
                                RadixDecomposition)
from sunscreen_tpu.tfhe import ops, torus  # noqa: E402

LWE = LweDef(dim=512, std=0.000001842343446823844)
GLWE = GlweDef(size=1, poly_degree=1024, std=1.0900242107812643e-12)
CMUX_RADIX = RadixDecomposition(count=3, radix_log=4)
KS_RADIX = RadixDecomposition(count=8, radix_log=6)


def timeit(fn, *args):
    out = jax.block_until_ready(fn(*args))   # compile
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # real fetch once
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.key(5)
    glwe_sk = ops.generate_binary_glwe_sk(GLWE,
                                          jax.random.fold_in(key, 0))
    lwe_sk = ops.generate_binary_lwe_sk(LWE, jax.random.fold_in(key, 1))
    flat = ops.flatten_glwe_sk(glwe_sk)
    ksk = ops.generate_keyswitch_key(flat, lwe_sk, LWE, KS_RADIX,
                                     jax.random.fold_in(key, 2))
    msgs = jnp.zeros((batch, GLWE.poly_degree), dtype=jnp.uint64)
    d0 = jax.vmap(lambda k: ops.encrypt_glwe(msgs[0], glwe_sk, GLWE, k))(
        jax.random.split(jax.random.fold_in(key, 3), batch))
    d1 = jax.vmap(lambda k: ops.encrypt_glwe(msgs[0] + 1, glwe_sk,
                                             GLWE, k))(
        jax.random.split(jax.random.fold_in(key, 4), batch))
    sel = ops.encrypt_ggsw(1, glwe_sk, GLWE, CMUX_RADIX,
                           jax.random.fold_in(key, 5))

    @jax.jit
    def cmux_batch(a, b):
        return ops.cmux(sel, a, b, GLWE, CMUX_RADIX)

    t_cmux = timeit(cmux_batch, d0, d1)

    lwe_cts = jax.vmap(lambda k: ops.encrypt_lwe(
        torus.encode(jnp.uint64(1), 2), flat, GLWE.as_lwe, k))(
        jax.random.split(jax.random.fold_in(key, 6), batch))

    @jax.jit
    def ks_batch(cts):
        return jax.vmap(lambda c: ops.keyswitch_lwe_to_lwe(
            c, ksk, LWE, KS_RADIX))(cts)

    t_ks = timeit(ks_batch, lwe_cts)

    print(json.dumps({
        "metric": "tfhe_micro_lwe512_glwe1x1024",
        "batch": batch,
        "cmux_us": round(t_cmux / batch * 1e6, 1),
        "cmux_per_s": round(batch / t_cmux, 1),
        "keyswitch_us": round(t_ks / batch * 1e6, 1),
        "keyswitch_per_s": round(batch / t_ks, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
