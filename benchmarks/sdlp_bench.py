"""SDLP create/verify benchmark over a real BFV PublicKeyEncryption
statement at production parameters (reference:
`logproof/benches/linear_relation.rs:4-235` and the SEAL statement
tests `logproof/tests/seal.rs:10-56`, which run N=1024..8192).

Usage: python benchmarks/sdlp_bench.py [N] [limbs] [limb_bits]
Prints phase timings and one JSON summary line. Recorded results:
benchmarks/PERF_NOTES.md "SDLP at scale".
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
LIMBS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
LIMB_BITS = int(sys.argv[3]) if len(sys.argv) > 3 else 28

import jax  # noqa: E402
import numpy as np  # noqa: E402

from sunscreen_tpu.bfv import BfvParams, get_context, keys, ops  # noqa: E402
from sunscreen_tpu.logproof import (LogProofGenerators, create,  # noqa: E402
                                    verify)
from sunscreen_tpu.logproof import inner_product as ip  # noqa: E402
from sunscreen_tpu.logproof.bfv_statement import BfvStatements  # noqa: E402
from sunscreen_tpu.zk.merlin import Transcript  # noqa: E402


def main():
    params = BfvParams.insecure(poly_degree=N, limbs=LIMBS,
                                limb_bits=LIMB_BITS)
    ctx = get_context(params)
    key = jax.random.key(7)
    sk = keys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
    pk = keys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
    rng = np.random.default_rng(0)
    pt = rng.integers(0, ctx.t, ctx.n, dtype=np.uint64)
    ct, (u, e0, e1) = ops.encrypt_return_components(
        ctx, pk, pt, jax.random.fold_in(key, 2))

    st = BfvStatements(ctx)
    mid = st.add_message(pt)
    st.add_public_encryption(mid, np.asarray(ct), pk, np.asarray(u),
                             np.asarray(e0), np.asarray(e1))
    t0 = time.perf_counter()
    vk, pk_know = st.build()
    t_build = time.perf_counter() - t0
    print(f"statement build: {t_build:.1f}s  l={vk.l} bits "
          f"(n={vk.n} m={vk.m} k={vk.k} d={vk.d})", flush=True)

    t0 = time.perf_counter()
    gens = LogProofGenerators(vk.l)
    t_gens = time.perf_counter() - t0
    print(f"generators: {t_gens:.1f}s", flush=True)
    u_gen = ip.get_u()

    t0 = time.perf_counter()
    proof = create(Transcript(b"bfv-sdlp"), pk_know, gens.g, gens.h,
                   u_gen, gens=gens)
    t_create = time.perf_counter() - t0
    print(f"create: {t_create:.1f}s", flush=True)

    t0 = time.perf_counter()
    ok = verify(proof, Transcript(b"bfv-sdlp"), vk, gens.g, gens.h,
                u_gen, gens=gens)
    t_verify = time.perf_counter() - t0
    print(f"verify: {t_verify:.1f}s ok={ok}", flush=True)
    assert ok

    size = len(proof.to_bytes())
    print(json.dumps({
        "metric": f"sdlp_pke_n{N}_k{LIMBS}",
        "l_bits": vk.l,
        "build_s": round(t_build, 2),
        "gens_s": round(t_gens, 2),
        "create_s": round(t_create, 2),
        "verify_s": round(t_verify, 2),
        "proof_bytes": size,
    }))


if __name__ == "__main__":
    main()
