"""Bulletproofs + MSM benchmark harness.

Covers the reference's criterion suites:
- `sunscreen/benches/fractional_range_proof.rs` — the unshield-tx
  range proof over [[Field; 8]; 64] binary-coefficient inputs
  (prover + verifier wall time);
- `sunscreen_math/src/*_impl/multiexp.rs` — MSM throughput, C++
  Pippenger (production) vs the device Pippenger (zk/tpu_curve.py)
  when SUNSCREEN_TPU_MSM_BENCH=1.

Usage: python benchmarks/zkp_bench.py [msm_n]
Prints one JSON line; recorded numbers: benchmarks/PERF_NOTES.md.
"""

import json
import os
import secrets
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MSM_N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096


def fractional_range_proof():
    from sunscreen_tpu.runtime import Runtime
    from sunscreen_tpu.types.zkp_types import (Constant, Field,
                                               Private, zkp_program)

    @zkp_program()
    def in_range(balance: Private[Field, (64, 8)],
                 unshielded: Constant[Field]):
        # recombine 64 coefficients of 8 two's-complement bits each,
        # then the value from the coefficients (reference bench's
        # to_field_element / get_coeffs)
        def coeff(bits):
            acc = None
            for i, b in enumerate(bits):
                w = (1 << i) if i < 7 else -(1 << 7)
                t = b * w
                acc = t if acc is None else acc + t
            return acc

        val = None
        for j, row in enumerate(balance):
            t = coeff(row) * (1 << j)
            val = t if val is None else val + t
        (val - unshielded).to_unsigned(8)

    # balance 7 = 3*1 + 2*2 (the reference's carryless test vector)
    bal = [[0] * 8 for _ in range(64)]
    bal[0][0] = 1
    bal[0][1] = 1   # coeff 3
    bal[1][1] = 1   # coeff 2
    flat = [b for row in bal for b in row]

    rt = Runtime.new_zkp()
    t0 = time.perf_counter()
    proof = rt.prove(in_range, flat, constant_inputs=[4])
    t_prove = time.perf_counter() - t0
    t0 = time.perf_counter()
    ok = rt.verify(in_range, proof, constant_inputs=[4])
    t_verify = time.perf_counter() - t0
    assert ok
    return t_prove, t_verify, len(proof.to_bytes())


def linked_proof_bench():
    """Typed linked proof (SDLP + BP + compressed bridge) prove/verify
    time and serialized component sizes (reference surface:
    `sunscreen_runtime/src/linked.rs` + `benches/fractional_range_proof.rs`
    linked variant)."""
    from sunscreen_tpu.bfv import BfvParams
    from sunscreen_tpu.runtime import Runtime
    from sunscreen_tpu.runtime.linked import LogProofBuilder
    from sunscreen_tpu.types import Signed
    from sunscreen_tpu.types.zkp_types import (BfvSigned, Field, Linked,
                                               Public, zkp_program)

    @zkp_program()
    def in_balance(balance: Linked[BfvSigned], unshielded: Public[Field]):
        balance.constrain_fresh_encoding()
        diff = balance.into_field_elem() - unshielded
        diff.to_unsigned(16)
        unshielded.to_unsigned(16)

    params = BfvParams.insecure(poly_degree=64, limbs=1, limb_bits=28)
    rt = Runtime.new_fhe_zkp(params)
    pub, _ = rt.generate_keys(seed=3, galois=False, relin=False)
    builder = LogProofBuilder(rt)
    builder.encrypt_returning_link(Signed(1000), pub, seed=5)
    t0 = time.perf_counter()
    proof = builder.build_linked(in_balance, public_inputs=[400])
    t_prove = time.perf_counter() - t0
    t0 = time.perf_counter()
    ok = proof.verify(in_balance, public_inputs=[400])
    t_verify = time.perf_counter() - t0
    assert ok
    return t_prove, t_verify, proof.size_bytes()


def msm_bench(n):
    from sunscreen_tpu.zk import curve25519 as cv
    from sunscreen_tpu.zk import native

    scalars = [secrets.randbelow(cv.L) for _ in range(n)]
    points = [cv.BASEPOINT * secrets.randbelow(cv.L) for _ in range(64)]
    points = points * (n // 64)
    t0 = time.perf_counter()
    want = native.msm(scalars, points)
    t_cpp = time.perf_counter() - t0
    t_tpu = None
    if os.environ.get("SUNSCREEN_TPU_MSM_BENCH") == "1":
        import jax

        from sunscreen_tpu.zk import tpu_curve as tc
        got = tc.msm(scalars, points)   # compile + run
        assert got == want
        t0 = time.perf_counter()
        got = tc.msm(scalars, points)
        jax.block_until_ready  # noqa: B018 (host sync via result)
        t_tpu = time.perf_counter() - t0
        assert got == want
    return t_cpp, t_tpu


def main():
    t_prove, t_verify, size = fractional_range_proof()
    lp_prove, lp_verify, lp_sizes = linked_proof_bench()
    t_cpp, t_tpu = msm_bench(MSM_N)
    print(json.dumps({
        "metric": "zkp_bench",
        "frp_prove_s": round(t_prove, 2),
        "frp_verify_s": round(t_verify, 2),
        "frp_proof_bytes": size,
        "linked_prove_s": round(lp_prove, 2),
        "linked_verify_s": round(lp_verify, 2),
        "linked_bytes": lp_sizes,
        "msm_n": MSM_N,
        "msm_cpp_s": round(t_cpp, 3),
        "msm_tpu_s": None if t_tpu is None else round(t_tpu, 3),
    }))


if __name__ == "__main__":
    main()
