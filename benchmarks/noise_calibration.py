"""Noise-model calibration: analytic predicted vs empirically measured
invariant-noise budget per operation.

Replaces `benchmarks/cannonical_norm_noise_model` (reference dumps the
predicted-vs-measured noise per op to `Results.csv`). Run:
    python benchmarks/noise_calibration.py [--csv out.csv]
"""

import argparse
import csv
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

# calibration is a host-side sweep; don't occupy the (single-client)
# tunneled TPU for it
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from sunscreen_tpu.bfv import BfvParams, get_context, keys, ops  # noqa: E402
from sunscreen_tpu.compiler import Op, fhe_program  # noqa: E402
from sunscreen_tpu.compiler.ir import FheProgram  # noqa: E402
from sunscreen_tpu.compiler.noise import predicted_budget  # noqa: E402


def one_op_program(op: Op) -> FheProgram:
    p = FheProgram()
    a = p.add(Op.INPUT_CIPHERTEXT, (), 0)
    if op in (Op.ADD, Op.MULTIPLY):
        b = p.add(Op.INPUT_CIPHERTEXT, (), 1)
        x = p.add(op, (a, b))
        if op == Op.MULTIPLY:
            x = p.add(Op.RELINEARIZE, (x,))
    else:
        x = a
    p.outputs = [p.add(Op.OUTPUT_CIPHERTEXT, (x,))]
    return p


def measure(params: BfvParams, op: Op, samples: int = 4) -> float:
    ctx = get_context(params)
    key = jax.random.key(0)
    sk = keys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
    pk = keys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
    rlk = keys.gen_relin_key(ctx, sk, jax.random.fold_in(key, 2))
    budgets = []
    for i in range(samples):
        pt = np.random.default_rng(i).integers(
            0, ctx.t, ctx.n, dtype=np.uint64)
        ct = ops.encrypt(ctx, pk, pt, jax.random.fold_in(key, 10 + i))
        if op == Op.ADD:
            out = ops.add(ctx, ct, ct)
        elif op == Op.MULTIPLY:
            out = ops.multiply_relin(ctx, ct, ct, rlk)
        else:
            out = ct
        budgets.append(float(ops.invariant_noise_budget(ctx, sk, out)))
    return float(np.mean(budgets))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None)
    ap.add_argument("--degrees", default="1024,2048")
    ap.add_argument("--secure-degrees", default="4096",
                    help="comma list of N measured at real 128-bit "
                         "default params (reference sweeps lambda in "
                         "{128,192,256} x d; see "
                         "benchmarks/cannonical_norm_noise_model)")
    args = ap.parse_args()
    out = io.StringIO()
    w = csv.writer(out)
    w.writerow(["poly_degree", "security", "op", "predicted_budget",
                "measured_budget", "margin_bits"])

    def rows_for(params, n, lam):
        for op in (Op.INPUT_CIPHERTEXT, Op.ADD, Op.MULTIPLY):
            prog = one_op_program(op)
            pred = predicted_budget(prog, params)
            meas = measure(params, op)
            w.writerow([n, lam, op.value, f"{pred:.1f}", f"{meas:.1f}",
                        f"{meas - pred:.1f}"])

    for n in (int(x) for x in args.degrees.split(",") if x):
        rows_for(BfvParams.insecure(poly_degree=n, limbs=2,
                                    limb_bits=40), n, 0)
    for n in (int(x) for x in args.secure_degrees.split(",") if x):
        rows_for(BfvParams.default(n), n, 128)
    text = out.getvalue()
    print(text)
    if args.csv:
        Path(args.csv).write_text(text)
    # the analytic model must be conservative: predicted <= measured
    rows = [r.split(",") for r in text.strip().splitlines()[1:]]
    assert all(float(r[5]) >= -1.0 for r in rows), \
        "analytic model not conservative"


if __name__ == "__main__":
    main()
