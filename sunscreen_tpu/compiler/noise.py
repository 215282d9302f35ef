"""Noise models: analytic invariant-noise predictor + measured model.

Replaces `sunscreen_backend/src/noise_model/` — `predict_noise` walking
the DAG applying a per-op model (`mod.rs:38-170`), the
`CanonicalEmbeddingNormModel` analytic model
(`canonical_embedding_norm.rs`) and the `MeasuredModel` that actually
encrypts and runs the program (`measured_model.rs:57-130`).

Noise is tracked as *invariant noise bits*: log2(|v|) where
t/Q * c(s) = m + v + a*t; decryption succeeds iff |v| < 1/2, i.e.
bits < -1. Budget = -(bits + 1).
"""

from __future__ import annotations

import math

from sunscreen_tpu.compiler.ir import FheProgram, Op

SIGMA = 3.24  # CBD(21) stddev, see sunscreen_tpu.math.sampling
B = 6 * SIGMA  # high-probability noise bound


def fresh_noise_bits(params) -> float:
    """Invariant-noise bits of a fresh asymmetric encryption:
    v = (t/Q)*(e1 + e2*s - e*u + rounding). Canonical-embedding-style
    heuristic bound: |v| <= (t/Q) * B * (1 + 2*N*Vs) with Vs = 2/3
    ternary variance folded into a sqrt — we use the conservative
    worst-case 2NB like the reference's measured fresh noise scale."""
    t, n = params.plain_modulus, params.poly_degree
    q = params.q_product
    v = (t / q) * B * (2 * math.sqrt(n * 2.0 / 3.0) * 6 + 1)
    return math.log2(v)


def predict_noise(prog: FheProgram, params, input_noise: float | None = None
                  ) -> float:
    """Worst output invariant-noise bits after evaluating `prog`.

    Per-op rules (reference `NoiseModel` trait surface, `mod.rs:200-272`):
      add: v1 + v2
      add_plain: v + t*N/(2Q) (rounding term)
      mul: ~ 2*t*sqrt(3N) * (v1 + v2)  [relin adds negligible]
      mul_plain: v * N*t/2
      rotation/relin: + tiny keyswitch noise
    """
    t, n = params.plain_modulus, params.poly_degree
    q = params.q_product
    fresh = input_noise if input_noise is not None \
        else 2.0 ** fresh_noise_bits(params)
    ks = (t / q) * B * n * len(params.coeff_modulus) \
        * max(params.coeff_modulus) / params.special_modulus
    noise: list[float] = [0.0] * len(prog.nodes)
    for i, node in enumerate(prog.nodes):
        ops_ = node.operands
        if node.op == Op.INPUT_CIPHERTEXT:
            noise[i] = fresh
        elif node.op in (Op.INPUT_PLAINTEXT, Op.LITERAL):
            noise[i] = 0.0
        elif node.op in (Op.ADD, Op.SUB):
            noise[i] = noise[ops_[0]] + noise[ops_[1]]
        elif node.op in (Op.ADD_PLAIN, Op.SUB_PLAIN):
            noise[i] = noise[ops_[0]] + t * n / (2.0 * q)
        elif node.op == Op.MULTIPLY:
            v1, v2 = noise[ops_[0]], noise[ops_[1]]
            noise[i] = 2.0 * t * math.sqrt(3.0 * n) * (v1 + v2) \
                + t * math.sqrt(n) * 3.0 / q
        elif node.op == Op.MULTIPLY_PLAIN:
            noise[i] = noise[ops_[0]] * (n * t / 2.0)
        elif node.op == Op.NEGATE:
            noise[i] = noise[ops_[0]]
        elif node.op in (Op.RELINEARIZE, Op.SHIFT_LEFT, Op.SHIFT_RIGHT,
                         Op.SWAP_ROWS):
            noise[i] = noise[ops_[0]] + ks
        elif node.op == Op.OUTPUT_CIPHERTEXT:
            noise[i] = noise[ops_[0]]
        else:
            raise ValueError(node.op)
    outs = [noise[o] for o in prog.outputs] or [fresh]
    worst = max(outs)
    return math.log2(worst) if worst > 0 else -float("inf")


def predicted_budget(prog: FheProgram, params) -> float:
    """Noise budget bits remaining on the worst output."""
    return -(predict_noise(prog, params) + 1.0)


class MeasuredModel:
    """Empirical model: encrypt fresh ciphertexts, run the lowered
    program, measure the worst output budget on device (reference:
    `measured_model.rs:57-130` — it likewise executes the program).
    """

    def __init__(self, compiled, params, seed: int = 0):
        import jax
        import numpy as np

        from sunscreen_tpu.bfv import get_context, keys, ops
        from sunscreen_tpu.compiler.lower import lower_program

        ctx = get_context(params)
        key = jax.random.key(seed)
        sk = keys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
        pk = keys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
        rlk = keys.gen_relin_key(ctx, sk, jax.random.fold_in(key, 2)) \
            if compiled.requires_relin_keys else None
        gks = None
        if compiled.requires_galois_keys:
            gks = keys.gen_galois_keys(
                ctx, sk, jax.random.fold_in(key, 3),
                keys.default_rotation_elements(ctx))
        fn = lower_program(compiled, ctx, rlk, gks)
        n_ct = sum(1 for nd in compiled.nodes
                   if nd.op == Op.INPUT_CIPHERTEXT)
        n_pt = sum(1 for nd in compiled.nodes
                   if nd.op == Op.INPUT_PLAINTEXT)
        zero = np.zeros(ctx.n, dtype=np.uint64)
        args = [ops.encrypt(ctx, pk, zero, jax.random.fold_in(key, 10 + i))
                for i in range(n_ct)]
        args += [zero] * n_pt
        outs = fn(*args)
        self.budgets = [
            float(ops.invariant_noise_budget(ctx, sk, o)) for o in outs]

    @property
    def worst_budget(self) -> float:
        return min(self.budgets)
