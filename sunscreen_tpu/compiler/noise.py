"""Noise models: canonical-embedding-norm analytic predictor + measured
model with target-noise ciphertext synthesis.

Replaces `sunscreen_backend/src/noise_model/` — `predict_noise` walking
the DAG applying a per-op `NoiseModel` (`mod.rs:38-170`), the
`CanonicalEmbeddingNormModel` (`canonical_embedding_norm.rs`, heuristics
from Iliashenko "Optimizations of Fully Homomorphic Encryption" pp.
45-48 and the SEAL 2.3.1 release notes), the invariant-noise <-> budget
conversions (`mod.rs:184-195`), and the `MeasuredModel` +
`TargetNoiseLevel` synthesis that burns budget by repeated
squaring/doubling to fabricate inputs at a chosen noise level
(`measured_model.rs:16-130`).

Noise is tracked as *invariant noise* |v| where t/Q*c(s) = m + v + a*t;
decryption succeeds iff |v| < 1/2. budget = -log2(2|v|).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from sunscreen_tpu.compiler.ir import FheProgram, Op

NOISE_STD_DEV = 3.24  # CBD(21) stddev, see sunscreen_tpu.math.sampling


def noise_to_noise_budget(invariant_noise: float) -> float:
    """budget = -log2(2|v|) (reference: `mod.rs:184`)."""
    if invariant_noise <= 0:
        return float("inf")
    return -math.log2(2.0 * invariant_noise)


def noise_budget_to_noise(budget: float) -> float:
    """|v| = 2^-budget / 2 (reference: `mod.rs:193`)."""
    return 2.0 ** (-budget) / 2.0


class CanonicalEmbeddingNormModel:
    """Canonical-embedding-norm upper bounds per op (reference:
    `canonical_embedding_norm.rs`; formula sources per its doc comment:
    encrypt/mul from Iliashenko pp. 45/48, add from SEAL 2.3.1 notes,
    relin empirically zero per `seal_fhe/tests/assumptions.rs`)."""

    def __init__(self, params):
        assert params.plain_modulus >= 2
        assert len(params.coeff_modulus) >= 1
        self.params = params
        self.q = float(params.q_product)
        self.t = float(params.plain_modulus)
        self.n = float(params.poly_degree)
        self.r_t = float(params.q_product % params.plain_modulus)

    def encrypt(self) -> float:
        t, n, q = self.t, self.n, self.q
        noise = (t * (n * (t - 1.0) / 2.0)
                 + 2.0 * NOISE_STD_DEV * math.sqrt(12.0 * n * n + 9.0 * n))
        return noise / q

    def add_ct_ct(self, v1: float, v2: float) -> float:
        return v1 + v2

    def add_ct_pt(self, v: float) -> float:
        return v + self.r_t * self.n * self.t / self.q

    def mul_ct_ct(self, v1: float, v2: float) -> float:
        t, n, q = self.t, self.n, self.q
        term_0 = t * math.sqrt(3.0 * n + 2.0 * n * n) * (v1 + v2)
        # the reference uses 3*v1 + v2 where the cited Iliashenko bound
        # has 3*v1*v2; we keep the reference's (larger, hence more
        # conservative for param search) form for parity.
        term_1 = 3.0 * v1 + v2
        term_2 = (t / q) * math.sqrt(
            3.0 * n + 2.0 * n * n + 4.0 / 3.0 * n * n * n)
        return term_0 + term_1 + term_2

    def mul_ct_pt(self, v: float) -> float:
        return v * self.n * (self.t - 1.0)

    def relinearize(self, v: float) -> float:
        return v

    def rotation(self, v: float) -> float:
        """Hybrid-keyswitch noise bound: the switched component adds
        |e_ks| <= k * N * B_err * q_max / p_sp before the t/Q scale,
        with B_err = 6 sigma. (The reference leaves a TODO here and
        charges a flat 8 budget bits — `canonical_embedding_norm.rs`
        shift_left — which caps every rotation-using program below any
        sane noise margin when the ANALYTIC model gates the param
        search; the reference never trips this because its search is
        measured-model-driven, `measured_model.rs`.)"""
        p = self.params
        k = len(p.coeff_modulus)
        q_max = float(max(p.coeff_modulus))
        e_ks = (k * self.n * 6.0 * NOISE_STD_DEV * q_max
                / float(p.special_modulus))
        return v + self.t * e_ks / self.q


def predict_noise(prog: FheProgram, params,
                  input_noise: float | None = None,
                  model: CanonicalEmbeddingNormModel | None = None
                  ) -> float:
    """Worst output invariant-noise BITS (log2 |v|) after evaluating
    `prog` (reference: `predict_noise`, `mod.rs:38-170`).

    `input_noise`: absolute invariant noise |v| to assume on ciphertext
    inputs (chained programs); default = fresh encryption noise.
    """
    mdl = model or CanonicalEmbeddingNormModel(params)
    fresh = input_noise if input_noise is not None else mdl.encrypt()
    noise: list[float] = [0.0] * len(prog.nodes)
    for i, node in enumerate(prog.nodes):
        ops_ = node.operands
        if node.op == Op.INPUT_CIPHERTEXT:
            noise[i] = fresh
        elif node.op in (Op.INPUT_PLAINTEXT, Op.LITERAL):
            noise[i] = 0.0
        elif node.op in (Op.ADD, Op.SUB):
            noise[i] = mdl.add_ct_ct(noise[ops_[0]], noise[ops_[1]])
        elif node.op in (Op.ADD_PLAIN, Op.SUB_PLAIN):
            noise[i] = mdl.add_ct_pt(noise[ops_[0]])
        elif node.op == Op.MULTIPLY:
            noise[i] = mdl.mul_ct_ct(noise[ops_[0]], noise[ops_[1]])
        elif node.op == Op.MULTIPLY_PLAIN:
            noise[i] = mdl.mul_ct_pt(noise[ops_[0]])
        elif node.op == Op.NEGATE:
            noise[i] = noise[ops_[0]]
        elif node.op == Op.RELINEARIZE:
            noise[i] = mdl.relinearize(noise[ops_[0]])
        elif node.op in (Op.SHIFT_LEFT, Op.SHIFT_RIGHT, Op.SWAP_ROWS):
            noise[i] = mdl.rotation(noise[ops_[0]])
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


# ---------------------------------------------------------------------------
# measured model (runs the real kernels)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TargetNoiseLevel:
    """Input-noise specification for `MeasuredModel` (reference:
    `TargetNoiseLevel`, measured_model.rs:16-39). budget=None means a
    fresh encryption."""

    budget: float | None = None

    @staticmethod
    def fresh() -> "TargetNoiseLevel":
        return TargetNoiseLevel(None)


def create_ciphertext_with_noise_level(ctx, pk, sk, rlk, target_budget,
                                       key):
    """Synthesize a ciphertext of 0 with ~`target_budget` bits left by
    burning budget: repeated squaring (quadratic), then doubling
    (linear) — the reference's escalation ladder
    (`create_ciphertext_with_noise_level`, measured_model.rs:57-225)."""
    import jax
    import numpy as np

    from sunscreen_tpu.bfv import ops
    from sunscreen_tpu.bfv.keys import KswKey

    zero = np.zeros(ctx.n, dtype=np.uint64)
    ct = ops.encrypt(ctx, pk, zero, key)
    if float(ops.invariant_noise_budget(ctx, sk, ct)) <= target_budget:
        return ct
    dbl = jax.jit(lambda c: ops.add(ctx, c, c))
    ladder = [dbl]
    if rlk is not None:
        sq = jax.jit(lambda c, k0, k1: ops.multiply_relin(
            ctx, c, c, KswKey(k0, k1)))
        ladder = [lambda c: sq(c, rlk.k0, rlk.k1), dbl]
    # keep the last ciphertext whose budget stays >= target, escalating
    # from the coarse burner (squaring) to the fine one (doubling)
    for burn in ladder:
        while True:
            cand = burn(ct)
            b = float(ops.invariant_noise_budget(ctx, sk, cand))
            if b < target_budget:
                break
            ct = cand
            if b == target_budget:
                return ct
    return ct


class MeasuredModel:
    """Empirical model: encrypt inputs (fresh or at a target noise
    level), run the lowered program, measure output budgets on device
    (reference: `MeasuredModel`, measured_model.rs — "all other models
    should bound its results from above")."""

    def __init__(self, compiled, params, seed: int = 0,
                 input_targets: list | None = None):
        import jax
        import numpy as np

        from sunscreen_tpu.bfv import get_context, keys, ops
        from sunscreen_tpu.compiler.lower import lower_program

        ctx = get_context(params)
        key = jax.random.key(seed)
        sk = keys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
        pk = keys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
        need_rlk = compiled.requires_relin_keys or any(
            t is not None and t.budget is not None
            for t in (input_targets or []))
        rlk = keys.gen_relin_key(ctx, sk, jax.random.fold_in(key, 2)) \
            if need_rlk else None
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
        targets = input_targets or [TargetNoiseLevel.fresh()] * n_ct
        assert len(targets) >= n_ct
        args = []
        for i in range(n_ct):
            tgt = targets[i]
            k = jax.random.fold_in(key, 10 + i)
            if tgt is None or tgt.budget is None:
                args.append(ops.encrypt(ctx, pk, zero, k))
            else:
                args.append(create_ciphertext_with_noise_level(
                    ctx, pk, sk, rlk, tgt.budget, k))
        args += [zero] * n_pt
        outs = fn(*args)
        self.budgets = [
            float(ops.invariant_noise_budget(ctx, sk, o)) for o in outs]

    @property
    def worst_budget(self) -> float:
        return min(self.budgets)
