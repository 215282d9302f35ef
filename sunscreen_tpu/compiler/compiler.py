"""Compiler builder: trace -> passes -> params search -> Application.

Replaces `sunscreen/src/compiler.rs:261-720` (`GenericCompiler` /
`FheCompiler`), `sunscreen/src/params.rs` (`PlainModulusConstraint`,
`determine_params`) and `sunscreen/src/lib.rs:83-218` (`Application`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from sunscreen_tpu.bfv.params import MAX_LOG_Q, BfvParams, \
    batching_plain_modulus, default_moduli, default_moduli_u32
from sunscreen_tpu.compiler import noise as noise_model
from sunscreen_tpu.errors import ParamsError
from sunscreen_tpu.compiler.ir import FheProgram
from sunscreen_tpu.compiler.passes import compile_program
from sunscreen_tpu.compiler.trace import CallSignature, FheProgramFn

DEFAULT_NOISE_MARGIN_BITS = 20  # reference: compiler.rs:148-159


class PlainModulusConstraint:
    """Reference: `sunscreen/src/params.rs:19-35`."""

    def __init__(self, raw: int | None = None,
                 batching_min_bits: int | None = None):
        assert (raw is None) != (batching_min_bits is None)
        self.raw = raw
        self.batching_min_bits = batching_min_bits

    @staticmethod
    def Raw(v: int) -> "PlainModulusConstraint":
        return PlainModulusConstraint(raw=v)

    @staticmethod
    def BatchingMinimum(bits: int) -> "PlainModulusConstraint":
        return PlainModulusConstraint(batching_min_bits=bits)

    def modulus_for(self, poly_degree: int) -> int:
        if self.raw is not None:
            return self.raw
        return batching_plain_modulus(poly_degree, self.batching_min_bits)


@dataclass
class CompiledFheProgram:
    """Reference: `sunscreen_runtime/src/metadata.rs` CompiledFheProgram
    {IR, signature, required keys} — plus the literal plaintext pool."""

    name: str
    prog: FheProgram
    signature: CallSignature
    literals: list[np.ndarray]
    params: BfvParams

    @property
    def requires_relin_keys(self) -> bool:
        return self.prog.requires_relin_keys

    @property
    def requires_galois_keys(self) -> bool:
        return self.prog.requires_galois_keys

    @property
    def nodes(self):
        return self.prog.nodes


@dataclass
class Application:
    """name -> program map sharing one parameter set (reference:
    `Application<T>`, `sunscreen/src/lib.rs:83-218`). Holds FHE and ZKP
    programs when the builder compiles both (reference's FheZkp-marker
    applications, `compiler.rs:360-457`)."""

    params: BfvParams | None
    programs: dict[str, CompiledFheProgram] = field(default_factory=dict)
    zkp_programs: dict[str, object] = field(default_factory=dict)

    def get_program(self, name_or_fn) -> CompiledFheProgram:
        name = getattr(name_or_fn, "name", name_or_fn)
        return self.programs[name]

    def get_zkp_program(self, name_or_fn):
        """Reference: `Application::get_zkp_program` (`lib.rs:200-218`)."""
        name = getattr(name_or_fn, "name", name_or_fn)
        return self.zkp_programs[name]


class Compiler:
    """Builder. `Compiler().fhe_program(f).compile()` mirrors the
    reference's type-evolving builder (scheme/name checks:
    `compiler.rs:360-412`; search: `compiler.rs:413-457`)."""

    SEARCH_DEGREES = (1024, 2048, 4096, 8192, 16384, 32768)

    def __init__(self):
        self._programs: list[FheProgramFn] = []
        self._zkp_programs: list = []
        self._zkp_backend = None
        self._params: BfvParams | None = None
        self._plain_constraint = PlainModulusConstraint.BatchingMinimum(20)
        self._security = 128
        self._noise_margin = DEFAULT_NOISE_MARGIN_BITS
        # Reference parity (round-5): the search always CONFIRMS the
        # analytically-chosen N with the empirical MeasuredModel (the
        # reference's determine_params runs its measured model
        # unconditionally, `sunscreen/src/params.rs:199-226`). The
        # analytic CanonicalEmbeddingNorm still runs first as the
        # cheap filter, so the measured run happens once per program
        # at the surviving N. Opt out via use_measured_noise_model(
        # False) or SUNSCREEN_TPU_MEASURED_SEARCH=0 (tests/conftest.py
        # does, for suite time; dedicated tests re-enable).
        import os
        self._measured_model = os.environ.get(
            "SUNSCREEN_TPU_MEASURED_SEARCH", "1") != "0"
        self._engine = "auto"

    def engine(self, which: str) -> "Compiler":
        """Ciphertext word engine for the searched modulus chain:
        'u32' (all moduli < 2^30 — the TPU production word: u32
        storage, fused Pallas NTT/RNS kernels), 'u64' (fewer, larger
        limbs — fastest on CPU hosts), or 'auto' (default: u32 when
        the jax backend is a TPU, else u64). Explicit `with_params`
        overrides. New TPU-native surface — the reference has one
        engine (SEAL's 50-60-bit chains)."""
        if which not in ("u32", "u64", "auto"):
            raise ValueError("engine must be 'u32', 'u64' or 'auto'")
        self._engine = which
        return self

    def _moduli_for(self, n: int):
        eng = self._engine
        if eng == "auto":
            import jax
            eng = "u32" if jax.default_backend() == "tpu" else "u64"
        return (default_moduli_u32(n, self._security) if eng == "u32"
                else default_moduli(n, self._security))

    def use_measured_noise_model(self, enabled: bool = True) -> "Compiler":
        """Confirm the searched parameters with the empirical model
        (encrypt + run each surviving candidate — the reference's
        behavior, `MeasuredModel`). ON by default since round 5;
        call with False (or set SUNSCREEN_TPU_MEASURED_SEARCH=0) to
        search with the analytic model alone."""
        self._measured_model = enabled
        return self

    def fhe_program(self, prog: FheProgramFn) -> "Compiler":
        if not isinstance(prog, FheProgramFn):
            raise TypeError("expected an @fhe_program-decorated function")
        if any(p.name == prog.name for p in self._programs):
            raise ValueError(f"duplicate program name {prog.name!r}")
        self._programs.append(prog)
        return self

    def zkp_program(self, prog) -> "Compiler":
        """Add a `@zkp_program`-decorated function (reference:
        `Compiler::zkp_program`, `sunscreen/src/compiler.rs:360-457` —
        FHE and ZKP programs compile through the same builder)."""
        from sunscreen_tpu.types.zkp_types import ZkpProgramFn
        if not isinstance(prog, ZkpProgramFn):
            raise TypeError("expected a @zkp_program-decorated function")
        if any(p.name == prog.name for p in self._zkp_programs):
            raise ValueError(f"duplicate zkp program name {prog.name!r}")
        self._zkp_programs.append(prog)
        return self

    def zkp_backend(self, backend=None) -> "Compiler":
        """Select the ZKP proof backend (reference:
        `Compiler::zkp_backend::<B>()`, `compiler.rs:304`). Defaults to
        Bulletproofs when ZKP programs are present."""
        if backend is None:
            from sunscreen_tpu.zk.backend import BulletproofsBackend
            backend = BulletproofsBackend()
        self._zkp_backend = backend
        return self

    def with_params(self, params: BfvParams) -> "Compiler":
        self._params = params
        return self

    def plain_modulus_constraint(
            self, c: PlainModulusConstraint) -> "Compiler":
        self._plain_constraint = c
        return self

    def plain_modulus(self, v: int) -> "Compiler":
        return self.plain_modulus_constraint(PlainModulusConstraint.Raw(v))

    def security_level(self, bits: int) -> "Compiler":
        self._security = bits
        return self

    def additional_noise_budget(self, bits: int) -> "Compiler":
        self._noise_margin = bits
        return self

    # -- param search (reference: determine_params, params.rs:119-236) ------

    def _search_params(self) -> BfvParams:
        last_err: Exception | None = None
        for n in self.SEARCH_DEGREES:
            if n not in MAX_LOG_Q[self._security]:
                continue
            try:
                t = self._plain_constraint.modulus_for(n)
                qs, sp = self._moduli_for(n)
                params = BfvParams(n, t, qs, sp, self._security)
            except (AssertionError, ValueError, ParamsError) as e:
                # candidate invalid at this degree (e.g. the u32
                # engine's small-N limbs are below a batching plain
                # modulus — params.py validation, round 5) -> next N
                last_err = e
                continue
            ok = True
            for pf in self._programs:
                try:
                    prog, sig, lits = pf.build(params)
                    prog = compile_program(prog)
                except Exception as e:  # e.g. literal overflow at small N
                    last_err = e
                    ok = False
                    break
                budget = self._chained_budget(prog, params, pf.chain_count)
                if budget < self._noise_margin:
                    ok = False
                    break
                if self._measured_model:
                    compiled = CompiledFheProgram(pf.name, prog, sig,
                                                  lits, params)
                    # chain_count iterations: feed the worst output
                    # budget back in as the next run's input level via
                    # TargetNoiseLevel synthesis (reference:
                    # params.rs:199-226 + measured_model.rs:57-130)
                    target = None
                    measured = float("inf")
                    for _ in range(max(1, pf.chain_count)):
                        mm = noise_model.MeasuredModel(
                            compiled, params, input_targets=target)
                        measured = mm.worst_budget
                        if measured < self._noise_margin:
                            break
                        n_ct = sum(
                            1 for nd in compiled.nodes
                            if nd.op == noise_model.Op.INPUT_CIPHERTEXT)
                        target = [noise_model.TargetNoiseLevel(measured)
                                  ] * n_ct
                    if measured < self._noise_margin:
                        ok = False
                        break
            if ok:
                return params
        raise RuntimeError(
            f"no parameter set satisfies the programs (last error: "
            f"{last_err})")

    @staticmethod
    def _chained_budget(prog, params, chain_count: int) -> float:
        v = None
        for _ in range(max(1, chain_count)):
            bits = noise_model.predict_noise(prog, params, input_noise=v)
            v = 2.0 ** bits
        return -(np.log2(v) + 1.0)

    # -- compile -------------------------------------------------------------

    def compile(self) -> Application:
        if not self._programs and not self._zkp_programs:
            raise ValueError("no programs to compile")
        if (len(self._programs) > 1
                and any(pf.chain_count != 1 for pf in self._programs)):
            from sunscreen_tpu.errors import Unsupported
            raise Unsupported(
                "chain_count > 1 requires compiling exactly one program "
                "(reference: compiler.rs chaining restriction)")
        params = None
        if self._programs:
            params = self._params or self._search_params()
        app = Application(params)
        for pf in self._programs:
            prog, sig, literals = pf.build(params)
            prog = compile_program(prog)
            app.programs[pf.name] = CompiledFheProgram(
                pf.name, prog, sig, literals, params)
        for zf in self._zkp_programs:
            # building traces + validates the circuit (reference:
            # compile_zkp, compiler.rs:464-505); the built graph is what
            # ZkpRuntime.prove/verify consume
            zf.build()
            app.zkp_programs[zf.name] = zf
        return app
