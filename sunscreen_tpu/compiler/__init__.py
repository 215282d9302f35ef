"""FHE compiler stack: tracing DSL -> IR -> passes -> lowered XLA
programs (replaces the reference crates sunscreen, sunscreen_compiler_
macros, sunscreen_compiler_common, sunscreen_fhe_program,
sunscreen_backend — SURVEY.md §2.1)."""

from sunscreen_tpu.compiler.compiler import (  # noqa: F401
    Application, CompiledFheProgram, Compiler, PlainModulusConstraint)
from sunscreen_tpu.compiler.ir import FheProgram, Op  # noqa: F401
from sunscreen_tpu.compiler.trace import fhe_program  # noqa: F401
