"""Lowering: FHE IR -> one jittable JAX function.

This is where the reference's entire runtime interpreter disappears
(SURVEY.md §3.2): instead of rayon work-stealing over IR nodes with one
SEAL FFI call each (`sunscreen_runtime/src/run.rs:100-472`), the DAG is
emitted as straight-line jnp/Pallas calls and XLA does scheduling, CSE,
and fusion (subsuming the reference's unused CSE pass,
`sunscreen_compiler_common/src/transforms/common_subexpression_
elimination.rs`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sunscreen_tpu.bfv import ops as bops
from sunscreen_tpu.compiler.ir import Op


def lower_program(compiled, ctx, rlk=None, gks=None, jit: bool = True):
    """compiled: CompiledFheProgram. Returns fn(*arg_arrays) -> [outputs].

    Argument order: ciphertext/plaintext inputs in program-input-index
    order. Ciphertext args are uint64 [..., n_comp, k, N]; plaintext args
    are uint64 [..., N].
    """
    prog = compiled.prog
    literals = [jnp.asarray(p) for p in compiled.literals]

    def run(*args):
        vals: list = [None] * len(prog.nodes)
        for i, node in enumerate(prog.nodes):
            op = node.op
            src = node.operands
            if op in (Op.INPUT_CIPHERTEXT, Op.INPUT_PLAINTEXT):
                vals[i] = args[node.data]
            elif op == Op.LITERAL:
                vals[i] = literals[node.data]
            elif op == Op.ADD:
                vals[i] = bops.add(ctx, vals[src[0]], vals[src[1]])
            elif op == Op.SUB:
                vals[i] = bops.sub(ctx, vals[src[0]], vals[src[1]])
            elif op == Op.ADD_PLAIN:
                vals[i] = bops.add_plain(ctx, vals[src[0]], vals[src[1]])
            elif op == Op.SUB_PLAIN:
                vals[i] = bops.sub_plain(ctx, vals[src[0]], vals[src[1]])
            elif op == Op.MULTIPLY:
                vals[i] = bops.multiply(ctx, vals[src[0]], vals[src[1]])
            elif op == Op.MULTIPLY_PLAIN:
                vals[i] = bops.multiply_plain(ctx, vals[src[0]],
                                              vals[src[1]])
            elif op == Op.NEGATE:
                vals[i] = bops.negate(ctx, vals[src[0]])
            elif op == Op.RELINEARIZE:
                vals[i] = bops.relinearize(ctx, vals[src[0]], rlk)
            elif op == Op.SHIFT_LEFT:
                vals[i] = bops.rotate_rows(ctx, vals[src[0]], node.data,
                                           gks)
            elif op == Op.SHIFT_RIGHT:
                vals[i] = bops.rotate_rows(ctx, vals[src[0]], -node.data,
                                           gks)
            elif op == Op.SWAP_ROWS:
                vals[i] = bops.rotate_columns(ctx, vals[src[0]], gks)
            elif op == Op.OUTPUT_CIPHERTEXT:
                vals[i] = vals[src[0]]
            else:
                raise ValueError(op)
        return [vals[o] for o in prog.outputs]

    return jax.jit(run) if jit else run
