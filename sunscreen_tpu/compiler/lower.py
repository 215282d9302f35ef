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


def lower_program_sharded(compiled, ctx, mesh, rlk=None, gks=None,
                          ct_spec=None, pt_spec=None):
    """Mesh-aware lowering: the SAME op graph jitted with
    `jax.sharding` annotations so GSPMD partitions every op — multiply,
    keyswitch, and galois rotations (whose coefficient permutations XLA
    lowers to collective permutes / all-to-alls on the sharded axis)
    — with XLA inserting the collectives (SURVEY.md §5 scale recipe;
    reference scale analogue: the rayon interpreter,
    `sunscreen_runtime/src/run.rs:372-472`).

    `ct_spec`: PartitionSpec for ciphertext args, matching their
    [batch?, n_comp, k, N] shape (default: batch-sharded over the
    mesh's first axis, limb-sharded over its second when present).
    `pt_spec`: spec for plaintext args (default: replicated). The keys
    bound here travel as jit ARGUMENTS under the hood (same fix as the
    single-chip executor: a closure would bake this key set into the
    compilation), with their current device placement/sharding
    respected — device_put them onto the mesh beforehand to shard.

    Returns fn(*args) -> [outputs] with in/out shardings bound; the
    returned callable always evaluates under the rlk/gks given here.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sunscreen_tpu.bfv.keys import GaloisKeys, KswKey

    if ct_spec is None:
        axes = mesh.axis_names
        limb = axes[1] if len(axes) > 1 else None
        ct_spec = P(axes[0], None, limb, None)
    if pt_spec is None:
        pt_spec = P()
    ct_sh = NamedSharding(mesh, ct_spec)
    pt_sh = NamedSharding(mesh, pt_spec)

    has_rlk = rlk is not None
    elems = tuple(sorted(gks.keys)) if gks is not None else None

    def run_with_keys(key_leaves, *args):
        r = KswKey(key_leaves[0], key_leaves[1]) if has_rlk else None
        off = 2 if has_rlk else 0
        g = None
        if elems is not None:
            g = GaloisKeys({e: KswKey(key_leaves[off + 2 * i],
                                      key_leaves[off + 2 * i + 1])
                            for i, e in enumerate(elems)})
        return lower_program(compiled, ctx, rlk=r, gks=g,
                             jit=False)(*args)

    n_inputs = sum(1 for nd in compiled.prog.nodes
                   if nd.op in (Op.INPUT_CIPHERTEXT,
                                Op.INPUT_PLAINTEXT))
    kinds = [None] * n_inputs
    for nd in compiled.prog.nodes:
        if nd.op == Op.INPUT_CIPHERTEXT:
            kinds[nd.data] = "ct"
        elif nd.op == Op.INPUT_PLAINTEXT:
            kinds[nd.data] = "pt"
    in_shardings = tuple(ct_sh if k == "ct" else pt_sh for k in kinds)
    leaves = []
    if has_rlk:
        leaves += [rlk.k0, rlk.k1]
    if elems is not None:
        for e in elems:
            leaves += [gks[e].k0, gks[e].k1]
    # keys keep whatever sharding/placement the caller gave them
    jitted = jax.jit(run_with_keys,
                     in_shardings=(None,) + in_shardings,
                     out_shardings=ct_sh)
    return lambda *args: jitted(leaves, *args)
