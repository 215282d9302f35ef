"""Sharded TFHE over a device mesh.

Two parallel axes (VERDICT r4 #5; SURVEY §5's scaling dimensions
applied to the TFHE stack):

1. **Batch axis** (`batch_sharded_pbs`) — PBS is embarrassingly
   parallel over independent ciphertexts: the LWE stack's leading axis
   is sharded, the bootstrap/keyswitch keys are replicated, and GSPMD
   partitions the whole vmapped bootstrap with ZERO per-step
   collectives (collective volume is parsed from the compiled HLO in
   `__graft_entry__.dryrun_multichip`). This is the throughput-serving
   layout; scaling is linear up to key-replication memory.

2. **Polynomial-coefficient axis** (`coeff_sharded_external_product`)
   — the latency layout for one giant external product / CMUX: the
   GLWE coefficient axis is sharded via shard_map, NTTs run through
   `DistributedNttPlan` (one all_to_all per transform), and EVERYTHING
   else — gadget decomposition, residue lift, pointwise products, and
   the exact CRT->torus reconstruction — is per-coefficient, hence
   local to each shard. Bit-identical to `tfhe.ops.external_product`
   (tests/test_parallel.py).

Reference analogue: the rayon task parallelism of
`sunscreen_tfhe/src/ops/bootstrapping/blind_rotation.rs` (per-row
parallel external products), re-mapped to mesh axes instead of host
threads.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sunscreen_tpu.math import modular as m
from sunscreen_tpu.parallel.dntt import DistributedNttPlan
from sunscreen_tpu.tfhe import ops as tops
from sunscreen_tpu.tfhe import torus as ttorus
from sunscreen_tpu.tfhe.params import GlweDef, LweDef, RadixDecomposition
from sunscreen_tpu.tfhe.poly import get_torus_plan

U64 = jnp.uint64


def batch_sharded_pbs(mesh: Mesh, lwe_cts, test_poly, bsk, ksk,
                      lwe: LweDef, glwe: GlweDef,
                      pbs_radix: RadixDecomposition,
                      ks_radix: RadixDecomposition,
                      batch_axis: str = "batch"):
    """Univariate PBS over a batch-sharded LWE ciphertext stack
    [B, n+1] (leading axis sharded over `batch_axis`); keys replicated
    (raw GGSW stack or NttBootstrapKey both work — the engine dispatch
    is inside blind_rotate). Returns the bootstrapped stack with the
    same sharding."""
    in_sh = NamedSharding(mesh, P(batch_axis, None))
    cts = jax.device_put(lwe_cts, in_sh)

    @jax.jit
    def run(cts):
        out = jax.vmap(lambda c: tops.programmable_bootstrap_univariate(
            c, test_poly, bsk, ksk, lwe, glwe, pbs_radix, ks_radix))(cts)
        return jax.lax.with_sharding_constraint(out, in_sh)

    return run(cts)


@lru_cache(maxsize=8)
def _dtorus_plan(n: int, moduli: tuple[int, ...]) -> DistributedNttPlan:
    return DistributedNttPlan(n, moduli)


def coeff_sharded_external_product(mesh: Mesh, ggsw, glwe_ct,
                                   glwe: GlweDef,
                                   radix: RadixDecomposition,
                                   axis: str = "coeff"):
    """GGSW(m) ⊡ GLWE(c) with the polynomial coefficient axis sharded.

    ggsw: [k+1, l, k+1, N] u64 torus; glwe_ct: [..., k+1, N] u64
    (leading batch axes NOT supported — this is the single-op latency
    layout). Returns [k+1, N], bit-identical to
    `tfhe.ops.external_product`."""
    n = glwe.poly_degree
    kk = glwe.size
    plan = get_torus_plan(n)
    kp = plan.base.k
    dplan = _dtorus_plan(n, plan.base.moduli)
    n1, n2 = dplan.n1, dplan.n2
    q3 = plan.base.q64_dev.reshape(kp, 1, 1)
    rhi3 = plan.base.ratio_hi_dev.reshape(kp, 1, 1)
    rlo3 = plan.base.ratio_lo_dev.reshape(kp, 1, 1)

    def to_rns_local(t):
        """u64 torus [n1, n2/D] -> [kp, n1, n2/D] residues (local)."""
        return m.barrett_reduce_64(t[None], q3, rhi3, rlo3)

    def signed_rns_local(d):
        """signed digits [n1, n2/D] -> [kp, n1, n2/D] (local)."""
        d = d.astype(jnp.int64)[None]
        pos = jnp.where(d >= 0, d, 0).astype(U64)
        neg = jnp.where(d < 0, -d, 0).astype(U64)
        return m.sub_mod(pos, neg, q3)

    def body(ggsw_l, glwe_l):
        acc = [None] * (kk + 1)
        for i in range(kk + 1):
            digits = ttorus.signed_decompose(
                glwe_l[i], radix.radix_log, radix.count)  # [l, n1, n2/D]
            for j in range(radix.count):
                d_hat = dplan.fwd_local(signed_rns_local(digits[j]),
                                        axis)
                for c in range(kk + 1):
                    row_hat = dplan.fwd_local(
                        to_rns_local(ggsw_l[i, j, c]), axis)
                    term = dplan.pointwise_local(d_hat, row_hat)
                    acc[c] = term if acc[c] is None else m.add_mod(
                        acc[c], term, q3)
        outs = []
        for c in range(kk + 1):
            prod = dplan.inv_local(acc[c], axis)  # [kp, n1, n2/D]
            # exact CRT -> torus, per-coefficient (local): reuse the
            # plan's 128-bit fixed-point reconstruction on a
            # limb-axis-at--2 view [n1, kp, n2/D]
            outs.append(plan.to_torus(jnp.moveaxis(prod, 0, 1)))
        return jnp.stack(outs)

    spec_g = P(None, None, None, None, axis)
    spec_c = P(None, None, axis)
    fn = jax.jit(jax.shard_map(body, mesh=mesh,
                               in_specs=(spec_g, spec_c),
                               out_specs=spec_c))
    out = fn(ggsw.reshape(kk + 1, radix.count, kk + 1, n1, n2),
             glwe_ct.reshape(kk + 1, n1, n2))
    return out.reshape(kk + 1, n)
