"""Coefficient-sharded BFV evaluation over a device mesh.

Wires the distributed four-step NTT (`parallel/dntt.py`) into the HPS
multiply + hybrid keyswitch pipeline so giant-N ciphertexts can be
evaluated with the polynomial coefficient axis sharded across chips —
the framework's "sequence parallelism" dimension (SURVEY.md §5: shard
the coefficient axis; NTT butterfly exchange rides ICI as one
all_to_all per transform; reference scale analogue:
`sunscreen_runtime/src/run.rs:372-472`'s rayon parallelism).

Everything EXCEPT the NTT is per-coefficient (RNS base conversion,
scale-and-round, mod-down are elementwise over coefficients with
contractions over the limb axis only), so inside `shard_map` the
existing exact `rns` machinery runs unchanged on each shard; only
`DistributedNttPlan` communicates.

Layout: sharded ciphertexts live as [n_comp, k, N1, N2] with the LAST
axis sharded over the mesh's `coeff` axis (the four-step matrix view;
flat coefficient index = r*N2 + c).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sunscreen_tpu.bfv.context import BfvContext
from sunscreen_tpu.math import modular as m
from sunscreen_tpu.parallel.dntt import DistributedNttPlan

U64 = jnp.uint64


@lru_cache(maxsize=8)
def _dplan(n: int, moduli: tuple[int, ...]) -> DistributedNttPlan:
    return DistributedNttPlan(n, moduli)


def to_sharded_layout(ct, ctx: BfvContext):
    """[..., k, N] coefficient-domain ciphertext -> [..., k, N1, N2]
    four-step matrix view."""
    dp = _dplan(ctx.n, ctx.mul_base.moduli)
    return ct.reshape(*ct.shape[:-1], dp.n1, dp.n2)


def from_sharded_layout(ct4, ctx: BfvContext):
    return ct4.reshape(*ct4.shape[:-2], ctx.n)


def _flat(x):
    """[..., k, N1, N2l] -> [..., k, N1*N2l] for per-coeff rns ops."""
    return x.reshape(*x.shape[:-2], x.shape[-2] * x.shape[-1])


def _mat(x, n1):
    return x.reshape(*x.shape[:-1], n1, x.shape[-1] // n1)


def sharded_multiply_relin(ctx: BfvContext, mesh: Mesh, a4, b4, rlk,
                           axis: str = "coeff"):
    """ct x ct multiply + relinearize with the coefficient axis sharded
    over `axis`. a4/b4: [2, k, N1, N2] sharded P(..., axis); rlk: KswKey
    sharded on its trailing coeff axis. Returns a 2-component sharded
    ciphertext in the same layout.

    Same math as `bfv.ops.multiply`/`relinearize` (HPS + hybrid
    keyswitch), with every negacyclic product routed through the
    distributed NTT."""
    dp_mul = _dplan(ctx.n, ctx.mul_base.moduli)
    dp_key = _dplan(ctx.n, ctx.key_mods)
    n1 = dp_mul.n1
    kk = ctx.k + 1

    def body(a, b, k0, k1):
        # the distributed plan's tables are u64; u32-engine contexts
        # cast at the dntt boundary (exact: all residues < 2^30)
        qm = ctx.mul_base.q_dev.reshape(ctx.mul_base.k, 1).astype(U64)

        def extend(x):
            flat = _flat(x)
            aux = ctx.conv_q_to_aux.convert(flat, centered=True)
            stacked = jnp.concatenate([flat, aux], axis=-2)
            return _mat(stacked, n1).astype(U64)

        a_hat = jnp.stack([dp_mul.fwd_local(extend(a)[i], axis)
                           for i in range(2)])
        b_hat = jnp.stack([dp_mul.fwd_local(extend(b)[i], axis)
                           for i in range(2)])
        outs = []
        for j in range(3):
            acc = None
            for ia in range(2):
                ib = j - ia
                if 0 <= ib < 2:
                    term = dp_mul.pointwise_local(a_hat[ia], b_hat[ib])
                    acc = term if acc is None else m.add_mod(
                        acc, term, qm[..., None])
            outs.append(dp_mul.inv_local(acc, axis))
        tensor = _flat(jnp.stack(outs)).astype(ctx.word)
        scaled_aux = ctx.scale_mul_to_aux.apply(tensor)
        prod = ctx.conv_aux_to_q.convert(scaled_aux, centered=True)

        # hybrid keyswitch of component 2 (relinearize)
        qk = ctx.key_base.q_dev.reshape(kk, 1)
        d = prod[2]
        acc0 = acc1 = None
        for i in range(ctx.k):
            digit = d[i]
            ext = m.barrett_reduce_64(
                digit[None, :].astype(U64), qk.astype(U64),
                ctx.key_base.ratio_hi_dev.reshape(kk, 1),
                ctx.key_base.ratio_lo_dev.reshape(kk, 1))
            d_hat = dp_key.fwd_local(_mat(ext, n1), axis)
            # key rows arrive already in the DISTRIBUTED NTT domain
            # (see `sharded_relin_key`)
            t0 = dp_key.pointwise_local(d_hat, k0[i])
            t1 = dp_key.pointwise_local(d_hat, k1[i])
            qk64 = qk.astype(U64)[..., None]
            acc0 = t0 if acc0 is None else m.add_mod(acc0, t0, qk64)
            acc1 = t1 if acc1 is None else m.add_mod(acc1, t1, qk64)
        u0 = _flat(dp_key.inv_local(acc0, axis)).astype(ctx.word)
        u1 = _flat(dp_key.inv_local(acc1, axis)).astype(ctx.word)
        u0 = ctx.mod_down.apply(u0[:ctx.k, :], u0[ctx.k, :])
        u1 = ctx.mod_down.apply(u1[:ctx.k, :], u1[ctx.k, :])
        q = ctx.q_base.q_dev.reshape(ctx.k, 1)
        c0 = m.add_mod(prod[0], u0, q)
        c1 = m.add_mod(prod[1], u1, q)
        return _mat(jnp.stack([c0, c1]), n1)

    spec = P(None, None, None, axis)
    kspec = P(None, None, None, axis)
    fn = jax.jit(jax.shard_map(body, mesh=mesh,
                               in_specs=(spec, spec, kspec, kspec),
                               out_specs=spec))
    return fn(a4, b4, rlk.k0, rlk.k1)


def sharded_relin_key(ctx: BfvContext, rlk, mesh: Mesh,
                      axis: str = "coeff"):
    """Convert a relin key to the sharded evaluation form: key
    components are moved to coefficient domain, reshaped to the
    four-step layout, pre-transformed into the DISTRIBUTED NTT domain,
    and device_put sharded on the coeff axis.

    (The single-chip KswKey stores NTT-domain rows of the per-chip
    plan, which is a different domain than the distributed one.)
    """
    from sunscreen_tpu.bfv.keys import KswKey
    dp_key = _dplan(ctx.n, ctx.key_mods)
    n1 = dp_key.n1

    def to_dist(comp):  # [k_digits, kk, N] ntt-domain (per-chip plan)
        coeff = ctx.plan_key.inv(comp).astype(U64)
        mat_view = coeff.reshape(*coeff.shape[:-1], n1, dp_key.n2)
        spec = P(None, None, None, axis)
        sharded = jax.device_put(mat_view, NamedSharding(mesh, spec))

        def fwd_one(x):
            return dp_key.fwd_local(x, axis)

        fn = jax.jit(jax.shard_map(
            lambda t: jnp.stack([fwd_one(t[i]) for i in
                                 range(t.shape[0])]),
            mesh=mesh, in_specs=(spec,), out_specs=spec))
        return fn(sharded)

    return KswKey(to_dist(rlk.k0), to_dist(rlk.k1))
