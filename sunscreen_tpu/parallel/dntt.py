"""Distributed negacyclic NTT over a device mesh (four-step algorithm).

The TPU-native answer to SURVEY.md §5 "long-context/sequence
parallelism": the polynomial coefficient axis is sharded across mesh
devices; the NTT becomes
    twist(psi^i) -> local DFT_N1 -> twiddle(w^{r'c}) -> all_to_all
    transpose -> local DFT_N2
so butterfly-stage data exchange rides ICI as ONE all_to_all per
transform instead of log(N) exchanges (SURVEY.md §2.5 "TPU-native
equivalent": NTT stages as all_to_all over the mesh).

Math: with row-major matrix view M[r][c] = x[r*N2 + c] and
w1 = w^N2 (order N1), the pipeline computes exactly
X[r' + N1*c'] = sum x[n] w^{n*(r'+N1*c')} — a full cyclic DFT with
column-major output. The inverse mirrors each step, so callers never
observe the permuted ordering; pointwise products in the distributed
domain are consistent between operands.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sunscreen_tpu.math import modular as m
from sunscreen_tpu.math import primes

U64 = jnp.uint64


def _pow_table(base: int, q: int, shape_fn, count: int) -> np.ndarray:
    out = np.empty(count, dtype=np.uint64)
    cur = 1
    for i in range(count):
        out[i] = cur
        cur = cur * base % q
    return out


class DistributedNttPlan:
    """Negacyclic NTT of size n = N1*N2 over RNS moduli, coefficient
    axis sharded N2/D per device."""

    def __init__(self, n: int, moduli: tuple[int, ...]):
        assert n & (n - 1) == 0
        self.n = n
        self.moduli = tuple(moduli)
        k = len(moduli)
        log_n = n.bit_length() - 1
        self.n2 = 1 << ((log_n + 1) // 2)
        self.n1 = n // self.n2
        n1, n2 = self.n1, self.n2

        w1 = np.empty((k, n1, n1), dtype=np.uint64)      # DFT_N1 matrix
        w1_inv = np.empty((k, n1, n1), dtype=np.uint64)
        w2 = np.empty((k, n2, n2), dtype=np.uint64)      # DFT_N2 matrix
        w2_inv = np.empty((k, n2, n2), dtype=np.uint64)
        tw = np.empty((k, n1, n2), dtype=np.uint64)      # w^{r'c}
        tw_inv = np.empty((k, n1, n2), dtype=np.uint64)
        twist = np.empty((k, n1, n2), dtype=np.uint64)   # psi^{r*N2+c}
        untwist = np.empty((k, n1, n2), dtype=np.uint64)
        n_inv = np.empty((k,), dtype=np.uint64)

        for idx, q in enumerate(moduli):
            psi = primes.min_root_of_unity(2 * n, q)
            w = psi * psi % q
            wp = _pow_table(w, q, None, n)
            w1b = pow(w, n2, q)
            w2b = pow(w, n1, q)
            for r in range(n1):
                for rp in range(n1):
                    w1[idx, r, rp] = pow(w1b, r * rp, q)
                    w1_inv[idx, r, rp] = pow(w1b, -r * rp % n1, q)
            for c in range(n2):
                for cp in range(n2):
                    w2[idx, c, cp] = pow(w2b, c * cp, q)
                    w2_inv[idx, c, cp] = pow(w2b, -c * cp % n2, q)
            psi_inv = pow(psi, -1, q)
            for r in range(n1):
                for c in range(n2):
                    tw[idx, r, c] = wp[r * c % n]
                    tw_inv[idx, r, c] = pow(int(wp[r * c % n]), -1, q)
                    twist[idx, r, c] = pow(psi, r * n2 + c, q)
                    untwist[idx, r, c] = pow(psi_inv, r * n2 + c, q)
            n_inv[idx] = pow(n, -1, q)

        def dev(x):
            return jnp.asarray(x)

        self.q = dev(np.array(moduli, dtype=np.uint64))
        ratios = [m.barrett_ratio(q) for q in moduli]
        self.ratio_hi = dev(np.array([r[0] for r in ratios],
                                     dtype=np.uint64))
        self.ratio_lo = dev(np.array([r[1] for r in ratios],
                                     dtype=np.uint64))
        self.w1, self.w1_inv = dev(w1), dev(w1_inv)
        self.w2, self.w2_inv = dev(w2), dev(w2_inv)
        self.tw, self.tw_inv = dev(tw), dev(tw_inv)
        self.twist_t, self.untwist_t = dev(twist), dev(untwist)
        self.n_inv = dev(n_inv)

    # -- local helpers (operate on per-device blocks) -------------------------

    def _mulmod(self, a, b):
        k = len(self.moduli)
        shape = (k,) + (1,) * (a.ndim - 1)
        return m.mul_mod(a, b, self.q.reshape(shape),
                         self.ratio_hi.reshape(shape),
                         self.ratio_lo.reshape(shape))

    def _dft(self, x, mat, axis_len):
        """DFT along axis -2 via unrolled mod-mat-vec:
        x [k, A, B], mat [k, A, A] -> out[k, a', B] = sum_a mat[a',a]x[a,B]."""
        k = len(self.moduli)
        outs = None
        for a in range(axis_len):
            term = self._mulmod(
                jnp.broadcast_to(x[:, a:a + 1, :], x.shape[:1]
                                 + (axis_len,) + x.shape[2:]),
                mat[:, :, a][..., None])
            outs = term if outs is None else m.add_mod(
                outs, term, self.q.reshape(k, 1, 1))
        return outs

    # -- sharded transforms ----------------------------------------------------

    def fwd_local(self, x, axis_name: str):
        """Per-device body: x [k, N1, N2/D] (sharded on last axis)."""
        d = jax.lax.psum(1, axis_name)
        di = jax.lax.axis_index(axis_name)
        cols = self.n2 // d
        sl = lambda t: jax.lax.dynamic_slice_in_dim(  # noqa: E731
            t, di * cols, cols, axis=2)
        x = self._mulmod(x, sl(self.twist_t))
        x = self._dft(x, self.w1, self.n1)
        x = self._mulmod(x, sl(self.tw))
        # transpose [N1, N2] -> [N2, N1]: all_to_all splits N1, gathers N2
        x = jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                               tiled=True)
        x = jnp.swapaxes(x, 1, 2)  # [k, N2, N1/D]
        x = self._dft(x, self.w2, self.n2)
        return x  # distributed NTT domain: [k, N2, N1/D]

    def inv_local(self, x, axis_name: str):
        d = jax.lax.psum(1, axis_name)
        di = jax.lax.axis_index(axis_name)
        k = len(self.moduli)
        x = self._dft(x, self.w2_inv, self.n2)
        x = jnp.swapaxes(x, 1, 2)  # [k, N1/D, N2]
        x = jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                               tiled=True)  # [k, N1, N2/D]
        cols = self.n2 // d
        sl = lambda t: jax.lax.dynamic_slice_in_dim(  # noqa: E731
            t, di * cols, cols, axis=2)
        x = self._mulmod(x, sl(self.tw_inv))
        x = self._dft(x, self.w1_inv, self.n1)
        x = self._mulmod(x, sl(self.untwist_t))
        return self._mulmod(x, jnp.broadcast_to(
            self.n_inv.reshape(k, 1, 1), x.shape))

    def pointwise_local(self, a, b):
        return self._mulmod(a, b)


def make_distributed_negacyclic_mul(plan: DistributedNttPlan, mesh: Mesh,
                                    axis: str = "coeff"):
    """Returns a jitted fn(a, b) -> negacyclic product, where a and b
    are [k, N1, N2] arrays sharded on the last axis over `axis`."""

    def body(a, b):
        fa = plan.fwd_local(a, axis)
        fb = plan.fwd_local(b, axis)
        return plan.inv_local(plan.pointwise_local(fa, fb), axis)

    spec = P(None, None, axis)
    sharded = jax.shard_map(body, mesh=mesh, in_specs=(spec, spec),
                            out_specs=spec)
    return jax.jit(sharded)
