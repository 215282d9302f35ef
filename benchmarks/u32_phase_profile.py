"""Real-TPU phase profile of the u32-engine multiply_relin at N=8192
(the bench.py workload), splitting the pipeline into its jitted phases
so optimization effort lands where the time is. Round-3 companion to
benchmarks/PERF_NOTES.md. Usage:
  python benchmarks/u32_phase_profile.py [ntt_mode] [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1] if len(sys.argv) > 1 else "pallas"
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
os.environ["SUNSCREEN_TPU_NTT"] = mode

import jax
import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.bfv import BfvParams, get_context, keys, ops
from sunscreen_tpu.math import modular as m

N = 8192
params = BfvParams.default_u32(N)
ctx = get_context(params)
print(f"mode={mode} batch={batch} k={ctx.k} mul_base={ctx.mul_base.k} "
      f"key_base={ctx.key_base.k}", flush=True)
key = jax.random.key(0)


@jax.jit
def setup(key):
    sk = keys.gen_secret_key(ctx, jax.random.fold_in(key, 0))
    pk = keys.gen_public_key(ctx, sk, jax.random.fold_in(key, 1))
    rlk = keys.gen_relin_key(ctx, sk, jax.random.fold_in(key, 2))
    pts = (jnp.arange(batch * ctx.n, dtype=jnp.uint64)
           .reshape(batch, ctx.n) % jnp.uint64(ctx.t))
    cts = jax.vmap(lambda p, k: ops.encrypt(ctx, pk, p, k))(
        pts, jax.random.split(jax.random.fold_in(key, 3), batch))
    return sk, rlk, cts

sk, rlk, cts = jax.block_until_ready(setup(key))
print("setup done", flush=True)


def extend(x):
    aux = ctx.conv_q_to_aux.convert(x, centered=True)
    return jnp.concatenate([x, aux], axis=-2)


km = ctx.mul_base.k
qm = ctx.mul_base.q_dev.reshape(km, 1)
kk = ctx.k + 1
qk = ctx.key_base.q_dev.reshape(kk, 1)
kc0 = ctx.key_base.c0_dev.reshape(kk, 1)
kc1 = ctx.key_base.c1_dev.reshape(kk, 1)

PHASES = {
    "base_extend_QtoB (x2ct)":
        lambda c: jnp.concatenate([extend(c), extend(c)], axis=-3),
    "ntt_fwd_mul (4 polys x km)":
        lambda c: ctx.plan_mul.fwd(jnp.broadcast_to(
            c[..., :1, :, :], c.shape[:-3] + (4,) + c.shape[-2:]).astype(
                ctx.word) % qm.astype(ctx.word)),
    "tensor_pointwise (4 pmul + reduce)": None,  # built below
    "ntt_inv_mul (3 x km)": None,
    "scale_round (mul->aux)": None,
    "base_convert_BtoQ": None,
    "ks_digit_reduce+fwd (k x kk)": None,
    "ks_pmul+sumreduce+inv": None,
    "mod_down (x2)": None,
}


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    R = 10
    for _ in range(R):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / R
    print(f"{name:42s} {dt*1e3:8.2f} ms", flush=True)
    return out


ext2 = timeit("base_extend_QtoB (x2ct)",
              lambda c: jnp.concatenate([extend(c), extend(c)], axis=-3),
              cts)
both_hat = timeit("ntt_fwd_mul (4 polys x km)",
                  lambda e: ctx.plan_mul.fwd(e), ext2)


def tensor_pw(both):
    a_hat = both[..., :2, :, :]
    b_hat = both[..., 2:, :, :]
    outs = []
    for j in range(3):
        acc = None
        for ia in range(2):
            ib = j - ia
            if 0 <= ib < 2:
                term = ctx.plan_mul.pointwise_mul(
                    a_hat[..., ia, :, :], b_hat[..., ib, :, :])
                acc = term if acc is None else acc + term
        outs.append(m.w_reduce(acc, qm, ctx.mul_base.c0_dev.reshape(km, 1),
                               ctx.mul_base.c1_dev.reshape(km, 1)))
    return jnp.stack(outs, axis=-3)


tens_hat = timeit("tensor_pointwise (4 pmul + reduce)", tensor_pw, both_hat)
tensor = timeit("ntt_inv_mul (3 x km)",
                lambda t: ctx.plan_mul.inv(t), tens_hat)
scaled = timeit("scale_round (mul->aux)",
                lambda t: ctx.scale_mul_to_aux.apply(t), tensor)
prod = timeit("base_convert_BtoQ",
              lambda s: ctx.conv_aux_to_q.convert(s, centered=True), scaled)

d = prod[..., 2, :, :]
d_hat = timeit("ks_digit_reduce+fwd (k x kk)",
               lambda d: ctx.plan_key.fwd(
                   m.w_reduce(d[..., :, None, :], qk, kc0, kc1)), d)


def ks_core(d_hat):
    t0 = ctx.plan_key.pointwise_mul(d_hat, rlk.k0)
    t1 = ctx.plan_key.pointwise_mul(d_hat, rlk.k1)
    acc0 = m.w_sum_reduce(t0, qk, kc0, kc1, axis=-3)
    acc1 = m.w_sum_reduce(t1, qk, kc0, kc1, axis=-3)
    return ctx.plan_key.inv(jnp.stack([acc0, acc1], axis=-3))


both_u = timeit("ks_pmul+sumreduce+inv", ks_core, d_hat)
timeit("mod_down (x2)",
       lambda b: (ctx.mod_down.apply(b[..., 0, :ctx.k, :],
                                     b[..., 0, ctx.k, :]),
                  ctx.mod_down.apply(b[..., 1, :ctx.k, :],
                                     b[..., 1, ctx.k, :])), both_u)

# whole-step reference number
from sunscreen_tpu.bfv.keys import KswKey
step = jax.jit(lambda a, b: ops.multiply_relin(ctx, a, b, rlk))
out = jax.block_until_ready(step(cts, cts))
t0 = time.perf_counter()
R = 5
for _ in range(R):
    out = step(out, cts)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / R
print(f"{'TOTAL multiply_relin':42s} {dt*1e3:8.2f} ms "
      f"({batch/dt:.0f} ops/s)", flush=True)
