"""Batched curve25519 arithmetic + Pippenger MSM on TPU.

The TPU answer to the reference's four GPU curve backends
(`sunscreen_math/src/opencl_impl/multiexp.rs` + CUDA/Metal/WGSL
shaders — radix-sort + RLE + bucket Pippenger): field elements are
9x29-bit limb vectors in u64 lanes (every limb product < 2^59 and a
9-term column sum < 2^63 stays exact in one u64 lane — no 128-bit
accumulation), points are extended twisted-Edwards coordinates, and
bucket accumulation uses sort + a SEGMENTED associative scan of the
unified point-addition combiner (`jax.lax.associative_scan`) instead
of scatter-heavy RLE — the TPU-native replacement for the GPU
pipeline. The per-window work runs under `lax.scan` so the compiled
graph holds ONE window body.

Exactness: pure integer math mod p = 2^255-19, bit-checked against the
python oracle (`zk/curve25519.py`). The oracle `Point` stays the
host-side representative; this module accelerates large MSMs (the SDLP
create/verify hot loop, `logproof/src/linear_relation.rs:40-44`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sunscreen_tpu.zk import curve25519 as cv

U64 = jnp.uint64

P = cv.P
K2D = 2 * cv.D % P

NLIMB = 9
LBITS = 29
LMASK = (1 << LBITS) - 1
# 2^(29*9) = 2^261 == 19*2^6 (mod p)
FOLD = 19 << 6

COORDS = ("x", "y", "z", "t")


def limbs_from_int(x: int) -> np.ndarray:
    out = np.empty(NLIMB, dtype=np.uint64)
    x %= P
    for i in range(NLIMB):
        out[i] = x & LMASK
        x >>= LBITS
    return out


def int_from_limbs(v) -> int:
    v = np.asarray(v, dtype=np.uint64)
    out = 0
    for i in reversed(range(v.shape[-1])):
        out = (out << LBITS) + int(v[..., i])
    return out % P


def _bias() -> np.ndarray:
    """A multiple of p in 'fat' limb form with every limb >= 2^31, so
    `a + bias - b` never borrows for operands with limbs < 2^31."""
    k = 512  # 512p ~ 2^264 gives the top limb ~2^32
    base = [(k * P >> (LBITS * i)) & ((1 << 40) - 1) if i < NLIMB - 1
            else (k * P >> (LBITS * i)) for i in range(NLIMB)]
    # base as plain radix-2^29 digits of k*p (top limb holds the rest)
    base = [(k * P >> (LBITS * i)) & LMASK for i in range(NLIMB - 1)]
    base.append(k * P >> (LBITS * (NLIMB - 1)))
    fat = list(base)
    for i in range(NLIMB - 1, 0, -1):
        fat[i] -= 8
        fat[i - 1] += 8 << LBITS
    assert all(f >= (1 << 31) for f in fat), fat
    assert sum(f << (LBITS * i) for i, f in enumerate(fat)) == k * P
    assert all(f < (1 << 36) for f in fat), fat
    return np.array(fat, dtype=np.uint64)


_BIAS = _bias()


def _carry_fold(c):
    """Columns [..., m] (m >= 9, values < 2^63) -> reduced limbs
    [..., 9] with limbs < 2^29 + 2^13 (limb 0 absorbs the fold tail).
    Two carry+fold rounds make the bound deterministic."""
    for _ in range(2):
        outs = []
        carry = jnp.zeros_like(c[..., 0])
        for i in range(c.shape[-1]):
            cur = c[..., i] + carry
            outs.append(cur & U64(LMASK))
            carry = cur >> U64(LBITS)
        outs.append(carry)
        c = jnp.stack(outs, axis=-1)
        lo = c[..., :NLIMB]
        hi = c[..., NLIMB:]
        pad = NLIMB - hi.shape[-1]
        if pad > 0:
            hi = jnp.concatenate(
                [hi, jnp.zeros(hi.shape[:-1] + (pad,), U64)], axis=-1)
        c = lo + hi * U64(FOLD)
    return c


def fmul(a, b):
    """Field multiply [..., 9] x [..., 9] -> [..., 9]; operand limbs
    must be < 2^31 (all public ops return < 2^30)."""
    cols = []
    for k in range(2 * NLIMB - 1):
        acc = None
        for i in range(max(0, k - NLIMB + 1), min(NLIMB, k + 1)):
            t = a[..., i] * b[..., k - i]
            acc = t if acc is None else acc + t
        cols.append(acc)
    return _carry_fold(jnp.stack(cols, axis=-1))


def fadd(a, b):
    return _carry_fold(a + b)


def fsub(a, b):
    """a - b (mod p) via the fat bias (operand limbs < 2^31)."""
    return _carry_fold(a + jnp.asarray(_BIAS) - b)


# ---------------------------------------------------------------------------
# extended twisted Edwards points, batched: dict of [..., 9] limb arrays
# ---------------------------------------------------------------------------


def identity(shape=()) -> dict:
    zero = jnp.zeros(shape + (NLIMB,), U64)
    one = zero.at[..., 0].set(1)
    return {"x": zero, "y": one, "z": one, "t": zero}


def from_points(points) -> dict:
    """list of cv.Point -> batched extended coords [n, 9] per coord."""
    n = len(points)
    arrs = {k: np.empty((n, NLIMB), np.uint64) for k in COORDS}
    for i, pt in enumerate(points):
        arrs["x"][i] = limbs_from_int(pt.x)
        arrs["y"][i] = limbs_from_int(pt.y)
        arrs["z"][i] = limbs_from_int(pt.z)
        arrs["t"][i] = limbs_from_int(pt.t)
    return {k: jnp.asarray(v) for k, v in arrs.items()}


def to_point(p, index=()) -> "cv.Point":
    x = int_from_limbs(np.asarray(p["x"])[index])
    y = int_from_limbs(np.asarray(p["y"])[index])
    z = int_from_limbs(np.asarray(p["z"])[index])
    zi = pow(z, -1, P)
    xa, ya = x * zi % P, y * zi % P
    return cv.Point(xa, ya, 1, xa * ya % P)


_K2D_LIMBS = None


def _k2d():
    global _K2D_LIMBS
    if _K2D_LIMBS is None:
        _K2D_LIMBS = jnp.asarray(limbs_from_int(K2D))
    return _K2D_LIMBS


def padd(p, q):
    """Unified extended-coordinate addition (add-2008-hwcd-3, a = -1;
    doubles and handles the identity — same formulas as the python
    oracle's `Point.__add__`)."""
    a = fmul(fsub(p["y"], p["x"]), fsub(q["y"], q["x"]))
    b = fmul(fadd(p["y"], p["x"]), fadd(q["y"], q["x"]))
    c = fmul(fmul(p["t"], q["t"]), _k2d())
    d = fmul(p["z"], q["z"])
    d = fadd(d, d)
    e = fsub(b, a)
    f = fsub(d, c)
    g = fadd(d, c)
    h = fadd(b, a)
    return {"x": fmul(e, f), "y": fmul(g, h), "z": fmul(f, g),
            "t": fmul(e, h)}


def pdouble(p):
    return padd(p, p)


def _select(mask, p, q):
    m = mask[..., None]
    return {k: jnp.where(m, p[k], q[k]) for k in COORDS}


# ---------------------------------------------------------------------------
# Pippenger MSM: sort + segmented associative scan
# ---------------------------------------------------------------------------


def _segmented_scan(points, seg_start):
    """Inclusive segmented point-sum scan along axis 0: positions where
    seg_start is True restart the accumulation. Each segment's total
    lands at its last index.

    Segmented Hillis-Steele inside ONE `fori_loop` whose body holds a
    single `padd` instance — `lax.associative_scan` unrolled log2(n)
    copies of the unified-add subgraph and OOM'd the XLA-TPU compile at
    n=4096 (PERF_NOTES round-2 "TPU MSM status"). Work is n*log2(n)
    adds instead of Blelloch's n, but every level is one full-width
    vector op — the right trade on a VPU."""
    n = int(seg_start.shape[0])
    levels = max(1, (n - 1).bit_length())
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(i, carry):
        x, f = carry
        d = jnp.left_shift(jnp.int32(1), i)
        prev = {k: jnp.roll(x[k], d, axis=0) for k in COORDS}
        pf = jnp.roll(f, d)
        valid = idx >= d
        summed = padd(prev, x)
        # x'[j] = x[j] if f[j] (segment head) or j < d, else x[j-d]+x[j]
        new = _select(jnp.logical_or(f, ~valid), x, summed)
        nf = jnp.where(valid, jnp.logical_or(f, pf), f)
        return new, nf

    x = {k: points[k] for k in COORDS}
    x, _ = jax.lax.fori_loop(0, levels, body, (x, seg_start))
    return x


def _tree_sum(pts, m):
    """Total of m points: a one-segment scan (reuses the single-padd
    fori_loop form) read at its last slot."""
    flag = jnp.zeros((m,), bool).at[0].set(True)
    res = _segmented_scan({k: pts[k][:m] for k in COORDS}, flag)
    return {k: res[k][m - 1] for k in COORDS}


def msm_tpu_fn(digits, pts, c: int):
    """digits: u32 [n_win, n] window digits, most significant window
    FIRST; pts: [n, 9] extended coords. One `lax.scan` iteration per
    window."""
    n = digits.shape[1]
    n_buckets = 1 << c

    def window_body(acc, dig):
        for _ in range(c):
            acc = pdouble(acc)
        order = jnp.argsort(dig)
        ds = dig[order]
        ps = {k: pts[k][order] for k in COORDS}
        nonzero = ds != 0
        ps = _select(nonzero, ps, identity((n,)))
        seg = jnp.concatenate(
            [jnp.ones((1,), bool), ds[1:] != ds[:-1]])
        run = _segmented_scan(ps, seg)
        is_last = jnp.concatenate(
            [ds[1:] != ds[:-1], jnp.ones((1,), bool)])
        slot = jnp.where(is_last & nonzero, ds.astype(jnp.int32),
                         jnp.int32(n_buckets))
        buckets = identity((n_buckets + 1,))
        buckets = {k: buckets[k].at[slot].set(run[k]) for k in COORDS}
        buckets = {k: buckets[k][:n_buckets] for k in COORDS}
        # sum_b b * S_b = sum over suffix sums S_{>=b}, b = 1..B-1
        rev = {k: buckets[k][::-1] for k in COORDS}       # b = B-1 .. 0
        seg0 = jnp.zeros((n_buckets,), bool).at[0].set(True)
        suffix = _segmented_scan(rev, seg0)
        # suffix[i] = S_{B-1} + .. + S_{B-1-i}; entries i=0..B-2 are
        # the suffix sums for b=B-1..1; the last (full, includes S_0)
        # is weight-0 -> drop
        suffix = {k: suffix[k].at[n_buckets - 1].set(identity(())[k])
                  for k in COORDS}
        win = _tree_sum(suffix, n_buckets)
        return padd(acc, win), jnp.int32(0)

    acc, _ = jax.lax.scan(window_body, identity(()), digits)
    return acc


_MSM_JIT = jax.jit(msm_tpu_fn, static_argnames=("c",))


def msm(scalars, points, c: int = 8) -> "cv.Point":
    """sum_i scalars[i] * points[i] on the accelerator (Pippenger),
    exact — verified against the python oracle in tests."""
    n = len(points)
    assert n == len(scalars) and n > 0
    n_win = (253 + c - 1) // c
    digits = np.zeros((n_win, n), dtype=np.uint32)
    for i, s in enumerate(scalars):
        s = int(s) % cv.L
        for w in range(n_win):
            digits[n_win - 1 - w, i] = (s >> (w * c)) & ((1 << c) - 1)
    pts = from_points(points)
    out = _MSM_JIT(jnp.asarray(digits), pts, c=c)
    return to_point(out)
