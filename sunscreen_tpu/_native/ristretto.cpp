// Native curve25519/ristretto kernels: field arithmetic, point ops,
// batched scalar multiplication and MSM.
//
// Replaces the reference's native curve acceleration layer
// (sunscreen_math GPU backends: CUDA/Metal/OpenCL/WGSL Ristretto vector
// ops + Pippenger MSM, SURVEY.md §2.4) with a C++ CPU implementation
// bound via ctypes (sunscreen_tpu.zk.native). The TPU MSM kernel checks
// against this, which in turn is checked bit-exactly against the
// pure-python reference (mirroring the reference's GPU-vs-CPU test
// strategy).
//
// Representation at the ABI: field elements as 32-byte little-endian,
// points as 128 bytes (X|Y|Z|T extended coordinates), scalars as
// 32-byte little-endian (already reduced mod L by the caller).

#include <cstdint>
#include <cstring>

typedef unsigned __int128 u128;
typedef uint64_t u64;

// ---------------------------------------------------------------------------
// fe25519: 5 x 51-bit limbs mod 2^255 - 19
// ---------------------------------------------------------------------------

struct fe { u64 v[5]; };

static const u64 MASK51 = (1ULL << 51) - 1;

static void fe_frombytes(fe &h, const uint8_t *s) {
  u64 w[4];
  memcpy(w, s, 32);
  h.v[0] = w[0] & MASK51;
  h.v[1] = ((w[0] >> 51) | (w[1] << 13)) & MASK51;
  h.v[2] = ((w[1] >> 38) | (w[2] << 26)) & MASK51;
  h.v[3] = ((w[2] >> 25) | (w[3] << 39)) & MASK51;
  h.v[4] = (w[3] >> 12) & MASK51;
}

static void fe_carry(fe &h) {
  for (int r = 0; r < 2; r++) {
    u64 c;
    c = h.v[0] >> 51; h.v[0] &= MASK51; h.v[1] += c;
    c = h.v[1] >> 51; h.v[1] &= MASK51; h.v[2] += c;
    c = h.v[2] >> 51; h.v[2] &= MASK51; h.v[3] += c;
    c = h.v[3] >> 51; h.v[3] &= MASK51; h.v[4] += c;
    c = h.v[4] >> 51; h.v[4] &= MASK51; h.v[0] += 19 * c;
  }
}

static void fe_tobytes(uint8_t *s, const fe &f) {
  fe t = f;
  fe_carry(t);
  // full reduction
  u64 q = (t.v[0] + 19) >> 51;
  q = (t.v[1] + q) >> 51;
  q = (t.v[2] + q) >> 51;
  q = (t.v[3] + q) >> 51;
  q = (t.v[4] + q) >> 51;
  t.v[0] += 19 * q;
  u64 c;
  c = t.v[0] >> 51; t.v[0] &= MASK51; t.v[1] += c;
  c = t.v[1] >> 51; t.v[1] &= MASK51; t.v[2] += c;
  c = t.v[2] >> 51; t.v[2] &= MASK51; t.v[3] += c;
  c = t.v[3] >> 51; t.v[3] &= MASK51; t.v[4] += c;
  t.v[4] &= MASK51;
  u64 w[4];
  w[0] = t.v[0] | (t.v[1] << 51);
  w[1] = (t.v[1] >> 13) | (t.v[2] << 38);
  w[2] = (t.v[2] >> 26) | (t.v[3] << 25);
  w[3] = (t.v[3] >> 39) | (t.v[4] << 12);
  memcpy(s, w, 32);
}

static void fe_add(fe &h, const fe &f, const fe &g) {
  for (int i = 0; i < 5; i++) h.v[i] = f.v[i] + g.v[i];
}

// h = f - g (adds 2p to stay positive)
static void fe_sub(fe &h, const fe &f, const fe &g) {
  static const u64 TWO_P[5] = {0xFFFFFFFFFFFDA * 2, 0xFFFFFFFFFFFFE * 2,
                               0xFFFFFFFFFFFFE * 2, 0xFFFFFFFFFFFFE * 2,
                               0xFFFFFFFFFFFFE * 2};
  fe t;
  for (int i = 0; i < 5; i++) t.v[i] = f.v[i] + TWO_P[i] - g.v[i];
  fe_carry(t);
  h = t;
}

static void fe_mul(fe &h, const fe &f, const fe &g) {
  u128 r0 = 0, r1 = 0, r2 = 0, r3 = 0, r4 = 0;
  u64 f0 = f.v[0], f1 = f.v[1], f2 = f.v[2], f3 = f.v[3], f4 = f.v[4];
  u64 g0 = g.v[0], g1 = g.v[1], g2 = g.v[2], g3 = g.v[3], g4 = g.v[4];
  u64 g1_19 = 19 * g1, g2_19 = 19 * g2, g3_19 = 19 * g3, g4_19 = 19 * g4;
  r0 = (u128)f0 * g0 + (u128)f1 * g4_19 + (u128)f2 * g3_19 +
       (u128)f3 * g2_19 + (u128)f4 * g1_19;
  r1 = (u128)f0 * g1 + (u128)f1 * g0 + (u128)f2 * g4_19 +
       (u128)f3 * g3_19 + (u128)f4 * g2_19;
  r2 = (u128)f0 * g2 + (u128)f1 * g1 + (u128)f2 * g0 +
       (u128)f3 * g4_19 + (u128)f4 * g3_19;
  r3 = (u128)f0 * g3 + (u128)f1 * g2 + (u128)f2 * g1 + (u128)f3 * g0 +
       (u128)f4 * g4_19;
  r4 = (u128)f0 * g4 + (u128)f1 * g3 + (u128)f2 * g2 + (u128)f3 * g1 +
       (u128)f4 * g0;
  u64 c;
  u64 o0, o1, o2, o3, o4;
  c = (u64)(r0 >> 51); o0 = (u64)r0 & MASK51; r1 += c;
  c = (u64)(r1 >> 51); o1 = (u64)r1 & MASK51; r2 += c;
  c = (u64)(r2 >> 51); o2 = (u64)r2 & MASK51; r3 += c;
  c = (u64)(r3 >> 51); o3 = (u64)r3 & MASK51; r4 += c;
  c = (u64)(r4 >> 51); o4 = (u64)r4 & MASK51;
  o0 += 19 * c;
  c = o0 >> 51; o0 &= MASK51; o1 += c;
  h.v[0] = o0; h.v[1] = o1; h.v[2] = o2; h.v[3] = o3; h.v[4] = o4;
}

// ---------------------------------------------------------------------------
// extended-coordinate edwards25519 points (a = -1)
// ---------------------------------------------------------------------------

struct ge { fe X, Y, Z, T; };

static fe FE_D2;  // 2*d
static bool initialized = false;

static void fe_from_u64s(fe &h, const u64 w[4]) {
  uint8_t b[32];
  memcpy(b, w, 32);
  fe_frombytes(h, b);
}

static void ge_init_constants() {
  if (initialized) return;
  // 2*d mod p, little-endian words
  static const u64 D2[4] = {0xebd69b9426b2f159ULL, 0x00e0149a8283b156ULL,
                            0x198e80f2eef3d130ULL, 0x2406d9dc56dffce7ULL};
  fe_from_u64s(FE_D2, D2);
  initialized = true;
}

static void ge_identity(ge &h) {
  memset(&h, 0, sizeof(h));
  h.Y.v[0] = 1;
  h.Z.v[0] = 1;
}

// complete addition for a=-1 twisted Edwards, extended coordinates
static void ge_add(ge &r, const ge &p, const ge &q) {
  fe a, b, c, d, e, f, g, h, t0, t1;
  fe_sub(t0, p.Y, p.X);
  fe_sub(t1, q.Y, q.X);
  fe_mul(a, t0, t1);                 // A = (Y1-X1)(Y2-X2)
  fe_add(t0, p.Y, p.X);
  fe_add(t1, q.Y, q.X);
  fe_mul(b, t0, t1);                 // B = (Y1+X1)(Y2+X2)
  fe_mul(c, p.T, FE_D2);
  fe_mul(c, c, q.T);                 // C = 2 d T1 T2
  fe_mul(d, p.Z, q.Z);
  fe_add(d, d, d);                   // D = 2 Z1 Z2
  fe_sub(e, b, a);
  fe_sub(f, d, c);
  fe_add(g, d, c);
  fe_add(h, b, a);
  fe_mul(r.X, e, f);
  fe_mul(r.Y, g, h);
  fe_mul(r.Z, f, g);
  fe_mul(r.T, e, h);
}

static void ge_double(ge &r, const ge &p) {
  fe a, b, c, h, e, g, f, t0;
  fe_mul(a, p.X, p.X);
  fe_mul(b, p.Y, p.Y);
  fe_mul(c, p.Z, p.Z);
  fe_add(c, c, c);
  fe_add(h, a, b);
  fe_add(t0, p.X, p.Y);
  fe_mul(t0, t0, t0);
  fe_sub(e, h, t0);
  fe_sub(g, a, b);
  fe_add(f, c, g);
  fe_mul(r.X, e, f);
  fe_mul(r.Y, g, h);
  fe_mul(r.Z, f, g);
  fe_mul(r.T, e, h);
}

static void ge_frombytes(ge &h, const uint8_t *s) {
  fe_frombytes(h.X, s);
  fe_frombytes(h.Y, s + 32);
  fe_frombytes(h.Z, s + 64);
  fe_frombytes(h.T, s + 96);
}

static void ge_tobytes(uint8_t *s, const ge &h) {
  fe_tobytes(s, h.X);
  fe_tobytes(s + 32, h.Y);
  fe_tobytes(s + 64, h.Z);
  fe_tobytes(s + 96, h.T);
}

// scalar mult (variable time, 4-bit windows)
static void ge_scalarmul(ge &r, const ge &p, const uint8_t *scalar) {
  ge table[16];
  ge_identity(table[0]);
  table[1] = p;
  for (int i = 2; i < 16; i++) ge_add(table[i], table[i - 1], p);
  ge_identity(r);
  bool started = false;
  for (int i = 63; i >= 0; i--) {
    int nibble = (scalar[i / 2] >> ((i & 1) * 4)) & 0xF;
    if (started) {
      ge_double(r, r); ge_double(r, r); ge_double(r, r); ge_double(r, r);
    }
    if (nibble) {
      if (started) {
        ge_add(r, r, table[nibble]);
      } else {
        r = table[nibble];
        started = true;
      }
    } else if (!started) {
      continue;
    }
  }
  if (!started) ge_identity(r);
}

extern "C" {

// out(128B) = sum_i scalars[i] * points[i]; Pippenger bucket method.
void ristretto_msm(const uint8_t *scalars, const uint8_t *points,
                   long n, uint8_t *out) {
  ge_init_constants();
  const int C = 6;  // window bits
  const int WINDOWS = (253 + C - 1) / C;
  const int NBUCKETS = (1 << C) - 1;
  ge *pts = new ge[n];
  for (long i = 0; i < n; i++) ge_frombytes(pts[i], points + 128 * i);
  ge acc;
  ge_identity(acc);
  ge *buckets = new ge[NBUCKETS];
  bool *used = new bool[NBUCKETS];
  for (int w = WINDOWS - 1; w >= 0; w--) {
    if (w != WINDOWS - 1)
      for (int b = 0; b < C; b++) ge_double(acc, acc);
    for (int b = 0; b < NBUCKETS; b++) used[b] = false;
    int bit0 = w * C;
    for (long i = 0; i < n; i++) {
      // extract C bits starting at bit0 from scalar i
      int word = bit0 / 8, shift = bit0 % 8;
      unsigned int v = scalars[32 * i + word];
      if (word + 1 < 32) v |= (unsigned int)scalars[32 * i + word + 1] << 8;
      if (word + 2 < 32) v |= (unsigned int)scalars[32 * i + word + 2] << 16;
      v = (v >> shift) & ((1u << C) - 1);
      if (!v) continue;
      int b = (int)v - 1;
      if (used[b]) {
        ge_add(buckets[b], buckets[b], pts[i]);
      } else {
        buckets[b] = pts[i];
        used[b] = true;
      }
    }
    ge sum, running;
    ge_identity(sum);
    ge_identity(running);
    bool any = false;
    for (int b = NBUCKETS - 1; b >= 0; b--) {
      if (used[b]) {
        if (any) ge_add(running, running, buckets[b]);
        else { running = buckets[b]; any = true; }
      }
      if (any) {
        ge_add(sum, sum, running);
      }
    }
    if (any) ge_add(acc, acc, sum);
  }
  ge_tobytes(out, acc);
  delete[] pts;
  delete[] buckets;
  delete[] used;
}

// out[i] = scalars[i] * points[i] (independent scalar mults)
void ristretto_batch_scalarmul(const uint8_t *scalars,
                               const uint8_t *points, long n,
                               uint8_t *out) {
  ge_init_constants();
  for (long i = 0; i < n; i++) {
    ge p, r;
    ge_frombytes(p, points + 128 * i);
    ge_scalarmul(r, p, scalars + 32 * i);
    ge_tobytes(out + 128 * i, r);
  }
}

// out[i] = a[i] + scalar * b[i] (IPP generator folding)
void ristretto_fold(const uint8_t *a, const uint8_t *b,
                    const uint8_t *scalar, long n, uint8_t *out) {
  ge_init_constants();
  for (long i = 0; i < n; i++) {
    ge pa, pb, r;
    ge_frombytes(pa, a + 128 * i);
    ge_frombytes(pb, b + 128 * i);
    ge_scalarmul(r, pb, scalar);
    ge_add(r, pa, r);
    ge_tobytes(out + 128 * i, r);
  }
}

// out[i] = scalar * points[i] (same scalar)
void ristretto_scale_all(const uint8_t *points, const uint8_t *scalar,
                         long n, uint8_t *out) {
  ge_init_constants();
  for (long i = 0; i < n; i++) {
    ge p, r;
    ge_frombytes(p, points + 128 * i);
    ge_scalarmul(r, p, scalar);
    ge_tobytes(out + 128 * i, r);
  }
}

}  // extern "C"
