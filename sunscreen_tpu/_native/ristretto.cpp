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

// ---------------------------------------------------------------------------
// field helpers for the ristretto elligator map (RFC 9496 §4.3.4)
// ---------------------------------------------------------------------------

static void fe_one(fe &h) { memset(&h, 0, sizeof(h)); h.v[0] = 1; }

static void fe_neg(fe &h, const fe &f) {
  fe zero;
  memset(&zero, 0, sizeof(zero));
  fe_sub(h, zero, f);
}

static int fe_is_negative(const fe &f) {
  uint8_t b[32];
  fe_tobytes(b, f);
  return b[0] & 1;
}

static int fe_eq(const fe &a, const fe &b) {
  uint8_t ba[32], bb[32];
  fe_tobytes(ba, a);
  fe_tobytes(bb, b);
  return memcmp(ba, bb, 32) == 0;
}

// z^(2^252 - 3) = z^((p-5)/8): plain MSB-first square-and-multiply.
// Exponent bits: positions 2..251 set, position 1 clear, position 0 set.
static void fe_pow2523(fe &h, const fe &z) {
  fe r = z;  // bit 251
  for (int i = 250; i >= 0; i--) {
    fe_mul(r, r, r);
    int bit = (i >= 2) ? 1 : (i == 0 ? 1 : 0);
    if (bit) fe_mul(r, r, z);
  }
  h = r;
}

static fe FE_SQRT_M1, FE_D, FE_ONE_MINUS_D_SQ, FE_D_MINUS_ONE_SQ,
    FE_SQRT_AD_MINUS_ONE;
static bool elligator_initialized = false;

static void elligator_init_constants() {
  if (elligator_initialized) return;
  static const u64 W_SQRT_M1[4] = {0xc4ee1b274a0ea0b0ULL, 0x2f431806ad2fe478ULL, 0x2b4d00993dfbd7a7ULL, 0x2b8324804fc1df0bULL};
  static const u64 W_D[4] = {0x75eb4dca135978a3ULL, 0x00700a4d4141d8abULL, 0x8cc740797779e898ULL, 0x52036cee2b6ffe73ULL};
  static const u64 W_ONE_MINUS_D_SQ[4] = {0xe27c09c1945fc176ULL, 0x2c81a138cd5e350fULL, 0x9994abddbe70dfe4ULL, 0x029072a8b2b3e0d7ULL};
  static const u64 W_D_MINUS_ONE_SQ[4] = {0x31ad5aaa44ed4d20ULL, 0xd29e4a2cb01e1999ULL, 0x4cdcd32f529b4eebULL, 0x5968b37af66c2241ULL};
  static const u64 W_SQRT_AD_MINUS_ONE[4] = {0x8168095fb684d1d2ULL, 0x506271f3e487ab42ULL, 0xf0c30336ce0a2e02ULL, 0x4896ce40d47cb753ULL};
  fe_from_u64s(FE_SQRT_M1, W_SQRT_M1);
  fe_from_u64s(FE_D, W_D);
  fe_from_u64s(FE_ONE_MINUS_D_SQ, W_ONE_MINUS_D_SQ);
  fe_from_u64s(FE_D_MINUS_ONE_SQ, W_D_MINUS_ONE_SQ);
  fe_from_u64s(FE_SQRT_AD_MINUS_ONE, W_SQRT_AD_MINUS_ONE);
  elligator_initialized = true;
}

// (was_square, sqrt(u/v) or sqrt(i*u/v)) per RFC 9496 §4.2, matching
// zk/curve25519.py _sqrt_ratio_m1 bit-for-bit.
static int fe_sqrt_ratio_m1(fe &out, const fe &u, const fe &v) {
  fe v3, v7, r, check, t, neg_u, neg_u_i;
  fe_mul(v3, v, v);
  fe_mul(v3, v3, v);              // v^3
  fe_mul(v7, v3, v3);
  fe_mul(v7, v7, v);              // v^7
  fe_mul(t, u, v7);
  fe_pow2523(t, t);               // (u v^7)^((p-5)/8)
  fe_mul(r, u, v3);
  fe_mul(r, r, t);
  fe_mul(check, r, r);
  fe_mul(check, check, v);        // v r^2
  fe_neg(neg_u, u);
  fe_mul(neg_u_i, neg_u, FE_SQRT_M1);
  int correct = fe_eq(check, u);
  int flipped = fe_eq(check, neg_u);
  int flipped_i = fe_eq(check, neg_u_i);
  if (flipped || flipped_i) fe_mul(r, r, FE_SQRT_M1);
  if (fe_is_negative(r)) fe_neg(r, r);
  out = r;
  return correct || flipped;
}

// RFC 9496 §4.3.4 MAP (one 255-bit field element -> point), matching
// zk/curve25519.py _map_to_point.
static void ge_elligator_map(ge &h, const uint8_t *bytes32) {
  fe r0, r, u, c, v, s, n, t, w0, w1, w2, w3, one;
  uint8_t masked[32];
  memcpy(masked, bytes32, 32);
  masked[31] &= 0x7F;             // clear bit 255
  fe_frombytes(r0, masked);
  fe_one(one);
  fe_mul(r, r0, r0);
  fe_mul(r, r, FE_SQRT_M1);       // r = sqrt(-1) * r0^2
  fe_add(u, r, one);
  fe_mul(u, u, FE_ONE_MINUS_D_SQ);
  fe_neg(c, one);                 // c = -1
  fe_mul(t, FE_D, r);
  fe_sub(t, c, t);                // (-1 - d r)
  fe_add(v, r, FE_D);
  fe_mul(v, v, t);                // v = (-1 - d r)(r + d)
  int was_square = fe_sqrt_ratio_m1(s, u, v);
  if (!was_square) {
    fe_mul(s, s, r0);
    if (!fe_is_negative(s)) fe_neg(s, s);  // s = -|s r0| (force odd)
    c = r;
  }
  fe_sub(t, r, one);
  fe_mul(n, c, t);
  fe_mul(n, n, FE_D_MINUS_ONE_SQ);
  fe_sub(n, n, v);                // n = c (r-1) (d-1)^2 - v
  fe_add(w0, s, s);
  fe_mul(w0, w0, v);              // w0 = 2 s v
  fe_mul(w1, n, FE_SQRT_AD_MINUS_ONE);
  fe_mul(t, s, s);
  fe_sub(w2, one, t);             // w2 = 1 - s^2
  fe_add(w3, one, t);             // w3 = 1 + s^2
  fe_mul(h.X, w0, w3);
  fe_mul(h.Y, w2, w1);
  fe_mul(h.Z, w1, w3);
  fe_mul(h.T, w0, w2);
}

// ---------------------------------------------------------------------------
// Keccak-f[1600] (for merlin/STROBE transcript acceleration)
// ---------------------------------------------------------------------------

static const u64 KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static inline u64 rotl64(u64 x, int n) {
  return (x << n) | (x >> (64 - n));
}

static void keccakf(u64 a[25]) {
  // state layout matches the python reference: lane (x, y) at word
  // index x + 5*y.
  for (int round = 0; round < 24; round++) {
    u64 c[5], d[5], b[25];
    for (int x = 0; x < 5; x++)
      c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
    for (int x = 0; x < 5; x++)
      d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++) a[x + 5 * y] ^= d[x];
    static const int ROTC[5][5] = {{0, 36, 3, 41, 18},
                                   {1, 44, 10, 45, 2},
                                   {62, 6, 43, 15, 61},
                                   {28, 55, 25, 21, 56},
                                   {27, 20, 39, 8, 14}};
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl64(a[x + 5 * y], ROTC[x][y]);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        a[x + 5 * y] = b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) &
                                       b[(x + 2) % 5 + 5 * y]);
    a[0] ^= KECCAK_RC[round];
  }
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

// out(128B) = sum_i scalars[i] * points[i]; Pippenger bucket method
// with signed-digit window recoding and a size-adaptive window: digits
// d in [-2^(C-1), 2^(C-1)] halve the bucket count (point negation is
// free: (-X, Y, Z, -T)), and C grows with n so the per-window bucket
// reduction amortizes — total adds ~ (253/C) * (n + 2^C) instead of
// the fixed C=6 cost (2.2x fewer at the SDLP l~3e5 sizes).
void ristretto_msm(const uint8_t *scalars, const uint8_t *points,
                   long n, uint8_t *out) {
  ge_init_constants();
  int C = 6;  // window bits
  {  // pick C minimizing (253/C) * (n + 2^C), C in [6, 14]
    double best = 1e30;
    for (int c = 6; c <= 14; c++) {
      double cost = (253.0 / c) * ((double)n + (double)(1 << c));
      if (cost < best) { best = cost; C = c; }
    }
  }
  const int WINDOWS = (253 + C - 1) / C + 1;  // +1: recoding carry
  const int NBUCKETS = 1 << (C - 1);          // digits 1 .. 2^(C-1)
  ge *pts = new ge[n];
  for (long i = 0; i < n; i++) ge_frombytes(pts[i], points + 128 * i);
  // signed-digit recoding of every scalar, least-significant first
  int16_t *digits = new int16_t[(size_t)n * WINDOWS];
  const int half = 1 << (C - 1);
  for (long i = 0; i < n; i++) {
    int carry = 0;
    for (int w = 0; w < WINDOWS; w++) {
      int bit0 = w * C;
      unsigned int v = 0;
      int word = bit0 / 8, shift = bit0 % 8;
      if (word < 32) {
        v = scalars[32 * i + word];
        if (word + 1 < 32)
          v |= (unsigned int)scalars[32 * i + word + 1] << 8;
        if (word + 2 < 32)
          v |= (unsigned int)scalars[32 * i + word + 2] << 16;
        v = (v >> shift) & ((1u << C) - 1);
      }
      int d = (int)v + carry;
      if (d > half) { d -= (1 << C); carry = 1; } else carry = 0;
      digits[(size_t)i * WINDOWS + w] = (int16_t)d;
    }
    // scalars are < L < 2^253 and the top window has headroom, so the
    // final carry is absorbed by the extra window
  }
  ge acc;
  ge_identity(acc);
  ge *buckets = new ge[NBUCKETS];
  bool *used = new bool[NBUCKETS];
  for (int w = WINDOWS - 1; w >= 0; w--) {
    if (w != WINDOWS - 1)
      for (int b = 0; b < C; b++) ge_double(acc, acc);
    for (int b = 0; b < NBUCKETS; b++) used[b] = false;
    bool nonzero = false;
    for (long i = 0; i < n; i++) {
      int d = digits[(size_t)i * WINDOWS + w];
      if (!d) continue;
      nonzero = true;
      int b;
      ge p = pts[i];
      if (d > 0) {
        b = d - 1;
      } else {
        b = -d - 1;
        fe_neg(p.X, p.X);   // negated point: (-X, Y, Z, -T)
        fe_neg(p.T, p.T);
      }
      if (used[b]) {
        ge_add(buckets[b], buckets[b], p);
      } else {
        buckets[b] = p;
        used[b] = true;
      }
    }
    if (!nonzero) continue;
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
  delete[] digits;
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

// out[i](128B) = from_uniform_bytes(bytes[i] (64B)): elligator map of
// both halves, added (generator derivation hot loop for SDLP/BP at
// production sizes; reference: curve25519-dalek from_uniform_bytes as
// used by logproof/src/generators.rs).
void ristretto_from_uniform(const uint8_t *bytes, long n, uint8_t *out) {
  ge_init_constants();
  elligator_init_constants();
  for (long i = 0; i < n; i++) {
    ge p1, p2, r;
    ge_elligator_map(p1, bytes + 64 * i);
    ge_elligator_map(p2, bytes + 64 * i + 32);
    ge_add(r, p1, p2);
    ge_tobytes(out + 128 * i, r);
  }
}

// In-place Keccak-f[1600] on a 200-byte state (little-endian lanes).
void keccak_f1600(uint8_t *state) {
  u64 a[25];
  memcpy(a, state, 200);
  keccakf(a);
  memcpy(state, a, 200);
}

// In-place Keccak-f[1600] on `n` contiguous 200-byte states (forked
// transcript batches).
void keccak_f1600_batch(uint8_t *states, long n) {
  for (long i = 0; i < n; i++) keccak_f1600(states + 200 * i);
}

}  // extern "C"
