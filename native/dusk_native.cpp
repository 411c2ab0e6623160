// Native host exactness engine (C++), mirroring the reference's native
// (Rust) components: field arithmetic, curve ops, transcript permutation
// and RNG core (SURVEY.md §7 architecture stance: "Host exactness engine
// (C++ extension + thin Python)").
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// All field I/O is canonical little-endian bytes; Montgomery conversion
// happens internally.  Differential-tested against the pure-Python host
// oracle in tests/test_native.py.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

using u64 = uint64_t;
using u128 = __uint128_t;

// ---------------------------------------------------------------------------
// keccak-f[1600] (the merlin/STROBE transcript permutation)
// ---------------------------------------------------------------------------

static const u64 KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static inline u64 rotl64(u64 x, int n) { return (x << n) | (x >> (64 - n)); }

extern "C" void dn_keccak_f1600(u64 st[25]) {
  static const int RHO[24] = {1,  3,  6,  10, 15, 21, 28, 36,
                              45, 55, 2,  14, 27, 41, 56, 8,
                              25, 43, 62, 18, 39, 61, 20, 44};
  static const int PI[24] = {10, 7,  11, 17, 18, 3,  5,  16,
                             8,  21, 24, 4,  15, 23, 19, 13,
                             12, 2,  20, 14, 22, 9,  6,  1};
  for (int round = 0; round < 24; round++) {
    u64 bc[5];
    for (int i = 0; i < 5; i++)
      bc[i] = st[i] ^ st[i + 5] ^ st[i + 10] ^ st[i + 15] ^ st[i + 20];
    for (int i = 0; i < 5; i++) {
      u64 t = bc[(i + 4) % 5] ^ rotl64(bc[(i + 1) % 5], 1);
      for (int j = 0; j < 25; j += 5) st[j + i] ^= t;
    }
    u64 t = st[1];
    for (int i = 0; i < 24; i++) {
      u64 tmp = st[PI[i]];
      st[PI[i]] = rotl64(t, RHO[i]);
      t = tmp;
    }
    for (int j = 0; j < 25; j += 5) {
      u64 row[5];
      for (int i = 0; i < 5; i++) row[i] = st[j + i];
      for (int i = 0; i < 5; i++)
        st[j + i] = row[i] ^ ((~row[(i + 1) % 5]) & row[(i + 2) % 5]);
    }
    st[0] ^= KECCAK_RC[round];
  }
}

// ---------------------------------------------------------------------------
// ChaCha (rand_chacha layout: 64-bit counter words 12..13, stream 14..15)
// ---------------------------------------------------------------------------

static inline uint32_t rotl32(uint32_t v, int c) {
  return (v << c) | (v >> (32 - c));
}

static inline void quarter(uint32_t s[16], int a, int b, int c, int d) {
  s[a] += s[b]; s[d] = rotl32(s[d] ^ s[a], 16);
  s[c] += s[d]; s[b] = rotl32(s[b] ^ s[c], 12);
  s[a] += s[b]; s[d] = rotl32(s[d] ^ s[a], 8);
  s[c] += s[d]; s[b] = rotl32(s[b] ^ s[c], 7);
}

extern "C" void dn_chacha_blocks(const uint32_t key[8], u64 counter,
                      const uint32_t nonce[2], int rounds, int nblocks,
                      uint32_t* out) {
  for (int blk = 0; blk < nblocks; blk++) {
    u64 ctr = counter + (u64)blk;
    uint32_t st[16] = {0x61707865u, 0x3320646Eu, 0x79622D32u, 0x6B206574u,
                       key[0], key[1], key[2], key[3],
                       key[4], key[5], key[6], key[7],
                       (uint32_t)(ctr & 0xFFFFFFFFu),
                       (uint32_t)(ctr >> 32), nonce[0], nonce[1]};
    uint32_t w[16];
    memcpy(w, st, sizeof(st));
    for (int r = 0; r < rounds / 2; r++) {
      quarter(w, 0, 4, 8, 12); quarter(w, 1, 5, 9, 13);
      quarter(w, 2, 6, 10, 14); quarter(w, 3, 7, 11, 15);
      quarter(w, 0, 5, 10, 15); quarter(w, 1, 6, 11, 12);
      quarter(w, 2, 7, 8, 13); quarter(w, 3, 4, 9, 14);
    }
    for (int i = 0; i < 16; i++) out[blk * 16 + i] = w[i] + st[i];
  }
}

// ---------------------------------------------------------------------------
// Generic Montgomery field over N 64-bit limbs (CIOS)
// ---------------------------------------------------------------------------

template <int N>
struct Fp {
  u64 v[N];
};

template <int N>
struct FpCtx {
  u64 mod[N];
  u64 r2[N];     // R^2 mod p
  u64 one[N];    // R mod p (Montgomery 1)
  u64 inv;       // -p^-1 mod 2^64
};

template <int N>
static inline bool ge(const u64* a, const u64* b) {
  for (int i = N - 1; i >= 0; i--) {
    if (a[i] > b[i]) return true;
    if (a[i] < b[i]) return false;
  }
  return true;  // equal
}

template <int N>
static inline void sub_nocheck(u64* out, const u64* a, const u64* b) {
  u128 borrow = 0;
  for (int i = 0; i < N; i++) {
    u128 d = (u128)a[i] - b[i] - borrow;
    out[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

template <int N>
static inline void add_mod(u64* out, const u64* a, const u64* b,
                           const FpCtx<N>& c) {
  u128 carry = 0;
  u64 t[N];
  for (int i = 0; i < N; i++) {
    u128 s = (u128)a[i] + b[i] + carry;
    t[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || ge<N>(t, c.mod)) sub_nocheck<N>(out, t, c.mod);
  else memcpy(out, t, sizeof(t));
}

template <int N>
static inline void sub_mod(u64* out, const u64* a, const u64* b,
                           const FpCtx<N>& c) {
  u128 borrow = 0;
  u64 t[N];
  for (int i = 0; i < N; i++) {
    u128 d = (u128)a[i] - b[i] - borrow;
    t[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < N; i++) {
      u128 s = (u128)t[i] + c.mod[i] + carry;
      out[i] = (u64)s;
      carry = s >> 64;
    }
  } else {
    memcpy(out, t, N * sizeof(u64));
  }
}

// CIOS Montgomery multiplication
template <int N>
static void mont_mul(u64* out, const u64* a, const u64* b,
                     const FpCtx<N>& c) {
  u64 t[N + 2] = {0};
  for (int i = 0; i < N; i++) {
    u128 carry = 0;
    for (int j = 0; j < N; j++) {
      u128 s = (u128)t[j] + (u128)a[j] * b[i] + carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[N] + carry;
    t[N] = (u64)s;
    t[N + 1] = (u64)(s >> 64);

    u64 m = t[0] * c.inv;
    carry = ((u128)t[0] + (u128)m * c.mod[0]) >> 64;
    for (int j = 1; j < N; j++) {
      u128 s2 = (u128)t[j] + (u128)m * c.mod[j] + carry;
      t[j - 1] = (u64)s2;
      carry = s2 >> 64;
    }
    s = (u128)t[N] + carry;
    t[N - 1] = (u64)s;
    t[N] = t[N + 1] + (u64)(s >> 64);
    t[N + 1] = 0;
  }
  if (t[N] || ge<N>(t, c.mod)) sub_nocheck<N>(out, t, c.mod);
  else memcpy(out, t, N * sizeof(u64));
}

template <int N>
static void mont_sqr(u64* out, const u64* a, const FpCtx<N>& c) {
  mont_mul<N>(out, a, a, c);
}

// modular inverse via Fermat (p-2 is fixed per field; exponent passed)
template <int N>
static void mont_pow(u64* out, const u64* base, const u64* exp_limbs,
                     int exp_words, const FpCtx<N>& c) {
  u64 acc[N];
  memcpy(acc, c.one, sizeof(acc));
  for (int w = exp_words - 1; w >= 0; w--) {
    for (int bit = 63; bit >= 0; bit--) {
      mont_sqr<N>(acc, acc, c);
      if ((exp_limbs[w] >> bit) & 1) mont_mul<N>(acc, acc, base, c);
    }
  }
  memcpy(out, acc, sizeof(acc));
}

template <int N>
static void ctx_init(FpCtx<N>& c, const u64* mod) {
  memcpy(c.mod, mod, N * sizeof(u64));
  // inv = -p^-1 mod 2^64 (Newton)
  u64 inv = 1;
  for (int i = 0; i < 63; i++) inv *= 2 - mod[0] * inv;
  c.inv = ~inv + 1;
  // one = R mod p: set 2^(64N-1) mod p by doubling... start from 1 shifted
  u64 one[N] = {0};
  one[0] = 1;
  // compute R mod p by 64*N doublings of 1 (mod p)
  for (int i = 0; i < 64 * N; i++) add_mod<N>(one, one, one, c);
  memcpy(c.one, one, sizeof(one));
  // r2 = R^2 mod p by doubling R another 64*N times
  u64 r2[N];
  memcpy(r2, one, sizeof(r2));
  for (int i = 0; i < 64 * N; i++) add_mod<N>(r2, r2, r2, c);
  memcpy(c.r2, r2, sizeof(r2));
}

static const u64 FQ_MOD[6] = {
    0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
    0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};
static const u64 FR_MOD[4] = {
    0xffffffff00000001ULL, 0x53bda402fffe5bfeULL, 0x3339d80809a1d805ULL,
    0x73eda753299d7d48ULL};

static FpCtx<6> FQ;
static FpCtx<4> FR;
static bool INIT_DONE = false;

static void ensure_init() {
  if (!INIT_DONE) {
    ctx_init<6>(FQ, FQ_MOD);
    ctx_init<4>(FR, FR_MOD);
    INIT_DONE = true;
  }
}

// ---------------------------------------------------------------------------
// G1 Jacobian over Fq (Montgomery domain)
// ---------------------------------------------------------------------------

struct G1 {
  u64 x[6], y[6], z[6];  // z == 0 <=> identity
};

static inline bool is_zero6(const u64* a) {
  for (int i = 0; i < 6; i++)
    if (a[i]) return false;
  return true;
}

static void g1_double(G1& r, const G1& p) {
  ensure_init();
  if (is_zero6(p.z) || is_zero6(p.y)) {
    memset(&r, 0, sizeof(r));
    return;
  }
  u64 a[6], b[6], cc[6], d[6], e[6], f[6], t[6], x3[6], y3[6], z3[6];
  mont_sqr<6>(a, p.x, FQ);
  mont_sqr<6>(b, p.y, FQ);
  mont_sqr<6>(cc, b, FQ);
  add_mod<6>(t, p.x, b, FQ);
  mont_sqr<6>(t, t, FQ);
  sub_mod<6>(t, t, a, FQ);
  sub_mod<6>(t, t, cc, FQ);
  add_mod<6>(d, t, t, FQ);
  add_mod<6>(e, a, a, FQ);
  add_mod<6>(e, e, a, FQ);
  mont_sqr<6>(f, e, FQ);
  sub_mod<6>(x3, f, d, FQ);
  sub_mod<6>(x3, x3, d, FQ);
  sub_mod<6>(t, d, x3, FQ);
  mont_mul<6>(t, e, t, FQ);
  u64 c8[6];
  add_mod<6>(c8, cc, cc, FQ);
  add_mod<6>(c8, c8, c8, FQ);
  add_mod<6>(c8, c8, c8, FQ);
  sub_mod<6>(y3, t, c8, FQ);
  mont_mul<6>(z3, p.y, p.z, FQ);
  add_mod<6>(z3, z3, z3, FQ);
  memcpy(r.x, x3, 48); memcpy(r.y, y3, 48); memcpy(r.z, z3, 48);
}

static void g1_add(G1& r, const G1& p, const G1& q) {
  ensure_init();
  if (is_zero6(p.z)) { r = q; return; }
  if (is_zero6(q.z)) { r = p; return; }
  u64 z1z1[6], z2z2[6], u1[6], u2[6], s1[6], s2[6];
  mont_sqr<6>(z1z1, p.z, FQ);
  mont_sqr<6>(z2z2, q.z, FQ);
  mont_mul<6>(u1, p.x, z2z2, FQ);
  mont_mul<6>(u2, q.x, z1z1, FQ);
  mont_mul<6>(s1, p.y, q.z, FQ);
  mont_mul<6>(s1, s1, z2z2, FQ);
  mont_mul<6>(s2, q.y, p.z, FQ);
  mont_mul<6>(s2, s2, z1z1, FQ);
  if (memcmp(u1, u2, 48) == 0) {
    if (memcmp(s1, s2, 48) != 0) { memset(&r, 0, sizeof(r)); return; }
    g1_double(r, p);
    return;
  }
  u64 h[6], i[6], j[6], rr[6], v[6], t[6], x3[6], y3[6], z3[6];
  sub_mod<6>(h, u2, u1, FQ);
  add_mod<6>(i, h, h, FQ);
  mont_sqr<6>(i, i, FQ);
  mont_mul<6>(j, h, i, FQ);
  sub_mod<6>(rr, s2, s1, FQ);
  add_mod<6>(rr, rr, rr, FQ);
  mont_mul<6>(v, u1, i, FQ);
  mont_sqr<6>(x3, rr, FQ);
  sub_mod<6>(x3, x3, j, FQ);
  sub_mod<6>(x3, x3, v, FQ);
  sub_mod<6>(x3, x3, v, FQ);
  sub_mod<6>(t, v, x3, FQ);
  mont_mul<6>(t, rr, t, FQ);
  u64 s1j[6];
  mont_mul<6>(s1j, s1, j, FQ);
  add_mod<6>(s1j, s1j, s1j, FQ);
  sub_mod<6>(y3, t, s1j, FQ);
  add_mod<6>(z3, p.z, q.z, FQ);
  mont_sqr<6>(z3, z3, FQ);
  sub_mod<6>(z3, z3, z1z1, FQ);
  sub_mod<6>(z3, z3, z2z2, FQ);
  mont_mul<6>(z3, z3, h, FQ);
  memcpy(r.x, x3, 48); memcpy(r.y, y3, 48); memcpy(r.z, z3, 48);
}

// fq inverse (Fermat: exponent p-2)
static void fq_inv(u64* out, const u64* a) {
  u64 e[6];
  memcpy(e, FQ_MOD, 48);
  // subtract 2
  u128 borrow = 2;
  for (int i = 0; i < 6; i++) {
    u128 d = (u128)e[i] - (u64)borrow;
    borrow = (d >> 64) ? 1 : 0;
    e[i] = (u64)d;
    if (!borrow) break;
  }
  mont_pow<6>(out, a, e, 6, FQ);
}

static void load6(u64* out, const uint8_t* b) { memcpy(out, b, 48); }
static void store6(uint8_t* b, const u64* a) { memcpy(b, a, 48); }
static void load4(u64* out, const uint8_t* b) { memcpy(out, b, 32); }
static void store4(uint8_t* b, const u64* a) { memcpy(b, a, 32); }

// to Montgomery / from Montgomery
static void fq_to_mont(u64* out, const u64* a) { mont_mul<6>(out, a, FQ.r2, FQ); }
static void fq_from_mont(u64* out, const u64* a) {
  u64 one[6] = {1, 0, 0, 0, 0, 0};
  mont_mul<6>(out, a, one, FQ);
}
static void fr_to_mont(u64* out, const u64* a) { mont_mul<4>(out, a, FR.r2, FR); }
static void fr_from_mont(u64* out, const u64* a) {
  u64 one[4] = {1, 0, 0, 0};
  mont_mul<4>(out, a, one, FR);
}

// ---------------------------------------------------------------------------
// Pippenger MSM: points = n x 96B (x,y canonical LE) + infinity flags,
// scalars = n x 32B canonical LE.  Returns affine x,y (+ inf flag).
// ---------------------------------------------------------------------------

extern "C" void dn_g1_msm(const uint8_t* points, const uint8_t* inf, const uint8_t* scalars,
               int64_t n, uint8_t* out_xy, uint8_t* out_inf) {
  ensure_init();
  // load + filter
  std::vector<G1> pts;
  std::vector<const uint8_t*> scs;
  pts.reserve(n);
  for (int64_t i = 0; i < n; i++) {
    if (inf[i]) continue;
    bool zero = true;
    for (int b = 0; b < 32; b++)
      if (scalars[i * 32 + b]) { zero = false; break; }
    if (zero) continue;
    G1 p;
    u64 t[6];
    load6(t, points + i * 96);
    fq_to_mont(p.x, t);
    load6(t, points + i * 96 + 48);
    fq_to_mont(p.y, t);
    memcpy(p.z, FQ.one, 48);
    pts.push_back(p);
    scs.push_back(scalars + i * 32);
  }
  if (pts.empty()) { *out_inf = 1; return; }
  int64_t m = (int64_t)pts.size();
  if (m <= 32) {
    // Straus with shared doublings (the verifier's MSMs are 2-13 points:
    // Pippenger's per-window bucket reduction is pure overhead there —
    // ~2700 vs ~1200 group ops, measured in the verify profile)
    std::vector<G1> table(m * 15);   // table[i*15 + d-1] = d * P_i
    for (int64_t i = 0; i < m; i++) {
      table[i * 15] = pts[i];
      for (int d = 1; d < 15; d++)
        g1_add(table[i * 15 + d], table[i * 15 + d - 1], pts[i]);
    }
    G1 acc;
    memset(&acc, 0, sizeof(acc));
    for (int w = 63; w >= 0; w--) {
      for (int d = 0; d < 4; d++) g1_double(acc, acc);
      for (int64_t i = 0; i < m; i++) {
        int dgt = (scs[i][w / 2] >> ((w & 1) ? 4 : 0)) & 0xF;
        if (dgt) g1_add(acc, acc, table[i * 15 + dgt - 1]);
      }
    }
    if (is_zero6(acc.z)) { *out_inf = 1; return; }
    *out_inf = 0;
    u64 zi[6], zi2[6], t[6];
    fq_inv(zi, acc.z);
    mont_sqr<6>(zi2, zi, FQ);
    mont_mul<6>(t, acc.x, zi2, FQ);
    fq_from_mont(t, t);
    store6(out_xy, t);
    mont_mul<6>(t, acc.y, zi2, FQ);
    mont_mul<6>(t, t, zi, FQ);
    fq_from_mont(t, t);
    store6(out_xy + 48, t);
    return;
  }
  int c;
  {
    int bl = 0;
    int64_t t = m;
    while (t) { bl++; t >>= 1; }
    c = bl - 3 > 4 ? bl - 3 : 4;
  }
  int windows = (255 + c - 1) / c;
  G1 acc;
  memset(&acc, 0, sizeof(acc));
  std::vector<G1> buckets(((size_t)1 << c));
  std::vector<uint8_t> used(((size_t)1 << c));
  for (int w = windows - 1; w >= 0; w--) {
    for (int d = 0; d < c; d++) g1_double(acc, acc);
    memset(used.data(), 0, used.size());
    for (int64_t i = 0; i < m; i++) {
      int bit = w * c;
      // extract c bits starting at `bit` from 256-bit LE scalar
      int word = bit >> 6, off = bit & 63;
      u64 lo, hi = 0;
      memcpy(&lo, scs[i] + word * 8, 8);
      u64 d = lo >> off;
      if (off + c > 64 && word < 3) {
        memcpy(&hi, scs[i] + (word + 1) * 8, 8);
        d |= hi << (64 - off);
      }
      d &= (((u64)1 << c) - 1);
      if (!d) continue;
      if (!used[d]) { buckets[d] = pts[i]; used[d] = 1; }
      else g1_add(buckets[d], buckets[d], pts[i]);
    }
    G1 running, total;
    memset(&running, 0, sizeof(running));
    memset(&total, 0, sizeof(total));
    for (int64_t d = ((int64_t)1 << c) - 1; d >= 1; d--) {
      if (used[d]) g1_add(running, running, buckets[d]);
      g1_add(total, total, running);
    }
    g1_add(acc, acc, total);
  }
  if (is_zero6(acc.z)) { *out_inf = 1; return; }
  *out_inf = 0;
  u64 zi[6], zi2[6], t[6];
  fq_inv(zi, acc.z);
  mont_sqr<6>(zi2, zi, FQ);
  mont_mul<6>(t, acc.x, zi2, FQ);
  fq_from_mont(t, t);
  store6(out_xy, t);
  mont_mul<6>(t, acc.y, zi2, FQ);
  mont_mul<6>(t, t, zi, FQ);
  fq_from_mont(t, t);
  store6(out_xy + 48, t);
}

// ---------------------------------------------------------------------------
// Window combine for the device Pippenger (ops/msm.py): the device emits
// per-window totals; the 248 doublings + 31 adds of the MSB-first combine
// are serial with lane-width 1 on the TPU (unfused, ~30-130 ms per commit
// batch) but microseconds here.  Input: b commits x w window totals in
// HOMOGENEOUS projective (X:Y:Z, x=X/Z) Montgomery form, LSB window first,
// 3x48B LE each.  Converted to Jacobian via (X*Z, Y*Z^2, Z) -- same affine
// point -- then combined acc = 2^c * acc + T_w and stored as canonical
// affine x,y (96B per commit) + at-infinity flags.
// ---------------------------------------------------------------------------

extern "C" void dn_g1_combine_windows(const uint8_t* totals, int64_t b,
                                      int64_t w, int64_t window_bits,
                                      uint8_t* out_xy, uint8_t* out_inf) {
  ensure_init();
  for (int64_t k = 0; k < b; k++) {
    G1 acc;
    memset(&acc, 0, sizeof(acc));
    for (int64_t wi = w - 1; wi >= 0; wi--) {
      for (int64_t d = 0; d < window_bits; d++) g1_double(acc, acc);
      const uint8_t* src = totals + (k * w + wi) * 144;
      u64 X[6], Y[6], Z[6];
      load6(X, src);
      load6(Y, src + 48);
      load6(Z, src + 96);
      if (is_zero6(Z)) continue;  // window total = identity
      G1 t;
      u64 z2[6];
      mont_mul<6>(t.x, X, Z, FQ);
      mont_sqr<6>(z2, Z, FQ);
      mont_mul<6>(t.y, Y, z2, FQ);
      memcpy(t.z, Z, 48);
      g1_add(acc, acc, t);
    }
    if (is_zero6(acc.z)) { out_inf[k] = 1; continue; }
    out_inf[k] = 0;
    u64 zi[6], zi2[6], t[6];
    fq_inv(zi, acc.z);
    mont_sqr<6>(zi2, zi, FQ);
    mont_mul<6>(t, acc.x, zi2, FQ);
    fq_from_mont(t, t);
    store6(out_xy + k * 96, t);
    mont_mul<6>(t, acc.y, zi2, FQ);
    mont_mul<6>(t, t, zi, FQ);
    fq_from_mont(t, t);
    store6(out_xy + k * 96 + 48, t);
  }
}

// ---------------------------------------------------------------------------
// Radix-2 NTT over Fr: in-place on n x 32B canonical LE values; natural
// order in, natural order out (bit-reversal inside); root = primitive n-th
// root (canonical LE).  Matches poly/domain.py::_fft_in_place.
// ---------------------------------------------------------------------------

extern "C" void dn_fr_ntt(uint8_t* data, int64_t n, const uint8_t* root32) {
  ensure_init();
  if (n <= 1) return;
  std::vector<Fp<4>> a((size_t)n);
  for (int64_t i = 0; i < n; i++) {
    u64 t[4];
    load4(t, data + i * 32);
    fr_to_mont(a[i].v, t);
  }
  // bit-reverse permute
  int logn = 0;
  while (((int64_t)1 << logn) < n) logn++;
  for (int64_t i = 0; i < n; i++) {
    int64_t j = 0, x = i;
    for (int b = 0; b < logn; b++) { j = (j << 1) | (x & 1); x >>= 1; }
    if (j > i) std::swap(a[i], a[j]);
  }
  u64 root[4], rm[4];
  load4(root, root32);
  fr_to_mont(rm, root);
  for (int s = 1; s <= logn; s++) {
    int64_t mlen = (int64_t)1 << s;
    // w_m = root^(n/mlen)
    u64 wm[4];
    memcpy(wm, rm, 32);
    for (int64_t e = n / mlen; e > 1; e >>= 1) mont_sqr<4>(wm, wm, FR);
    // note: n/mlen is a power of two, so repeated squaring works
    for (int64_t kk = 0; kk < n; kk += mlen) {
      u64 w[4];
      memcpy(w, FR.one, 32);
      for (int64_t j = 0; j < mlen / 2; j++) {
        u64 t[4], u[4];
        mont_mul<4>(t, w, a[kk + j + mlen / 2].v, FR);
        memcpy(u, a[kk + j].v, 32);
        add_mod<4>(a[kk + j].v, u, t, FR);
        sub_mod<4>(a[kk + j + mlen / 2].v, u, t, FR);
        mont_mul<4>(w, w, wm, FR);
      }
    }
  }
  for (int64_t i = 0; i < n; i++) {
    u64 t[4];
    fr_from_mont(t, a[i].v);
    store4(data + i * 32, t);
  }
}

// geometric scale: a[i] = a[i] * s * g^i  (all canonical LE)
extern "C" void dn_fr_scale_geo(uint8_t* data, int64_t n, const uint8_t* s32,
                     const uint8_t* g32) {
  ensure_init();
  u64 s[4], g[4], cur[4], t[4], v[4];
  load4(t, s32);
  fr_to_mont(s, t);
  load4(t, g32);
  fr_to_mont(g, t);
  memcpy(cur, s, 32);
  for (int64_t i = 0; i < n; i++) {
    load4(t, data + i * 32);
    fr_to_mont(v, t);
    mont_mul<4>(v, v, cur, FR);
    fr_from_mont(t, v);
    store4(data + i * 32, t);
    mont_mul<4>(cur, cur, g, FR);
  }
}


// ---------------------------------------------------------------------------
// Pairing: Fq2/Fq6/Fq12 tower + affine Miller loop + final exponentiation.
//
// The reference consumes `TatePairing::multi_miller_loop(..).final_exp()`
// from its unmounted ec-pairing crate and only compares against the Gt
// identity (reference src/commitment_scheme.rs:56-62).  This mirrors the
// validated pure-Python host oracle (dusk_plonk_tpu/curves/pairing.py,
// fields/host.py) operation-for-operation so the two are differentially
// testable on full Fq12 values, not just the boolean check.
//
// Tower: Fq2 = Fq[u]/(u^2+1), Fq6 = Fq2[v]/(v^3-(u+1)), Fq12 = Fq6[w]/(w^2-v).
// All Fq values below are in the Montgomery domain.
// ---------------------------------------------------------------------------

struct Fq2v { u64 c0[6], c1[6]; };
struct Fq6v { Fq2v c0, c1, c2; };
struct Fq12v { Fq6v c0, c1; };

static void fq2_addv(Fq2v& r, const Fq2v& a, const Fq2v& b) {
  add_mod<6>(r.c0, a.c0, b.c0, FQ);
  add_mod<6>(r.c1, a.c1, b.c1, FQ);
}
static void fq2_subv(Fq2v& r, const Fq2v& a, const Fq2v& b) {
  sub_mod<6>(r.c0, a.c0, b.c0, FQ);
  sub_mod<6>(r.c1, a.c1, b.c1, FQ);
}
static void fq2_negv(Fq2v& r, const Fq2v& a) {
  u64 zero[6] = {0};
  sub_mod<6>(r.c0, zero, a.c0, FQ);
  sub_mod<6>(r.c1, zero, a.c1, FQ);
}
static void fq2_mulv(Fq2v& r, const Fq2v& a, const Fq2v& b) {
  // Karatsuba: c0 = a0 b0 - a1 b1; c1 = (a0+a1)(b0+b1) - a0 b0 - a1 b1
  u64 t0[6], t1[6], sa[6], sb[6], m[6];
  mont_mul<6>(t0, a.c0, b.c0, FQ);
  mont_mul<6>(t1, a.c1, b.c1, FQ);
  add_mod<6>(sa, a.c0, a.c1, FQ);
  add_mod<6>(sb, b.c0, b.c1, FQ);
  mont_mul<6>(m, sa, sb, FQ);
  sub_mod<6>(m, m, t0, FQ);
  sub_mod<6>(r.c1, m, t1, FQ);
  sub_mod<6>(r.c0, t0, t1, FQ);
}
static void fq2_sqv(Fq2v& r, const Fq2v& a) {
  // (a0+a1)(a0-a1), 2 a0 a1
  u64 s[6], d[6], m[6];
  add_mod<6>(s, a.c0, a.c1, FQ);
  sub_mod<6>(d, a.c0, a.c1, FQ);
  mont_mul<6>(m, a.c0, a.c1, FQ);
  mont_mul<6>(r.c0, s, d, FQ);
  add_mod<6>(r.c1, m, m, FQ);
}
static void fq2_invv(Fq2v& r, const Fq2v& a) {
  // 1/(a0 + a1 u) = (a0 - a1 u) / (a0^2 + a1^2)
  u64 t0[6], t1[6], s[6], si[6], zero[6] = {0};
  mont_sqr<6>(t0, a.c0, FQ);
  mont_sqr<6>(t1, a.c1, FQ);
  add_mod<6>(s, t0, t1, FQ);
  fq_inv(si, s);
  mont_mul<6>(r.c0, a.c0, si, FQ);
  u64 n1[6];
  sub_mod<6>(n1, zero, a.c1, FQ);
  mont_mul<6>(r.c1, n1, si, FQ);
}
static void fq2_conjv(Fq2v& r, const Fq2v& a) {
  u64 zero[6] = {0};
  memcpy(r.c0, a.c0, 48);
  sub_mod<6>(r.c1, zero, a.c1, FQ);
}
static void fq2_mul_nonres(Fq2v& r, const Fq2v& a) {
  // * (u+1): (c0 - c1) + (c0 + c1) u
  u64 d[6], s[6];
  sub_mod<6>(d, a.c0, a.c1, FQ);
  add_mod<6>(s, a.c0, a.c1, FQ);
  memcpy(r.c0, d, 48);
  memcpy(r.c1, s, 48);
}
static void fq2_mul_fq(Fq2v& r, const Fq2v& a, const u64* s) {
  mont_mul<6>(r.c0, a.c0, s, FQ);
  mont_mul<6>(r.c1, a.c1, s, FQ);
}
static void fq6_addv(Fq6v& r, const Fq6v& a, const Fq6v& b) {
  fq2_addv(r.c0, a.c0, b.c0);
  fq2_addv(r.c1, a.c1, b.c1);
  fq2_addv(r.c2, a.c2, b.c2);
}
static void fq6_subv(Fq6v& r, const Fq6v& a, const Fq6v& b) {
  fq2_subv(r.c0, a.c0, b.c0);
  fq2_subv(r.c1, a.c1, b.c1);
  fq2_subv(r.c2, a.c2, b.c2);
}
static void fq6_negv(Fq6v& r, const Fq6v& a) {
  fq2_negv(r.c0, a.c0);
  fq2_negv(r.c1, a.c1);
  fq2_negv(r.c2, a.c2);
}
static void fq6_mulv(Fq6v& r, const Fq6v& a, const Fq6v& b) {
  // Toom/Karatsuba layout identical to fields/host.py::fq6_mul
  Fq2v t0, t1, t2, s1, s2, m, x;
  fq2_mulv(t0, a.c0, b.c0);
  fq2_mulv(t1, a.c1, b.c1);
  fq2_mulv(t2, a.c2, b.c2);
  // c0 = t0 + nonres((a1+a2)(b1+b2) - t1 - t2)
  fq2_addv(s1, a.c1, a.c2);
  fq2_addv(s2, b.c1, b.c2);
  fq2_mulv(m, s1, s2);
  fq2_subv(m, m, t1);
  fq2_subv(m, m, t2);
  fq2_mul_nonres(x, m);
  Fq2v c0, c1, c2;
  fq2_addv(c0, t0, x);
  // c1 = (a0+a1)(b0+b1) - t0 - t1 + nonres(t2)
  fq2_addv(s1, a.c0, a.c1);
  fq2_addv(s2, b.c0, b.c1);
  fq2_mulv(m, s1, s2);
  fq2_subv(m, m, t0);
  fq2_subv(m, m, t1);
  fq2_mul_nonres(x, t2);
  fq2_addv(c1, m, x);
  // c2 = (a0+a2)(b0+b2) - t0 - t2 + t1
  fq2_addv(s1, a.c0, a.c2);
  fq2_addv(s2, b.c0, b.c2);
  fq2_mulv(m, s1, s2);
  fq2_subv(m, m, t0);
  fq2_subv(m, m, t2);
  fq2_addv(c2, m, t1);
  r.c0 = c0; r.c1 = c1; r.c2 = c2;
}
static void fq6_sqv(Fq6v& r, const Fq6v& a) { fq6_mulv(r, a, a); }
static void fq6_mul_nonres(Fq6v& r, const Fq6v& a) {
  // * v: (nonres(c2), c0, c1)
  Fq2v t;
  fq2_mul_nonres(t, a.c2);
  Fq2v c1 = a.c0, c2 = a.c1;
  r.c0 = t; r.c1 = c1; r.c2 = c2;
}
static void fq6_invv(Fq6v& r, const Fq6v& a) {
  Fq2v c0, c1, c2, t, m1, m2, s;
  fq2_sqv(c0, a.c0);
  fq2_mulv(t, a.c1, a.c2);
  fq2_mul_nonres(t, t);
  fq2_subv(c0, c0, t);
  fq2_sqv(t, a.c2);
  fq2_mul_nonres(t, t);
  fq2_mulv(m1, a.c0, a.c1);
  fq2_subv(c1, t, m1);
  fq2_sqv(t, a.c1);
  fq2_mulv(m2, a.c0, a.c2);
  fq2_subv(c2, t, m2);
  // t = inv(a0*c0 + nonres(a2*c1 + a1*c2))
  fq2_mulv(m1, a.c2, c1);
  fq2_mulv(m2, a.c1, c2);
  fq2_addv(s, m1, m2);
  fq2_mul_nonres(s, s);
  fq2_mulv(m1, a.c0, c0);
  fq2_addv(s, m1, s);
  fq2_invv(t, s);
  fq2_mulv(r.c0, t, c0);
  fq2_mulv(r.c1, t, c1);
  fq2_mulv(r.c2, t, c2);
}

static void fq12_mulv(Fq12v& r, const Fq12v& a, const Fq12v& b) {
  Fq6v t0, t1, s1, s2, m, x;
  fq6_mulv(t0, a.c0, b.c0);
  fq6_mulv(t1, a.c1, b.c1);
  fq6_addv(s1, a.c0, a.c1);
  fq6_addv(s2, b.c0, b.c1);
  fq6_mulv(m, s1, s2);
  fq6_subv(m, m, t0);
  fq6_subv(m, m, t1);
  fq6_mul_nonres(x, t1);
  fq6_addv(r.c0, t0, x);
  r.c1 = m;
}
static void fq12_sqv(Fq12v& r, const Fq12v& a) {
  // complex squaring, mirrors host.py::fq12_sq
  Fq6v t, s1, s2, m;
  fq6_mulv(t, a.c0, a.c1);
  fq6_addv(s1, a.c0, a.c1);
  fq6_mul_nonres(s2, a.c1);
  fq6_addv(s2, a.c0, s2);
  fq6_mulv(m, s1, s2);
  fq6_mul_nonres(s2, t);
  fq6_addv(s2, t, s2);
  fq6_subv(r.c0, m, s2);
  fq6_addv(r.c1, t, t);
}
static void fq12_conjv(Fq12v& r, const Fq12v& a) {
  r.c0 = a.c0;
  fq6_negv(r.c1, a.c1);
}
static void fq12_invv(Fq12v& r, const Fq12v& a) {
  Fq6v s0, s1, t;
  fq6_sqv(s0, a.c0);
  fq6_sqv(s1, a.c1);
  fq6_mul_nonres(s1, s1);
  fq6_subv(s0, s0, s1);
  fq6_invv(t, s0);
  fq6_mulv(r.c0, a.c0, t);
  fq6_mulv(s1, a.c1, t);
  fq6_negv(r.c1, s1);
}

// Frobenius coefficients gamma_j = (u+1)^(j*(q-1)/6), j = 0..5 (Montgomery)
static Fq2v FROB12[6];
static bool FROB_INIT = false;

static void fq2_pow_bits(Fq2v& r, const Fq2v& base, const u64* e, int words) {
  Fq2v acc;
  memcpy(acc.c0, FQ.one, 48);
  memset(acc.c1, 0, 48);
  bool started = false;
  for (int w = words - 1; w >= 0; w--)
    for (int b = 63; b >= 0; b--) {
      if (started) fq2_sqv(acc, acc);
      if ((e[w] >> b) & 1) {
        if (started) fq2_mulv(acc, acc, base);
        else { acc = base; started = true; }
      }
    }
  r = acc;
}

static void frob_init() {
  if (FROB_INIT) return;
  // e = (q-1)/6 as 6 words: q-1 is even; divide by 6 via long division
  u64 qm1[6];
  memcpy(qm1, FQ_MOD, 48);
  qm1[0] -= 1;  // q is odd, no borrow
  u64 e[6];
  u128 rem = 0;
  for (int i = 5; i >= 0; i--) {
    u128 cur = (rem << 64) | qm1[i];
    e[i] = (u64)(cur / 6);
    rem = cur % 6;
  }
  Fq2v xi;  // u+1 in Montgomery
  memcpy(xi.c0, FQ.one, 48);
  memcpy(xi.c1, FQ.one, 48);
  // FROB12[j] = xi^(j*e) — computed as successive powers of xi^e
  Fq2v g;
  fq2_pow_bits(g, xi, e, 6);
  memcpy(FROB12[0].c0, FQ.one, 48);
  memset(FROB12[0].c1, 0, 48);
  for (int j = 1; j < 6; j++) fq2_mulv(FROB12[j], FROB12[j - 1], g);
  FROB_INIT = true;
}

static void fq6_frobv(Fq6v& r, const Fq6v& a) {
  fq2_conjv(r.c0, a.c0);
  Fq2v t;
  fq2_conjv(t, a.c1);
  fq2_mulv(r.c1, t, FROB12[2]);
  fq2_conjv(t, a.c2);
  fq2_mulv(r.c2, t, FROB12[4]);
}
static void fq12_frobv(Fq12v& r, const Fq12v& a) {
  frob_init();
  fq6_frobv(r.c0, a.c0);
  Fq6v t;
  fq6_frobv(t, a.c1);
  fq2_mulv(r.c1.c0, t.c0, FROB12[1]);
  fq2_mulv(r.c1.c1, t.c1, FROB12[1]);
  fq2_mulv(r.c1.c2, t.c2, FROB12[1]);
}

// byte layout for an Fq12: 12 canonical LE 48-byte Fq values in the order
// c0.c0.c0, c0.c0.c1, c0.c1.c0, c0.c1.c1, c0.c2.c0, c0.c2.c1,
// c1.c0.c0, ... c1.c2.c1  (576 bytes total), matching the Python tuple
// nesting ((c0,c1,c2),(c0,c1,c2)) of pairs.
static void fq12_load(Fq12v& r, const uint8_t* b) {
  u64 t[6];
  u64* slots[12] = {r.c0.c0.c0, r.c0.c0.c1, r.c0.c1.c0, r.c0.c1.c1,
                    r.c0.c2.c0, r.c0.c2.c1, r.c1.c0.c0, r.c1.c0.c1,
                    r.c1.c1.c0, r.c1.c1.c1, r.c1.c2.c0, r.c1.c2.c1};
  for (int i = 0; i < 12; i++) {
    load6(t, b + i * 48);
    fq_to_mont(slots[i], t);
  }
}
static void fq12_store(uint8_t* b, const Fq12v& a) {
  u64 t[6];
  const u64* slots[12] = {a.c0.c0.c0, a.c0.c0.c1, a.c0.c1.c0, a.c0.c1.c1,
                          a.c0.c2.c0, a.c0.c2.c1, a.c1.c0.c0, a.c1.c0.c1,
                          a.c1.c1.c0, a.c1.c1.c1, a.c1.c2.c0, a.c1.c2.c1};
  for (int i = 0; i < 12; i++) {
    fq_from_mont(t, slots[i]);
    store6(b + i * 48, t);
  }
}

// BLS parameter |x| (x = -0xd201000000010000)
static const u64 BLS_X_ABS = 0xd201000000010000ULL;

// Affine Miller loop (mirrors curves/pairing.py::miller_loop).  Lines are
// emitted pre-scaled by xi = u+1:
//   l = yp*xi + w*( (lam*x_T - y_T) v  -  lam*xp v^2 )
// i.e. c0.c0 = (yp, yp);  c1.c1 = lam*x_T - y_T;  c1.c2 = -lam*xp.
struct MillerPair {
  u64 xp[6], yp[6];   // G1 affine (Montgomery)
  Fq2v xt, yt;        // running twist point T
  Fq2v xq, yq;        // fixed twist point Q
};

static void line_accumulate(Fq12v& f, const MillerPair& mp, const Fq2v& lam,
                            const Fq2v& xt, const Fq2v& yt) {
  // sparse fq12 mul: line has c0.c0 = (yp,yp); c1.c1 = lam*xt - yt;
  // c1.c2 = -lam*xp; all other coefficients zero.
  Fq12v l;
  memset(&l, 0, sizeof(l));
  memcpy(l.c0.c0.c0, mp.yp, 48);
  memcpy(l.c0.c0.c1, mp.yp, 48);
  Fq2v t;
  fq2_mulv(t, lam, xt);
  fq2_subv(l.c1.c1, t, yt);
  fq2_mul_fq(t, lam, mp.xp);
  fq2_negv(l.c1.c2, t);
  Fq12v out;
  fq12_mulv(out, f, l);
  f = out;
}

static void miller_step_double(Fq12v& f, MillerPair& mp) {
  // tangent at T
  Fq2v num, den, lam, x3, y3, t;
  fq2_sqv(num, mp.xt);
  Fq2v num3;
  fq2_addv(num3, num, num);
  fq2_addv(num3, num3, num);
  fq2_addv(den, mp.yt, mp.yt);
  fq2_invv(den, den);
  fq2_mulv(lam, num3, den);
  fq2_sqv(x3, lam);
  fq2_subv(x3, x3, mp.xt);
  fq2_subv(x3, x3, mp.xt);
  fq2_subv(t, mp.xt, x3);
  fq2_mulv(y3, lam, t);
  fq2_subv(y3, y3, mp.yt);
  line_accumulate(f, mp, lam, mp.xt, mp.yt);
  mp.xt = x3;
  mp.yt = y3;
}

static void miller_step_add(Fq12v& f, MillerPair& mp) {
  // chord through T and Q
  Fq2v dy, dx, lam, x3, y3, t;
  fq2_subv(dy, mp.yq, mp.yt);
  fq2_subv(dx, mp.xq, mp.xt);
  fq2_invv(dx, dx);
  fq2_mulv(lam, dy, dx);
  fq2_sqv(x3, lam);
  fq2_subv(x3, x3, mp.xt);
  fq2_subv(x3, x3, mp.xq);
  fq2_subv(t, mp.xt, x3);
  fq2_mulv(y3, lam, t);
  fq2_subv(y3, y3, mp.yt);
  line_accumulate(f, mp, lam, mp.xt, mp.yt);
  mp.xt = x3;
  mp.yt = y3;
}

// g1xy: npairs*96B (x,y canonical LE); g2xy: npairs*192B (x.c0,x.c1,y.c0,y.c1);
// inf flags: 1 byte each.  out: 576B Fq12 (canonical).
extern "C" void dn_miller_loop(const uint8_t* g1xy, const uint8_t* g1inf,
                               const uint8_t* g2xy, const uint8_t* g2inf,
                               int64_t npairs, uint8_t* out) {
  ensure_init();
  frob_init();
  std::vector<MillerPair> mps;
  for (int64_t i = 0; i < npairs; i++) {
    if (g1inf[i] || g2inf[i]) continue;
    MillerPair mp;
    u64 t[6];
    load6(t, g1xy + i * 96); fq_to_mont(mp.xp, t);
    load6(t, g1xy + i * 96 + 48); fq_to_mont(mp.yp, t);
    load6(t, g2xy + i * 192); fq_to_mont(mp.xq.c0, t);
    load6(t, g2xy + i * 192 + 48); fq_to_mont(mp.xq.c1, t);
    load6(t, g2xy + i * 192 + 96); fq_to_mont(mp.yq.c0, t);
    load6(t, g2xy + i * 192 + 144); fq_to_mont(mp.yq.c1, t);
    mp.xt = mp.xq;
    mp.yt = mp.yq;
    mps.push_back(mp);
  }
  Fq12v f;
  memset(&f, 0, sizeof(f));
  memcpy(f.c0.c0.c0, FQ.one, 48);
  // MSB-first over |x| skipping the leading 1 (pairing.py::miller_loop)
  int top = 63;
  while (!((BLS_X_ABS >> top) & 1)) top--;
  for (int b = top - 1; b >= 0; b--) {
    Fq12v fs;
    fq12_sqv(fs, f);
    f = fs;
    for (auto& mp : mps) miller_step_double(f, mp);
    if ((BLS_X_ABS >> b) & 1)
      for (auto& mp : mps) miller_step_add(f, mp);
  }
  // x negative: conjugate
  Fq12v fc;
  fq12_conjv(fc, f);
  fq12_store(out, fc);
}

// final exponentiation: easy part exact, hard part by square-and-multiply
// with the passed exponent (canonical LE bytes) — mirrors
// curves/pairing.py::final_exponentiation.
extern "C" void dn_final_exp(const uint8_t* in576, const uint8_t* hard_exp,
                             int64_t hard_len, uint8_t* out576) {
  ensure_init();
  frob_init();
  Fq12v f, t1, t2;
  fq12_load(f, in576);
  // f^(q^6-1) = conj(f) * f^-1
  fq12_invv(t1, f);
  fq12_conjv(t2, f);
  fq12_mulv(f, t2, t1);
  // ^(q^2+1)
  fq12_frobv(t1, f);
  fq12_frobv(t2, t1);
  fq12_mulv(f, t2, f);
  // hard part: square-and-multiply MSB-first over hard_exp bytes
  Fq12v acc;
  memset(&acc, 0, sizeof(acc));
  memcpy(acc.c0.c0.c0, FQ.one, 48);
  bool started = false;
  for (int64_t i = hard_len - 1; i >= 0; i--) {
    uint8_t byte = hard_exp[i];
    for (int b = 7; b >= 0; b--) {
      if (started) { Fq12v s; fq12_sqv(s, acc); acc = s; }
      if ((byte >> b) & 1) {
        if (started) { Fq12v m; fq12_mulv(m, acc, f); acc = m; }
        else { acc = f; started = true; }
      }
    }
  }
  fq12_store(out576, acc);
}

// one-call pairing product check: product of e(Pi, Qi) == 1?
// ---------------------------------------------------------------------------
// Prepared-G2 pairing (the reference's EvaluationKey carries prepared_beta_h
// / prepared_h, src/commitment_scheme.rs:51-58).  The affine Miller loop
// above pays one Fq2 inversion (a ~380-mul Fermat ladder) per step per
// pair; the verifier's G2 points never change, so the per-step
// (lambda, x_T, y_T) line coefficients are computed ONCE per key and
// replayed — the prepared loop is pure Fq12 accumulation.
// ---------------------------------------------------------------------------

struct LineStep { Fq2v lam, xt, yt; };  // 288 bytes, raw Montgomery

static int64_t miller_nsteps() {
  int top = 63;
  while (!((BLS_X_ABS >> top) & 1)) top--;
  int64_t n = 0;
  for (int b = top - 1; b >= 0; b--) {
    n++;
    if ((BLS_X_ABS >> b) & 1) n++;
  }
  return n;
}

static int64_t prepare_lines(const Fq2v& xq, const Fq2v& yq, LineStep* out) {
  Fq2v xt = xq, yt = yq;
  int64_t k = 0;
  int top = 63;
  while (!((BLS_X_ABS >> top) & 1)) top--;
  for (int b = top - 1; b >= 0; b--) {
    {
      Fq2v num, num3, den, lam, x3, y3, t;
      fq2_sqv(num, xt);
      fq2_addv(num3, num, num);
      fq2_addv(num3, num3, num);
      fq2_addv(den, yt, yt);
      fq2_invv(den, den);
      fq2_mulv(lam, num3, den);
      out[k].lam = lam; out[k].xt = xt; out[k].yt = yt; k++;
      fq2_sqv(x3, lam);
      fq2_subv(x3, x3, xt);
      fq2_subv(x3, x3, xt);
      fq2_subv(t, xt, x3);
      fq2_mulv(y3, lam, t);
      fq2_subv(y3, y3, yt);
      xt = x3; yt = y3;
    }
    if ((BLS_X_ABS >> b) & 1) {
      Fq2v dy, dx, lam, x3, y3, t;
      fq2_subv(dy, yq, yt);
      fq2_subv(dx, xq, xt);
      fq2_invv(dx, dx);
      fq2_mulv(lam, dy, dx);
      out[k].lam = lam; out[k].xt = xt; out[k].yt = yt; k++;
      fq2_sqv(x3, lam);
      fq2_subv(x3, x3, xt);
      fq2_subv(x3, x3, xq);
      fq2_subv(t, xt, x3);
      fq2_mulv(y3, lam, t);
      fq2_subv(y3, y3, yt);
      xt = x3; yt = y3;
    }
  }
  return k;
}

extern "C" int64_t dn_miller_nsteps() { return miller_nsteps(); }

extern "C" int64_t dn_g2_prepare(const uint8_t* g2xy, int64_t g2inf,
                                 uint8_t* out) {
  // out: miller_nsteps() * 288 bytes of raw-Montgomery LineStep records
  // (opaque to callers; consumed by dn_miller_loop_prepared only)
  ensure_init();
  if (g2inf) return 0;
  Fq2v xq, yq;
  u64 t[6];
  load6(t, g2xy); fq_to_mont(xq.c0, t);
  load6(t, g2xy + 48); fq_to_mont(xq.c1, t);
  load6(t, g2xy + 96); fq_to_mont(yq.c0, t);
  load6(t, g2xy + 144); fq_to_mont(yq.c1, t);
  return prepare_lines(xq, yq, (LineStep*)out);
}

static void line_acc_prepared(Fq12v& f, const u64* xp, const u64* yp,
                              const LineStep& s) {
  Fq12v l;
  memset(&l, 0, sizeof(l));
  memcpy(l.c0.c0.c0, yp, 48);
  memcpy(l.c0.c0.c1, yp, 48);
  Fq2v t;
  fq2_mulv(t, s.lam, s.xt);
  fq2_subv(l.c1.c1, t, s.yt);
  fq2_mul_fq(t, s.lam, xp);
  fq2_negv(l.c1.c2, t);
  Fq12v o;
  fq12_mulv(o, f, l);
  f = o;
}

extern "C" void dn_miller_loop_prepared(const uint8_t* g1xy,
                                        const uint8_t* g1inf,
                                        const uint8_t* lines,
                                        const uint8_t* active,
                                        int64_t npairs, uint8_t* out) {
  ensure_init();
  frob_init();
  int64_t nsteps = miller_nsteps();
  struct PPair { u64 xp[6], yp[6]; const LineStep* ls; };
  std::vector<PPair> mps;
  for (int64_t i = 0; i < npairs; i++) {
    if (!active[i] || g1inf[i]) continue;
    PPair p;
    u64 t[6];
    load6(t, g1xy + i * 96); fq_to_mont(p.xp, t);
    load6(t, g1xy + i * 96 + 48); fq_to_mont(p.yp, t);
    p.ls = (const LineStep*)(lines + i * nsteps * (int64_t)sizeof(LineStep));
    mps.push_back(p);
  }
  Fq12v f;
  memset(&f, 0, sizeof(f));
  memcpy(f.c0.c0.c0, FQ.one, 48);
  int top = 63;
  while (!((BLS_X_ABS >> top) & 1)) top--;
  int64_t k = 0;
  for (int b = top - 1; b >= 0; b--) {
    Fq12v fs;
    fq12_sqv(fs, f);
    f = fs;
    for (auto& p : mps) line_acc_prepared(f, p.xp, p.yp, p.ls[k]);
    k++;
    if ((BLS_X_ABS >> b) & 1) {
      for (auto& p : mps) line_acc_prepared(f, p.xp, p.yp, p.ls[k]);
      k++;
    }
  }
  Fq12v fc;
  fq12_conjv(fc, f);
  fq12_store(out, fc);
}

extern "C" void dn_final_exp_fast(const uint8_t* in576, uint8_t* out576);

extern "C" int dn_pairing_is_one_prepared(const uint8_t* g1xy,
                                          const uint8_t* g1inf,
                                          const uint8_t* lines,
                                          const uint8_t* active,
                                          int64_t npairs) {
  uint8_t mid[576], fin[576];
  dn_miller_loop_prepared(g1xy, g1inf, lines, active, npairs, mid);
  dn_final_exp_fast(mid, fin);
  static const uint8_t one48[48] = {1};
  if (memcmp(fin, one48, 48) != 0) return 0;
  for (int i = 48; i < 576; i++)
    if (fin[i]) return 0;
  return 1;
}

extern "C" int dn_pairing_is_one(const uint8_t* g1xy, const uint8_t* g1inf,
                                 const uint8_t* g2xy, const uint8_t* g2inf,
                                 int64_t npairs, const uint8_t* hard_exp,
                                 int64_t hard_len) {
  // Uses the fast chain, which computes f^(3*lambda); since Gt has prime
  // order r and gcd(3, r) = 1 this is 1 exactly when f^lambda is 1.
  (void)hard_exp; (void)hard_len;
  uint8_t mid[576], fin[576];
  dn_miller_loop(g1xy, g1inf, g2xy, g2inf, npairs, mid);
  dn_final_exp_fast(mid, fin);
  // identity: c0.c0.c0 == 1, all else zero
  static const uint8_t one48[48] = {1};
  if (memcmp(fin, one48, 48) != 0) return 0;
  for (int i = 48; i < 576; i++)
    if (fin[i]) return 0;
  return 1;
}

// ---------------------------------------------------------------------------
// Fast final exponentiation: Granger-Scott cyclotomic squaring + the BLS12
// hard-part addition chain in powers of the curve parameter x.  Verified
// against the plain square-and-multiply dn_final_exp in tests/test_native.py
// (both must agree on random Miller outputs).
// ---------------------------------------------------------------------------

// fp4 squaring over Fq2 pairs with nonresidue v: (a + b w')^2, w'^2 = v
static void fp4_sq(Fq2v& c0, Fq2v& c1, const Fq2v& a, const Fq2v& b) {
  Fq2v t0, t1, t2;
  fq2_sqv(t0, a);
  fq2_sqv(t1, b);
  fq2_mul_nonres(t2, t1);
  fq2_addv(c0, t2, t0);
  fq2_addv(t2, a, b);
  fq2_sqv(t2, t2);
  fq2_subv(t2, t2, t0);
  fq2_subv(c1, t2, t1);
}

// cyclotomic squaring (Granger-Scott) — valid only for elements of the
// cyclotomic subgroup (after the easy part)
static void fq12_cyc_sq(Fq12v& r, const Fq12v& f) {
  Fq2v z0 = f.c0.c0, z4 = f.c0.c1, z3 = f.c0.c2;
  Fq2v z2 = f.c1.c0, z1 = f.c1.c1, z5 = f.c1.c2;
  Fq2v t0, t1, t2, t3, tmp;

  fp4_sq(t0, t1, z0, z1);
  // z0 = 3 t0 - 2 z0;  z1 = 3 t1 + 2 z1
  fq2_subv(tmp, t0, z0);
  fq2_addv(tmp, tmp, tmp);
  fq2_addv(z0, tmp, t0);
  fq2_addv(tmp, t1, z1);
  fq2_addv(tmp, tmp, tmp);
  fq2_addv(z1, tmp, t1);

  fp4_sq(t0, t1, z2, z3);
  fp4_sq(t2, t3, z4, z5);
  // z4 = 3 t0 - 2 z4;  z5 = 3 t1 + 2 z5
  fq2_subv(tmp, t0, z4);
  fq2_addv(tmp, tmp, tmp);
  fq2_addv(z4, tmp, t0);
  fq2_addv(tmp, t1, z5);
  fq2_addv(tmp, tmp, tmp);
  fq2_addv(z5, tmp, t1);
  // z2 = 3 nonres(t3) + 2 z2;  z3 = 3 t2 - 2 z3
  fq2_mul_nonres(t0, t3);
  fq2_addv(tmp, t0, z2);
  fq2_addv(tmp, tmp, tmp);
  fq2_addv(z2, tmp, t0);
  fq2_subv(tmp, t2, z3);
  fq2_addv(tmp, tmp, tmp);
  fq2_addv(z3, tmp, t2);

  r.c0.c0 = z0; r.c0.c1 = z4; r.c0.c2 = z3;
  r.c1.c0 = z2; r.c1.c1 = z1; r.c1.c2 = z5;
}

// f^|x| via cyclotomic squarings, then conjugate (x is negative)
static void fq12_cyc_exp(Fq12v& r, const Fq12v& f) {
  Fq12v acc;
  bool started = false;
  for (int b = 63; b >= 0; b--) {
    if (started) { Fq12v s; fq12_cyc_sq(s, acc); acc = s; }
    if ((BLS_X_ABS >> b) & 1) {
      if (started) { Fq12v m; fq12_mulv(m, acc, f); acc = m; }
      else { acc = f; started = true; }
    }
  }
  fq12_conjv(r, acc);
}

extern "C" void dn_final_exp_fast(const uint8_t* in576, uint8_t* out576) {
  ensure_init();
  frob_init();
  Fq12v f, i1, i2;
  fq12_load(f, in576);
  // easy part: f^((q^6-1)(q^2+1))
  fq12_invv(i1, f);
  fq12_conjv(i2, f);
  fq12_mulv(f, i2, i1);
  fq12_frobv(i1, f);
  fq12_frobv(i2, i1);
  fq12_mulv(f, i2, f);

  // hard part addition chain (t2 = f is in the cyclotomic subgroup now)
  Fq12v t0, t1, t2, t3, t4, t5, t6, m;
  t2 = f;
  fq12_cyc_sq(t1, t2);
  { Fq12v c; fq12_conjv(c, t1); t1 = c; }
  fq12_cyc_exp(t3, t2);
  fq12_cyc_sq(t4, t3);
  fq12_mulv(t5, t1, t3);
  fq12_cyc_exp(t1, t5);
  fq12_cyc_exp(t0, t1);
  fq12_cyc_exp(t6, t0);
  fq12_mulv(m, t6, t4); t6 = m;
  fq12_cyc_exp(t4, t6);
  { Fq12v c; fq12_conjv(c, t5); t5 = c; }
  fq12_mulv(m, t4, t5); t4 = m;
  fq12_mulv(m, t4, t2); t4 = m;
  fq12_conjv(t5, t2);
  fq12_mulv(m, t1, t2); t1 = m;
  fq12_frobv(m, t1); fq12_frobv(t1, m); fq12_frobv(m, t1); t1 = m;
  fq12_mulv(m, t6, t5); t6 = m;
  fq12_frobv(m, t6); t6 = m;
  fq12_mulv(m, t3, t0); t3 = m;
  fq12_frobv(m, t3); fq12_frobv(t3, m);
  fq12_mulv(m, t3, t1); t3 = m;
  fq12_mulv(m, t3, t6); t3 = m;
  fq12_mulv(m, t3, t4);
  fq12_store(out576, m);
}
