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
  int c;
  if (m < 32) c = 4;
  else {
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

