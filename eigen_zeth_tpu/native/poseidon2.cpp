// Native Poseidon2-Goldilocks batch hasher.
//
// Role: the HOST-side hashing engine of the proving stack — Merkle tree
// commits and sponge hashing for the CPU/test path and for host tails of
// the layered device commit (models/merkle.py).  The Python numpy
// fallback (ops/poseidon.np_perm) measures ~23K hashes/s; this engine is
// ~50-100x that (4-core std::thread fan-out, __uint128_t field mul).
//
// The instance (width 12, rate 8, x^7, RF=8, RP=22, external
// circ(2*M4, M4, M4), internal allones+diag(mu)) matches
// ops/poseidon.py; round constants and the internal diagonal are
// GENERATED in Python (SHA-256 tags, nothing-up-my-sleeve) and injected
// once via p2gl_init — keeping a single source of truth for parameters.
//
// Reference context: fills the native-hashing role of the reference's
// external eigen-prover service (SURVEY.md §2.9-bis; the reference repo
// itself computes no hashes — proto/prover/v1/prover.proto:9-11).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

constexpr uint64_t P = 0xFFFFFFFF00000001ull;  // 2^64 - 2^32 + 1
constexpr int WIDTH = 12;
constexpr int RATE = 8;
constexpr int DIGEST = 4;
constexpr int FULL_ROUNDS = 8;
constexpr int PARTIAL_ROUNDS = 22;
constexpr int N_ROUNDS = FULL_ROUNDS + PARTIAL_ROUNDS;

uint64_t RC[N_ROUNDS][WIDTH];  // internal rounds: lane 0 only (rest zero)
uint64_t MU[WIDTH];
bool g_init = false;

inline uint64_t add_p(uint64_t a, uint64_t b) {
  // a, b < p: one conditional subtract after a possibly-wrapping add.
  uint64_t s = a + b;
  // wrap (s < a): 2^64 ≡ 2^32 - 1 (mod p)
  if (s < a) s += 0xFFFFFFFFull;
  if (s >= P) s -= P;
  return s;
}

inline uint64_t mul_p(uint64_t a, uint64_t b) {
  __uint128_t t = (__uint128_t)a * b;
  uint64_t lo = (uint64_t)t;
  uint64_t hi = (uint64_t)(t >> 64);
  uint64_t hi_l = hi & 0xFFFFFFFFull;
  uint64_t hi_h = hi >> 32;
  // t ≡ lo + hi_l·(2^32−1) − hi_h  (mod p)
  uint64_t r = lo - hi_h;
  if (lo < hi_h) r -= 0xFFFFFFFFull;  // borrow: wrap ≡ +p
  uint64_t t1 = hi_l * 0xFFFFFFFFull;  // < 2^64
  uint64_t s = r + t1;
  if (s < r) s += 0xFFFFFFFFull;  // carry: wrap ≡ −p → re-add 2^32−1
  if (s >= P) s -= P;
  return s;
}

inline uint64_t sbox7(uint64_t x) {
  uint64_t x2 = mul_p(x, x);
  uint64_t x4 = mul_p(x2, x2);
  return mul_p(mul_p(x4, x2), x);
}

inline void m4_block(uint64_t* x) {
  // M4 addition chain (matches _m4_block_host)
  uint64_t t0 = add_p(x[0], x[1]);
  uint64_t t1 = add_p(x[2], x[3]);
  uint64_t t2 = add_p(add_p(x[1], x[1]), t1);
  uint64_t t3 = add_p(add_p(x[3], x[3]), t0);
  uint64_t t4 = add_p(add_p(add_p(t1, t1), add_p(t1, t1)), t3);
  uint64_t t5 = add_p(add_p(add_p(t0, t0), add_p(t0, t0)), t2);
  uint64_t t6 = add_p(t3, t5);
  uint64_t t7 = add_p(t2, t4);
  x[0] = t6;
  x[1] = t5;
  x[2] = t7;
  x[3] = t4;
}

inline void external_layer(uint64_t* s) {
  uint64_t z[3][4];
  for (int b = 0; b < 3; b++) {
    for (int i = 0; i < 4; i++) z[b][i] = s[4 * b + i];
    m4_block(z[b]);
  }
  uint64_t tot[4];
  for (int i = 0; i < 4; i++) tot[i] = add_p(add_p(z[0][i], z[1][i]), z[2][i]);
  for (int b = 0; b < 3; b++)
    for (int i = 0; i < 4; i++) s[4 * b + i] = add_p(z[b][i], tot[i]);
}

inline void internal_layer(uint64_t* s) {
  uint64_t tot = s[0];
  for (int i = 1; i < WIDTH; i++) tot = add_p(tot, s[i]);
  for (int i = 0; i < WIDTH; i++) s[i] = add_p(tot, mul_p(MU[i], s[i]));
}

inline bool full_round(int r) {
  int half = FULL_ROUNDS / 2;
  return r < half || r >= half + PARTIAL_ROUNDS;
}

inline void perm(uint64_t* s) {
  external_layer(s);
  for (int r = 0; r < N_ROUNDS; r++) {
    if (full_round(r)) {
      for (int i = 0; i < WIDTH; i++) s[i] = sbox7(add_p(s[i], RC[r][i]));
      external_layer(s);
    } else {
      s[0] = sbox7(add_p(s[0], RC[r][0]));
      internal_layer(s);
    }
  }
}

void parallel_for(uint64_t n, const std::function<void(uint64_t, uint64_t)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 1;
  uint64_t grain = 256;  // rows per task minimum
  unsigned nt = (unsigned)std::min<uint64_t>(hw, (n + grain - 1) / grain);
  if (nt <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> ts;
  uint64_t per = (n + nt - 1) / nt;
  for (unsigned t = 0; t < nt; t++) {
    uint64_t lo = t * per, hi = std::min<uint64_t>(n, lo + per);
    if (lo >= hi) break;
    ts.emplace_back([&, lo, hi] { fn(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

void p2gl_init(const uint64_t* rc, const uint64_t* mu) {
  std::memcpy(RC, rc, sizeof(RC));
  std::memcpy(MU, mu, sizeof(MU));
  g_init = true;
}

// states: (n, 12) row-major, permuted in place
void p2gl_perm_batch(uint64_t* states, uint64_t n) {
  parallel_for(n, [&](uint64_t lo, uint64_t hi) {
    for (uint64_t i = lo; i < hi; i++) perm(states + i * WIDTH);
  });
}

// rows: (n, k) -> out (n, 4) sponge digests (matches hash_elements_host)
void p2gl_hash_elements(const uint64_t* rows, uint64_t n, uint64_t k,
                        uint64_t* out) {
  parallel_for(n, [&](uint64_t lo, uint64_t hi) {
    for (uint64_t i = lo; i < hi; i++) {
      uint64_t st[WIDTH] = {0};
      st[RATE] = k % P;
      const uint64_t* row = rows + i * k;
      uint64_t nblocks = k == 0 ? 1 : (k + RATE - 1) / RATE;
      for (uint64_t b = 0; b < nblocks; b++) {
        uint64_t blen = (b + 1) * RATE <= k ? RATE : (k > b * RATE ? k - b * RATE : 0);
        for (uint64_t j = 0; j < blen; j++)
          st[j] = add_p(st[j], row[b * RATE + j]);
        perm(st);
      }
      std::memcpy(out + i * DIGEST, st, DIGEST * sizeof(uint64_t));
    }
  });
}

// left, right: (n, 4) -> out (n, 4) 2-to-1 compression
void p2gl_hash_two(const uint64_t* left, const uint64_t* right, uint64_t n,
                   uint64_t* out) {
  parallel_for(n, [&](uint64_t lo, uint64_t hi) {
    for (uint64_t i = lo; i < hi; i++) {
      uint64_t st[WIDTH] = {0};
      std::memcpy(st, left + i * DIGEST, DIGEST * sizeof(uint64_t));
      std::memcpy(st + DIGEST, right + i * DIGEST, DIGEST * sizeof(uint64_t));
      perm(st);
      std::memcpy(out + i * DIGEST, st, DIGEST * sizeof(uint64_t));
    }
  });
}

// digests: (n, 4), n a power of two.  out receives the interior levels
// bottom-up, concatenated: widths n/2, n/4, ..., 1 — (n-1) digests total.
void p2gl_tree(const uint64_t* digests, uint64_t n, uint64_t* out) {
  const uint64_t* cur = digests;
  uint64_t* dst = out;
  uint64_t width = n;
  while (width > 1) {
    uint64_t half = width / 2;
    uint64_t* level = dst;
    parallel_for(half, [&](uint64_t lo, uint64_t hi) {
      for (uint64_t i = lo; i < hi; i++) {
        uint64_t st[WIDTH] = {0};
        std::memcpy(st, cur + (2 * i) * DIGEST, DIGEST * sizeof(uint64_t));
        std::memcpy(st + DIGEST, cur + (2 * i + 1) * DIGEST,
                    DIGEST * sizeof(uint64_t));
        perm(st);
        std::memcpy(level + i * DIGEST, st, DIGEST * sizeof(uint64_t));
      }
    });
    cur = level;
    dst += half * DIGEST;
    width = half;
  }
}

int p2gl_ready() { return g_init ? 1 : 0; }

}  // extern "C"
