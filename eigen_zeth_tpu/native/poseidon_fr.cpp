// Native Poseidon2-BN254-Fr batch hasher — the wrap layer's host engine.
//
// Role: Merkle-tree construction and sponge hashing over Fr for the
// final-wrap pipeline (models/merkle_fr.py, models/air_wrap.py) and the
// transcript grinding loop (models/transcript_fr.py).  The python
// perm_host runs ~1.5K perms/s; this engine is ~30-50x that (4x64-limb
// Montgomery CIOS with unsigned __int128, std::thread fan-out), which is
// what makes production-scale wrap attestations (2^20+-leaf Fr trees)
// and 2^16 grinding attempts practical on the host.
//
// The instance (width 12, rate 11, x^5, RF=8, RP=68, external
// circ(2*M4, M4, M4), internal allones+diag(mu)) matches
// ops/poseidon_fr.py; ALL parameters — modulus limbs, Montgomery
// constants, round constants and the diagonal (pre-converted to
// Montgomery form) — are injected from Python at load time, keeping one
// source of truth.  Bit-identity with perm_host is tested.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace {

constexpr int WIDTH = 12;
constexpr int NL = 4;  // 4 x 64-bit limbs
constexpr int FULL_ROUNDS = 8;
constexpr int PARTIAL_ROUNDS = 68;
constexpr int N_ROUNDS = FULL_ROUNDS + PARTIAL_ROUNDS;

using u64 = uint64_t;
using u128 = unsigned __int128;

u64 N[NL];        // modulus
u64 N0INV;        // -N^{-1} mod 2^64
u64 R2[NL];       // 2^512 mod N (to-Montgomery factor)
u64 RC[N_ROUNDS][WIDTH][NL];  // Montgomery form
u64 MU[WIDTH][NL];            // Montgomery form

struct Fe {
  u64 l[NL];
};

inline bool geq(const u64* a, const u64* b) {
  for (int i = NL - 1; i >= 0; i--) {
    if (a[i] != b[i]) return a[i] > b[i];
  }
  return true;
}

inline void sub_n(u64* a, const u64* b) {
  u128 borrow = 0;
  for (int i = 0; i < NL; i++) {
    u128 d = (u128)a[i] - b[i] - borrow;
    a[i] = (u64)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

inline void add_mod(Fe& out, const Fe& a, const Fe& b) {
  u128 carry = 0;
  for (int i = 0; i < NL; i++) {
    u128 s = (u128)a.l[i] + b.l[i] + carry;
    out.l[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || geq(out.l, N)) sub_n(out.l, N);
}

inline void dbl_mod(Fe& out, const Fe& a) { add_mod(out, a, a); }

// Montgomery CIOS multiply: out = a*b*R^{-1} mod N
inline void mont_mul(Fe& out, const Fe& a, const Fe& b) {
  u64 t[NL + 1] = {0};
  for (int i = 0; i < NL; i++) {
    // t += a[i] * b
    u128 carry = 0;
    for (int j = 0; j < NL; j++) {
      u128 cur = (u128)t[j] + (u128)a.l[i] * b.l[j] + carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u64 t_hi = (u64)((u128)t[NL] + carry);
    u64 extra = (u64)(((u128)t[NL] + carry) >> 64);
    t[NL] = t_hi;
    // m = t[0] * N0INV mod 2^64;  t += m*N;  t >>= 64
    u64 m = t[0] * N0INV;
    carry = ((u128)m * N[0] + t[0]) >> 64;
    for (int j = 1; j < NL; j++) {
      u128 cur = (u128)t[j] + (u128)m * N[j] + carry;
      t[j - 1] = (u64)cur;
      carry = cur >> 64;
    }
    u128 last = (u128)t[NL] + carry;
    t[NL - 1] = (u64)last;
    t[NL] = extra + (u64)(last >> 64);
  }
  std::memcpy(out.l, t, sizeof(out.l));
  if (t[NL] || geq(out.l, N)) sub_n(out.l, N);
}

inline void to_mont(Fe& out, const Fe& a) {
  Fe r2;
  std::memcpy(r2.l, R2, sizeof(r2.l));
  mont_mul(out, a, r2);
}

inline void from_mont(Fe& out, const Fe& a) {
  Fe one = {{1, 0, 0, 0}};
  mont_mul(out, a, one);
}

inline void sbox5(Fe& x) {
  Fe x2, x4;
  mont_mul(x2, x, x);
  mont_mul(x4, x2, x2);
  mont_mul(x, x4, x);
}

inline void m4_block(Fe* x) {
  Fe t0, t1, t2, t3, t4, t5, t6, t7, tmp;
  add_mod(t0, x[0], x[1]);
  add_mod(t1, x[2], x[3]);
  dbl_mod(tmp, x[1]);
  add_mod(t2, tmp, t1);
  dbl_mod(tmp, x[3]);
  add_mod(t3, tmp, t0);
  dbl_mod(tmp, t1);
  dbl_mod(tmp, tmp);
  add_mod(t4, tmp, t3);
  dbl_mod(tmp, t0);
  dbl_mod(tmp, tmp);
  add_mod(t5, tmp, t2);
  add_mod(t6, t3, t5);
  add_mod(t7, t2, t4);
  x[0] = t6;
  x[1] = t5;
  x[2] = t7;
  x[3] = t4;
}

inline void external_layer(Fe* s) {
  Fe z[3][4];
  for (int b = 0; b < 3; b++) {
    for (int i = 0; i < 4; i++) z[b][i] = s[4 * b + i];
    m4_block(z[b]);
  }
  Fe tot[4];
  for (int i = 0; i < 4; i++) {
    add_mod(tot[i], z[0][i], z[1][i]);
    add_mod(tot[i], tot[i], z[2][i]);
  }
  for (int b = 0; b < 3; b++)
    for (int i = 0; i < 4; i++) add_mod(s[4 * b + i], z[b][i], tot[i]);
}

inline void internal_layer(Fe* s) {
  Fe tot = s[0];
  for (int i = 1; i < WIDTH; i++) add_mod(tot, tot, s[i]);
  for (int i = 0; i < WIDTH; i++) {
    Fe mu;
    std::memcpy(mu.l, MU[i], sizeof(mu.l));
    Fe d;
    mont_mul(d, mu, s[i]);
    add_mod(s[i], tot, d);
  }
}

inline bool full_round(int r) {
  int half = FULL_ROUNDS / 2;
  return r < half || r >= half + PARTIAL_ROUNDS;
}

inline void perm(Fe* s) {  // state in Montgomery form
  external_layer(s);
  for (int r = 0; r < N_ROUNDS; r++) {
    if (full_round(r)) {
      for (int i = 0; i < WIDTH; i++) {
        Fe c;
        std::memcpy(c.l, RC[r][i], sizeof(c.l));
        add_mod(s[i], s[i], c);
        sbox5(s[i]);
      }
      external_layer(s);
    } else {
      Fe c;
      std::memcpy(c.l, RC[r][0], sizeof(c.l));
      add_mod(s[0], s[0], c);
      sbox5(s[0]);
      internal_layer(s);
    }
  }
}

void parallel_for(u64 n, const std::function<void(u64, u64)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 1;
  u64 grain = 64;
  unsigned nt = (unsigned)std::min<u64>(hw, (n + grain - 1) / grain);
  if (nt <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> ts;
  u64 per = (n + nt - 1) / nt;
  for (unsigned t = 0; t < nt; t++) {
    u64 lo = t * per, hi = std::min<u64>(n, lo + per);
    if (lo >= hi) break;
    ts.emplace_back([&, lo, hi] { fn(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

void pfr_init(const u64* n_limbs, u64 n0inv, const u64* r2_limbs,
              const u64* rc_mont, const u64* mu_mont) {
  std::memcpy(N, n_limbs, sizeof(N));
  N0INV = n0inv;
  std::memcpy(R2, r2_limbs, sizeof(R2));
  std::memcpy(RC, rc_mont, sizeof(RC));
  std::memcpy(MU, mu_mont, sizeof(MU));
}

// states: (n, 12, 4) regular-form limbs, permuted in place
void pfr_perm_batch(u64* states, u64 n) {
  parallel_for(n, [&](u64 lo, u64 hi) {
    for (u64 i = lo; i < hi; i++) {
      Fe s[WIDTH];
      for (int j = 0; j < WIDTH; j++) {
        Fe raw;
        std::memcpy(raw.l, states + (i * WIDTH + j) * NL, sizeof(raw.l));
        to_mont(s[j], raw);
      }
      perm(s);
      for (int j = 0; j < WIDTH; j++) {
        Fe out;
        from_mont(out, s[j]);
        std::memcpy(states + (i * WIDTH + j) * NL, out.l, sizeof(out.l));
      }
    }
  });
}

// 2-to-1 nodes: left/right (n, 4) regular; cap = capacity lane value
// (4 limbs regular); out (n, 4) = state[0]
void pfr_hash_two(const u64* left, const u64* right, const u64* cap, u64 n,
                  u64* out) {
  Fe cap_m;
  {
    Fe raw;
    std::memcpy(raw.l, cap, sizeof(raw.l));
    to_mont(cap_m, raw);
  }
  parallel_for(n, [&](u64 lo, u64 hi) {
    for (u64 i = lo; i < hi; i++) {
      Fe s[WIDTH];
      std::memset(s, 0, sizeof(s));
      Fe raw;
      std::memcpy(raw.l, left + i * NL, sizeof(raw.l));
      to_mont(s[0], raw);
      std::memcpy(raw.l, right + i * NL, sizeof(raw.l));
      to_mont(s[1], raw);
      s[WIDTH - 1] = cap_m;
      perm(s);
      Fe o;
      from_mont(o, s[0]);
      std::memcpy(out + i * NL, o.l, sizeof(o.l));
    }
  });
}

// sponge rows: rows (n, k, 4) regular, cap (4 limbs regular, already
// includes the +len term), out (n, 4)
void pfr_hash_rows(const u64* rows, u64 n, u64 k, const u64* cap, u64* out) {
  constexpr int RATE = WIDTH - 1;
  Fe cap_m;
  {
    Fe raw;
    std::memcpy(raw.l, cap, sizeof(raw.l));
    to_mont(cap_m, raw);
  }
  parallel_for(n, [&](u64 lo, u64 hi) {
    for (u64 i = lo; i < hi; i++) {
      Fe s[WIDTH];
      std::memset(s, 0, sizeof(s));
      s[WIDTH - 1] = cap_m;
      for (u64 b = 0; b < (k + RATE - 1) / RATE || (b == 0 && k == 0); b++) {
        u64 blen = std::min<u64>(RATE, k - b * RATE);
        for (u64 j = 0; j < blen; j++) {
          Fe raw, m;
          std::memcpy(raw.l, rows + (i * k + b * RATE + j) * NL, sizeof(raw.l));
          to_mont(m, raw);
          add_mod(s[j], s[j], m);
        }
        perm(s);
      }
      Fe o;
      from_mont(o, s[0]);
      std::memcpy(out + i * NL, o.l, sizeof(o.l));
    }
  });
}

// tree over (n, 4) digests with the "node" capacity: out = (n-1, 4)
// interior levels bottom-up (widths n/2 .. 1)
void pfr_tree(const u64* digests, u64 n, const u64* cap, u64* out) {
  const u64* cur = digests;
  u64* dst = out;
  u64 width = n;
  // interleave left/right from adjacent digests
  std::vector<u64> l, r;
  while (width > 1) {
    u64 half = width / 2;
    l.resize(half * NL);
    r.resize(half * NL);
    for (u64 i = 0; i < half; i++) {
      std::memcpy(&l[i * NL], cur + (2 * i) * NL, NL * 8);
      std::memcpy(&r[i * NL], cur + (2 * i + 1) * NL, NL * 8);
    }
    pfr_hash_two(l.data(), r.data(), cap, half, dst);
    cur = dst;
    dst += half * NL;
    width = half;
  }
}

// grinding: given a prepared duplex state (12, 4) regular form and the
// absorb/challenge framing constants, try nonces start..start+count-1:
// state' = state; absorb(grind_label, nonce); c = challenge(...);
// return the first nonce whose challenge has `bits` low zero bits, or
// ~0 if none in range.  The framing mirrors TranscriptFr exactly:
// absorb label const, absorb nonce, challenge label const, permute.
u64 pfr_grind(const u64* state, u64 pos, const u64* absorb_tag,
              const u64* chal_tag, u64 bits, u64 start, u64 count) {
  constexpr int RATE = WIDTH - 1;
  Fe base[WIDTH];
  for (int j = 0; j < WIDTH; j++) {
    Fe raw;
    std::memcpy(raw.l, state + j * NL, sizeof(raw.l));
    to_mont(base[j], raw);
  }
  Fe ab_m, ch_m;
  {
    Fe raw;
    std::memcpy(raw.l, absorb_tag, sizeof(raw.l));
    to_mont(ab_m, raw);
    std::memcpy(raw.l, chal_tag, sizeof(raw.l));
    to_mont(ch_m, raw);
  }
  u64 mask = (bits >= 64) ? ~0ull : ((1ull << bits) - 1);
  u64 found = ~0ull;
  std::mutex found_mu;
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 1;
  std::vector<std::thread> ts;
  u64 per = (count + hw - 1) / hw;
  for (unsigned t = 0; t < hw; t++) {
    u64 lo = start + t * per, hi = std::min<u64>(start + count, lo + per);
    if (lo >= hi) break;
    ts.emplace_back([&, lo, hi] {
      for (u64 nonce = lo; nonce < hi; nonce++) {
        {
          std::lock_guard<std::mutex> g(found_mu);
          if (found <= nonce) return;  // an earlier nonce already won
        }
        Fe s[WIDTH];
        std::memcpy(s, base, sizeof(s));
        u64 p = pos;
        // absorb label tag
        if (p == RATE) { perm(s); p = 0; }
        add_mod(s[p], s[p], ab_m);
        p++;
        // absorb nonce
        if (p == RATE) { perm(s); p = 0; }
        Fe nf = {{nonce, 0, 0, 0}};
        Fe nm;
        to_mont(nm, nf);
        add_mod(s[p], s[p], nm);
        p++;
        // challenge: absorb tag, permute, read state[0]
        if (p == RATE) { perm(s); p = 0; }
        add_mod(s[p], s[p], ch_m);
        perm(s);
        Fe o;
        from_mont(o, s[0]);
        if ((o.l[0] & mask) == 0) {
          std::lock_guard<std::mutex> g(found_mu);
          if (nonce < found) found = nonce;
          return;
        }
      }
    });
  }
  for (auto& th : ts) th.join();
  return found;
}

int pfr_ready() { return 1; }

}  // extern "C"
