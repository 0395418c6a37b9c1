// Native support library for deciphon_tpu.
//
// Contents:
//   * a striped SIMD (AVX-512 16 x f32, or AVX2 8 x f32) min-plus frame-Viterbi score kernel —
//     a fresh implementation of the reference's published algorithm
//     (c-core/viterbi.c: Farrar-style striping over profile nodes with a
//     lazy delete-chain correction loop) used as the measured CPU baseline
//     for bench.py and as a host-side fallback engine;
//   * the scalar null-model DP;
//   * fletcher16 (the reference test oracle, c-core/fs.c:157-191);
//   * nucleotide encoding + fragment-code precompute (the scan host path).
//
// Exposed via a C ABI consumed through ctypes (deciphon_tpu/native).

#include <immintrin.h>

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kTable = 1364;    // fragment codes (lengths 1..5)
constexpr float kInf = 1e30f;   // big-but-finite infinity (min-plus safe)

#if defined(__AVX512F__)

using vec = __m512;
constexpr int kLanes = 16;  // AVX-512 f32 lanes
inline vec vset1(float v) { return _mm512_set1_ps(v); }
inline vec vload(const float* p) { return _mm512_load_ps(p); }
inline vec vmin(vec a, vec b) { return _mm512_min_ps(a, b); }
inline vec vadd(vec a, vec b) { return _mm512_add_ps(a, b); }

// Shift one lane up: out[e] = in[e-1], out[0] = +inf.  Used when moving
// from pack Q-1 back to pack 0 (striped node k-1 crossing a lane).
inline vec lane_shift(vec x) {
  const __m512i idx = _mm512_setr_epi32(15, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9,
                                        10, 11, 12, 13, 14);
  vec perm = _mm512_permutexvar_ps(idx, x);
  return _mm512_mask_mov_ps(perm, 0x0001, _mm512_set1_ps(kInf));
}

inline float hmin(vec x) { return _mm512_reduce_min_ps(x); }

inline bool all_leq(vec a, vec b) {  // a[e] <= b[e] for all lanes?
  return _mm512_cmp_ps_mask(a, b, _CMP_GT_OQ) == 0;
}

#else  // AVX2

using vec = __m256;
constexpr int kLanes = 8;  // AVX2 f32 lanes
inline vec vset1(float v) { return _mm256_set1_ps(v); }
inline vec vload(const float* p) { return _mm256_load_ps(p); }
inline vec vmin(vec a, vec b) { return _mm256_min_ps(a, b); }
inline vec vadd(vec a, vec b) { return _mm256_add_ps(a, b); }

// Shift one lane up: out[e] = in[e-1], out[0] = +inf.  Used when moving
// from pack Q-1 back to pack 0 (striped node k-1 crossing a lane).
inline vec lane_shift(vec x) {
  vec perm = _mm256_permutevar8x32_ps(
      x, _mm256_setr_epi32(7, 0, 1, 2, 3, 4, 5, 6));
  return _mm256_blend_ps(perm, vset1(kInf), 0x01);
}

inline float hmin(vec x) {
  __m128 lo = _mm256_castps256_ps128(x);
  __m128 hi = _mm256_extractf128_ps(x, 1);
  __m128 m = _mm_min_ps(lo, hi);
  m = _mm_min_ps(m, _mm_movehl_ps(m, m));
  m = _mm_min_ps(m, _mm_shuffle_ps(m, m, 1));
  return _mm_cvtss_f32(m);
}

inline bool all_leq(vec a, vec b) {  // a[e] <= b[e] for all lanes?
  vec gt = _mm256_cmp_ps(a, b, _CMP_GT_OQ);
  return _mm256_movemask_ps(gt) == 0;
}

#endif

struct Profile {
  int K = 0;
  int Q = 0;  // packs: ceil(K / kLanes)
  // striped vectors, Q packs each; node k -> pack k % Q, lane k / Q
  std::vector<vec> bm, mm, mi, md, im, ii, dm, dd;
  // match emission, striped: ems[code * Q + q]
  std::vector<vec> ems;
  std::vector<float> null_em, bg_em;  // (1364,)
};

// costs layout from deciphon_tpu.ops.costs: core (8, K) rows
// BM MM MI MD IM II DM DD (dest-indexed); match (1364, K); min-plus costs.
enum { CT_BM, CT_MM, CT_MI, CT_MD, CT_IM, CT_II, CT_DM, CT_DD };

void stripe(const float* src, int K, int Q, std::vector<vec>& dst) {
  dst.resize(Q);
  alignas(64) float tmp[kLanes];
  for (int q = 0; q < Q; ++q) {
    for (int e = 0; e < kLanes; ++e) {
      int k = e * Q + q;
      tmp[e] = (k < K) ? src[k] : kInf;
    }
    dst[q] = vload(tmp);
  }
}

struct Ring {
  // 5-slot ring of striped rows (M, I, D) + special scalars.
  std::vector<vec> M, I, D;  // 5 * Q
  float S[5], N[5], B[5], J[5], C[5], E[5];
  int Q = 0;

  void reset(int q, float sb) {
    Q = q;
    M.assign(5 * Q, vset1(kInf));
    I.assign(5 * Q, vset1(kInf));
    D.assign(5 * Q, vset1(kInf));
    for (int i = 0; i < 5; ++i) S[i] = N[i] = B[i] = J[i] = C[i] = E[i] = kInf;
    S[0] = 0.0f;
    B[0] = sb;
  }
};

// xt vector order (deciphon_tpu.xtrans.xtrans_cost_vector):
enum { XT_RR, XT_SN, XT_NN, XT_SB, XT_NB, XT_EB, XT_JB, XT_EJ, XT_JJ,
       XT_EC, XT_CC, XT_ET, XT_CT };

float viterbi_score(const Profile& p, const int32_t* codes, int L,
                    const float* xt) {
  const int Q = p.Q;
  Ring ring;
  ring.reset(Q, xt[XT_SB]);
  std::vector<vec> Mn(Q), In(Q), Dn(Q);
  float t_final = kInf;

  for (int l = 1; l <= L; ++l) {
    int slot = l % 5;
    // ---- core M / I over the five durations ----
    for (int q = 0; q < Q; ++q) {
      Mn[q] = vset1(kInf);
      In[q] = vset1(kInf);
    }
    float n_new = kInf, j_new = kInf, c_new = kInf;
    for (int t = 1; t <= 5; ++t) {
      if (t > l) break;
      int prev = (l - t) % 5;
      int32_t code = codes[(l - 1) * 5 + (t - 1)];
      const vec* em = &p.ems[(size_t)code * Q];
      float nil = p.null_em[code];
      float bg = p.bg_em[code];
      const vec* Mp = &ring.M[prev * Q];
      const vec* Ip = &ring.I[prev * Q];
      const vec* Dp = &ring.D[prev * Q];
      vec bprev = vset1(ring.B[prev]);
      vec bgv = vset1(bg);

      // pack -1 is lane-shifted pack Q-1 of the t-previous row
      vec mshift = lane_shift(Mp[Q - 1]);
      vec ishift = lane_shift(Ip[Q - 1]);
      vec dshift = lane_shift(Dp[Q - 1]);
      for (int q = 0; q < Q; ++q) {
        vec cand = vadd(bprev, p.bm[q]);
        cand = vmin(cand, vadd(mshift, p.mm[q]));
        cand = vmin(cand, vadd(ishift, p.im[q]));
        cand = vmin(cand, vadd(dshift, p.dm[q]));
        Mn[q] = vmin(Mn[q], vadd(cand, em[q]));
        vec icand = vmin(vadd(Ip[q], p.ii[q]), vadd(Mp[q], p.mi[q]));
        In[q] = vmin(In[q], vadd(icand, bgv));
        mshift = Mp[q];
        ishift = Ip[q];
        dshift = Dp[q];
      }

      // specials fed by older positions
      float sn = std::min(ring.S[prev] + xt[XT_SN], ring.N[prev] + xt[XT_NN]);
      n_new = std::min(n_new, sn + nil);
      float ej = std::min(ring.E[prev] + xt[XT_EJ], ring.J[prev] + xt[XT_JJ]);
      j_new = std::min(j_new, ej + nil);
      float ec = std::min(ring.E[prev] + xt[XT_EC], ring.C[prev] + xt[XT_CC]);
      c_new = std::min(c_new, ec + nil);
    }

    // ---- delete chain (same position), lazy correction ----
    vec mshift = lane_shift(Mn[Q - 1]);
    vec carry = vset1(kInf);
    for (int q = 0; q < Q; ++q) {
      vec cand = vadd(mshift, p.md[q]);
      Dn[q] = vmin(cand, vadd(carry, p.dd[q]));
      carry = Dn[q];
      mshift = Mn[q];
    }
    for (int pass = 0; pass < kLanes; ++pass) {
      carry = lane_shift(Dn[Q - 1]);
      bool done = true;
      for (int q = 0; q < Q; ++q) {
        vec cand = vadd(carry, p.dd[q]);
        if (!all_leq(Dn[q], cand)) {
          Dn[q] = vmin(Dn[q], cand);
          done = false;
        }
        carry = Dn[q];
      }
      if (done) break;
    }

    // ---- E / B / T ----
    vec emin = vset1(kInf);
    for (int q = 0; q < Q; ++q) emin = vmin(emin, vmin(Mn[q], Dn[q]));
    float e_new = hmin(emin);
    float b_new = std::min({n_new + xt[XT_NB], e_new + xt[XT_EB],
                            j_new + xt[XT_JB]});
    float t_here = std::min(e_new + xt[XT_ET], c_new + xt[XT_CT]);
    if (l == L) t_final = t_here;

    // ---- write ring slot(l) ----
    std::copy(Mn.begin(), Mn.end(), ring.M.begin() + slot * Q);
    std::copy(In.begin(), In.end(), ring.I.begin() + slot * Q);
    std::copy(Dn.begin(), Dn.end(), ring.D.begin() + slot * Q);
    ring.S[slot] = kInf;
    ring.N[slot] = n_new;
    ring.B[slot] = b_new;
    ring.J[slot] = j_new;
    ring.C[slot] = c_new;
    ring.E[slot] = e_new;
  }
  return t_final;
}

float viterbi_null_score(const Profile& p, const int32_t* codes, int L,
                         float rr) {
  float R[5];
  for (float& r : R) r = kInf;
  R[0] = -rr;
  float final_r = kInf;
  for (int l = 1; l <= L; ++l) {
    float best = kInf;
    for (int t = 1; t <= 5 && t <= l; ++t) {
      int32_t code = codes[(l - 1) * 5 + (t - 1)];
      best = std::min(best, R[(l - t) % 5] + rr + p.null_em[code]);
    }
    if (l == L) final_r = best;
    R[l % 5] = best;
  }
  return final_r;
}

}  // namespace

extern "C" {

void* dcpn_profile_new(int K, const float* core8xK, const float* match,
                       const float* null_em, const float* bg_em) {
  auto* p = new Profile;
  p->K = K;
  p->Q = std::max(1, (K + kLanes - 1) / kLanes);
  auto row = [&](int r) { return core8xK + (size_t)r * K; };
  stripe(row(CT_BM), K, p->Q, p->bm);
  stripe(row(CT_MM), K, p->Q, p->mm);
  stripe(row(CT_MI), K, p->Q, p->mi);
  stripe(row(CT_MD), K, p->Q, p->md);
  stripe(row(CT_IM), K, p->Q, p->im);
  stripe(row(CT_II), K, p->Q, p->ii);
  stripe(row(CT_DM), K, p->Q, p->dm);
  stripe(row(CT_DD), K, p->Q, p->dd);
  p->ems.resize((size_t)kTable * p->Q);
  std::vector<vec> tmp;
  for (int c = 0; c < kTable; ++c) {
    stripe(match + (size_t)c * K, K, p->Q, tmp);
    std::copy(tmp.begin(), tmp.end(), p->ems.begin() + (size_t)c * p->Q);
  }
  p->null_em.assign(null_em, null_em + kTable);
  p->bg_em.assign(bg_em, bg_em + kTable);
  // clamp +inf to the finite stand-in so min-plus arithmetic stays clean
  auto clamp = [](std::vector<vec>& v) {
    vec cap = vset1(kInf);
    for (auto& x : v) x = vmin(x, cap);
  };
  clamp(p->bm); clamp(p->mm); clamp(p->mi); clamp(p->md);
  clamp(p->im); clamp(p->ii); clamp(p->dm); clamp(p->dd); clamp(p->ems);
  for (auto& x : p->null_em) x = std::min(x, kInf);
  for (auto& x : p->bg_em) x = std::min(x, kInf);
  return p;
}

void dcpn_profile_del(void* p) { delete static_cast<Profile*>(p); }

float dcpn_viterbi(const void* p, const int32_t* codes, int L,
                   const float* xt13) {
  return viterbi_score(*static_cast<const Profile*>(p), codes, L, xt13);
}

float dcpn_viterbi_null(const void* p, const int32_t* codes, int L,
                        float rr) {
  return viterbi_null_score(*static_cast<const Profile*>(p), codes, L, rr);
}

// Multithreaded benchmark: scans `nwin` windows of length L across
// `nthreads` threads; returns seconds elapsed.
double dcpn_bench(const void* vp, const int32_t* codes, int L,
                  const float* xt13, int nwin, int nthreads) {
  const auto* p = static_cast<const Profile*>(vp);
  std::atomic<int> next{0};
  auto t0 = std::chrono::steady_clock::now();
  std::vector<std::thread> threads;
  std::atomic<uint32_t> sink{0};
  for (int i = 0; i < nthreads; ++i) {
    threads.emplace_back([&] {
      for (;;) {
        int w = next.fetch_add(1);
        if (w >= nwin) break;
        float s = viterbi_score(*p, codes, L, xt13);
        sink.fetch_add((uint32_t)s, std::memory_order_relaxed);
      }
    });
  }
  for (auto& t : threads) t.join();
  auto t1 = std::chrono::steady_clock::now();
  return std::chrono::duration<double>(t1 - t0).count();
}

uint16_t dcpn_fletcher16(const uint8_t* data, size_t n) {
  // Reference oracle semantics (c-core/fs.c:157-191): mod-255 running sums.
  uint32_t s1 = 0, s2 = 0;
  for (size_t i = 0; i < n; ++i) {
    s1 = (s1 + data[i]) % 255u;
    s2 = (s2 + s1) % 255u;
  }
  return (uint16_t)((s2 << 8) | s1);
}

// Encode an ACGT/U sequence (already disambiguated, uppercase) to symbol
// indices; returns 0 on success, -1 on an invalid character (its position
// stored in *bad_pos).
int dcpn_encode(const char* seq, int64_t n, int8_t* out, int64_t* bad_pos) {
  static int8_t table[256];
  static bool init = false;
  if (!init) {
    memset(table, -1, sizeof table);
    table[(unsigned)'A'] = 0; table[(unsigned)'C'] = 1;
    table[(unsigned)'G'] = 2; table[(unsigned)'T'] = 3;
    table[(unsigned)'U'] = 3;
    init = true;
  }
  for (int64_t i = 0; i < n; ++i) {
    int8_t v = table[(unsigned char)seq[i]];
    if (v < 0) { *bad_pos = i; return -1; }
    out[i] = v;
  }
  return 0;
}

// Fragment-code precompute: codes[l*5 + (t-1)] = code of the length-t
// fragment ending at position l+1 (deciphon_tpu.scan.sequence layout).
void dcpn_frag_codes(const int8_t* sym, int64_t L, int32_t* codes) {
  static const int32_t off[5] = {0, 4, 20, 84, 340};
  for (int64_t l = 0; l < L; ++l) {
    int32_t val = 0;
    for (int t = 1; t <= 5; ++t) {
      if (t > l + 1) { codes[l * 5 + t - 1] = 0; continue; }
      val = 0;
      for (int j = 0; j < t; ++j) val = val * 4 + sym[l - t + 1 + j];
      codes[l * 5 + t - 1] = off[t - 1] + val;
    }
  }
}

}  // extern "C"
