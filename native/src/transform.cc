// Scalar transform backend: sparse-coefficient dequant (spec 8.6.3), inverse
// DCT/DST (8.6.4), transform-skip/bypass/RDPCM paths, residual add.
// Behavior counterpart of /root/reference/libde265/transform.cc:362-642 and
// fallback-dct.cc.  The transMatrix constants are ITU-T H.265 section 8.6.4.1
// spec tables.
#include <cstring>

#include "tde265/decoder.h"
#include "tde265/syntax.h"

namespace tde265 {

// spec 8.6.4.1 transMatrix (32x32); N-point rows are sampled at stride 32/N.
static const i8 kDctMatrix[32][32] = {
    {64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64,
     64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64},
    {90, 90, 88, 85, 82, 78, 73, 67, 61, 54, 46, 38, 31, 22, 13, 4,
     -4, -13, -22, -31, -38, -46, -54, -61, -67, -73, -78, -82, -85, -88, -90, -90},
    {90, 87, 80, 70, 57, 43, 25, 9, -9, -25, -43, -57, -70, -80, -87, -90,
     -90, -87, -80, -70, -57, -43, -25, -9, 9, 25, 43, 57, 70, 80, 87, 90},
    {90, 82, 67, 46, 22, -4, -31, -54, -73, -85, -90, -88, -78, -61, -38, -13,
     13, 38, 61, 78, 88, 90, 85, 73, 54, 31, 4, -22, -46, -67, -82, -90},
    {89, 75, 50, 18, -18, -50, -75, -89, -89, -75, -50, -18, 18, 50, 75, 89,
     89, 75, 50, 18, -18, -50, -75, -89, -89, -75, -50, -18, 18, 50, 75, 89},
    {88, 67, 31, -13, -54, -82, -90, -78, -46, -4, 38, 73, 90, 85, 61, 22,
     -22, -61, -85, -90, -73, -38, 4, 46, 78, 90, 82, 54, 13, -31, -67, -88},
    {87, 57, 9, -43, -80, -90, -70, -25, 25, 70, 90, 80, 43, -9, -57, -87,
     -87, -57, -9, 43, 80, 90, 70, 25, -25, -70, -90, -80, -43, 9, 57, 87},
    {85, 46, -13, -67, -90, -73, -22, 38, 82, 88, 54, -4, -61, -90, -78, -31,
     31, 78, 90, 61, 4, -54, -88, -82, -38, 22, 73, 90, 67, 13, -46, -85},
    {83, 36, -36, -83, -83, -36, 36, 83, 83, 36, -36, -83, -83, -36, 36, 83,
     83, 36, -36, -83, -83, -36, 36, 83, 83, 36, -36, -83, -83, -36, 36, 83},
    {82, 22, -54, -90, -61, 13, 78, 85, 31, -46, -90, -67, 4, 73, 88, 38,
     -38, -88, -73, -4, 67, 90, 46, -31, -85, -78, -13, 61, 90, 54, -22, -82},
    {80, 9, -70, -87, -25, 57, 90, 43, -43, -90, -57, 25, 87, 70, -9, -80,
     -80, -9, 70, 87, 25, -57, -90, -43, 43, 90, 57, -25, -87, -70, 9, 80},
    {78, -4, -82, -73, 13, 85, 67, -22, -88, -61, 31, 90, 54, -38, -90, -46,
     46, 90, 38, -54, -90, -31, 61, 88, 22, -67, -85, -13, 73, 82, 4, -78},
    {75, -18, -89, -50, 50, 89, 18, -75, -75, 18, 89, 50, -50, -89, -18, 75,
     75, -18, -89, -50, 50, 89, 18, -75, -75, 18, 89, 50, -50, -89, -18, 75},
    {73, -31, -90, -22, 78, 67, -38, -90, -13, 82, 61, -46, -88, -4, 85, 54,
     -54, -85, 4, 88, 46, -61, -82, 13, 90, 38, -67, -78, 22, 90, 31, -73},
    {70, -43, -87, 9, 90, 25, -80, -57, 57, 80, -25, -90, -9, 87, 43, -70,
     -70, 43, 87, -9, -90, -25, 80, 57, -57, -80, 25, 90, 9, -87, -43, 70},
    {67, -54, -78, 38, 85, -22, -90, 4, 90, 13, -88, -31, 82, 46, -73, -61,
     61, 73, -46, -82, 31, 88, -13, -90, -4, 90, 22, -85, -38, 78, 54, -67},
    {64, -64, -64, 64, 64, -64, -64, 64, 64, -64, -64, 64, 64, -64, -64, 64,
     64, -64, -64, 64, 64, -64, -64, 64, 64, -64, -64, 64, 64, -64, -64, 64},
    {61, -73, -46, 82, 31, -88, -13, 90, -4, -90, 22, 85, -38, -78, 54, 67,
     -67, -54, 78, 38, -85, -22, 90, 4, -90, 13, 88, -31, -82, 46, 73, -61},
    {57, -80, -25, 90, -9, -87, 43, 70, -70, -43, 87, 9, -90, 25, 80, -57,
     -57, 80, 25, -90, 9, 87, -43, -70, 70, 43, -87, -9, 90, -25, -80, 57},
    {54, -85, -4, 88, -46, -61, 82, 13, -90, 38, 67, -78, -22, 90, -31, -73,
     73, 31, -90, 22, 78, -67, -38, 90, -13, -82, 61, 46, -88, 4, 85, -54},
    {50, -89, 18, 75, -75, -18, 89, -50, -50, 89, -18, -75, 75, 18, -89, 50,
     50, -89, 18, 75, -75, -18, 89, -50, -50, 89, -18, -75, 75, 18, -89, 50},
    {46, -90, 38, 54, -90, 31, 61, -88, 22, 67, -85, 13, 73, -82, 4, 78,
     -78, -4, 82, -73, -13, 85, -67, -22, 88, -61, -31, 90, -54, -38, 90, -46},
    {43, -90, 57, 25, -87, 70, 9, -80, 80, -9, -70, 87, -25, -57, 90, -43,
     -43, 90, -57, -25, 87, -70, -9, 80, -80, 9, 70, -87, 25, 57, -90, 43},
    {38, -88, 73, -4, -67, 90, -46, -31, 85, -78, 13, 61, -90, 54, 22, -82,
     82, -22, -54, 90, -61, -13, 78, -85, 31, 46, -90, 67, 4, -73, 88, -38},
    {36, -83, 83, -36, -36, 83, -83, 36, 36, -83, 83, -36, -36, 83, -83, 36,
     36, -83, 83, -36, -36, 83, -83, 36, 36, -83, 83, -36, -36, 83, -83, 36},
    {31, -78, 90, -61, 4, 54, -88, 82, -38, -22, 73, -90, 67, -13, -46, 85,
     -85, 46, 13, -67, 90, -73, 22, 38, -82, 88, -54, -4, 61, -90, 78, -31},
    {25, -70, 90, -80, 43, 9, -57, 87, -87, 57, -9, -43, 80, -90, 70, -25,
     -25, 70, -90, 80, -43, -9, 57, -87, 87, -57, 9, 43, -80, 90, -70, 25},
    {22, -61, 85, -90, 73, -38, -4, 46, -78, 90, -82, 54, -13, -31, 67, -88,
     88, -67, 31, 13, -54, 82, -90, 78, -46, 4, 38, -73, 90, -85, 61, -22},
    {18, -50, 75, -89, 89, -75, 50, -18, -18, 50, -75, 89, -89, 75, -50, 18,
     18, -50, 75, -89, 89, -75, 50, -18, -18, 50, -75, 89, -89, 75, -50, 18},
    {13, -38, 61, -78, 88, -90, 85, -73, 54, -31, 4, 22, -46, 67, -82, 90,
     -90, 82, -67, 46, -22, -4, 31, -54, 73, -85, 90, -88, 78, -61, 38, -13},
    {9, -25, 43, -57, 70, -80, 87, -90, 90, -87, 80, -70, 57, -43, 25, -9,
     -9, 25, -43, 57, -70, 80, -87, 90, -90, 87, -80, 70, -57, 43, -25, 9},
    {4, -13, 22, -31, 38, -46, 54, -61, 67, -73, 78, -82, 85, -88, 90, -90,
     90, -90, 88, -85, 82, -78, 73, -67, 61, -54, 46, -38, 31, -22, 13, -4}};

// spec 8.6.4.1 4x4 DST-VII matrix.
static const i8 kDstMatrix[4][4] = {{29, 55, 74, 84},
                                    {74, 74, 0, -74},
                                    {84, -29, -74, 55},
                                    {55, -84, 74, -29}};

static const int kLevelScale[6] = {40, 45, 51, 57, 64, 72};

namespace detail {
// matrix accessor for the forward-transform path (encoder.cc)
const i8 (*dct_matrix_32())[32] { return kDctMatrix; }
}  // namespace detail

// Partial-butterfly 1D inverse DCT (raw sums, no shift): exploits the
// even/odd symmetry of the DCT-II rows — dst[i] = E[i] + O[i],
// dst[N-1-i] = E[i] - O[i] — where the even half recurses onto the N/2
// transform (the HEVC matrices nest: row 2k of the size-N matrix is row k
// of the size-N/2 matrix).  Halves the multiply count per stage.
// `lim` bounds the number of leading (low-frequency) coefficients that can
// be nonzero — entries src[j], j >= lim are known zero, so their multiplies
// are skipped (high-frequency truncation is the common case at typical QPs).
template <int N>
static inline void idct_1d_raw(i32* dst, const i32* src, int lim) {
  if constexpr (N == 4) {
    i32 e0 = 64 * (src[0] + src[2]);
    i32 e1 = 64 * (src[0] - src[2]);
    i32 o0 = 83 * src[1] + 36 * src[3];
    i32 o1 = 36 * src[1] - 83 * src[3];
    dst[0] = e0 + o0;
    dst[1] = e1 + o1;
    dst[2] = e1 - o1;
    dst[3] = e0 - o0;
  } else {
    constexpr int H = N / 2;
    constexpr int fact = 32 / N;
    const int hl = min_i(H, (lim + 1) >> 1);
    i32 ev[H], E[H], O[H];
    for (int k = 0; k < H; k++) ev[k] = src[2 * k];
    idct_1d_raw<H>(E, ev, hl);
    for (int i = 0; i < H; i++) {
      i32 sum = 0;
      for (int k = 0; k < hl; k++)
        sum += kDctMatrix[fact * (2 * k + 1)][i] * src[2 * k + 1];
      O[i] = sum;
    }
    for (int i = 0; i < H; i++) {
      dst[i] = E[i] + O[i];
      dst[N - 1 - i] = E[i] - O[i];
    }
  }
}

#if defined(__AVX2__)
#include <immintrin.h>

// Vector IDCT 4x4 / 8x8 for the 8/10-bit path (counterpart of the
// reference's sse-dct.cc): stage butterflies run across all columns at
// once in 32-bit lanes, with an in-register transpose between stages.

static inline void idct4_avx2(i32* dst, const i16* coeffs, int bd_shift) {
  const __m128i rnd1 = _mm_set1_epi32(64);
  const __m128i rnd2 = _mm_set1_epi32(1 << (bd_shift - 1));
  const __m128i lo = _mm_set1_epi32(-32768), hi = _mm_set1_epi32(32767);
  __m128i r[4];
  for (int j = 0; j < 4; j++)
    r[j] = _mm_cvtepi16_epi32(_mm_loadl_epi64(
        (const __m128i*)(coeffs + 4 * j)));

  auto bf = [&](__m128i v0, __m128i v1, __m128i v2, __m128i v3,
                __m128i* o) {
    __m128i e0 = _mm_slli_epi32(_mm_add_epi32(v0, v2), 6);
    __m128i e1 = _mm_slli_epi32(_mm_sub_epi32(v0, v2), 6);
    __m128i o0 = _mm_add_epi32(_mm_mullo_epi32(v1, _mm_set1_epi32(83)),
                               _mm_mullo_epi32(v3, _mm_set1_epi32(36)));
    __m128i o1 = _mm_sub_epi32(_mm_mullo_epi32(v1, _mm_set1_epi32(36)),
                               _mm_mullo_epi32(v3, _mm_set1_epi32(83)));
    o[0] = _mm_add_epi32(e0, o0);
    o[1] = _mm_add_epi32(e1, o1);
    o[2] = _mm_sub_epi32(e1, o1);
    o[3] = _mm_sub_epi32(e0, o0);
  };

  __m128i g[4];
  bf(r[0], r[1], r[2], r[3], g);
  for (int i = 0; i < 4; i++) {
    g[i] = _mm_srai_epi32(_mm_add_epi32(g[i], rnd1), 7);
    g[i] = _mm_min_epi32(_mm_max_epi32(g[i], lo), hi);
  }
  // transpose 4x4 (i32)
  __m128i t0 = _mm_unpacklo_epi32(g[0], g[1]);
  __m128i t1 = _mm_unpacklo_epi32(g[2], g[3]);
  __m128i t2 = _mm_unpackhi_epi32(g[0], g[1]);
  __m128i t3 = _mm_unpackhi_epi32(g[2], g[3]);
  __m128i c0 = _mm_unpacklo_epi64(t0, t1);
  __m128i c1 = _mm_unpackhi_epi64(t0, t1);
  __m128i c2 = _mm_unpacklo_epi64(t2, t3);
  __m128i c3 = _mm_unpackhi_epi64(t2, t3);
  __m128i o[4];
  bf(c0, c1, c2, c3, o);
  for (int i = 0; i < 4; i++)
    o[i] = _mm_srai_epi32(_mm_add_epi32(o[i], rnd2), bd_shift);
  // lanes are y; transpose back to row-major dst[y][i]
  __m128i s0 = _mm_unpacklo_epi32(o[0], o[1]);
  __m128i s1 = _mm_unpacklo_epi32(o[2], o[3]);
  __m128i s2 = _mm_unpackhi_epi32(o[0], o[1]);
  __m128i s3 = _mm_unpackhi_epi32(o[2], o[3]);
  _mm_storeu_si128((__m128i*)(dst + 0), _mm_unpacklo_epi64(s0, s1));
  _mm_storeu_si128((__m128i*)(dst + 4), _mm_unpackhi_epi64(s0, s1));
  _mm_storeu_si128((__m128i*)(dst + 8), _mm_unpacklo_epi64(s2, s3));
  _mm_storeu_si128((__m128i*)(dst + 12), _mm_unpackhi_epi64(s2, s3));
}

static inline void transpose8_avx2(__m256i v[8]) {
  __m256i t[8], u[8];
  for (int i = 0; i < 4; i++) {
    t[2 * i] = _mm256_unpacklo_epi32(v[2 * i], v[2 * i + 1]);
    t[2 * i + 1] = _mm256_unpackhi_epi32(v[2 * i], v[2 * i + 1]);
  }
  u[0] = _mm256_unpacklo_epi64(t[0], t[2]);
  u[1] = _mm256_unpackhi_epi64(t[0], t[2]);
  u[2] = _mm256_unpacklo_epi64(t[1], t[3]);
  u[3] = _mm256_unpackhi_epi64(t[1], t[3]);
  u[4] = _mm256_unpacklo_epi64(t[4], t[6]);
  u[5] = _mm256_unpackhi_epi64(t[4], t[6]);
  u[6] = _mm256_unpacklo_epi64(t[5], t[7]);
  u[7] = _mm256_unpackhi_epi64(t[5], t[7]);
  for (int i = 0; i < 4; i++) {
    v[i] = _mm256_permute2x128_si256(u[i], u[i + 4], 0x20);
    v[i + 4] = _mm256_permute2x128_si256(u[i], u[i + 4], 0x31);
  }
}

static inline void idct8_bf_avx2(const __m256i r[8], __m256i out[8]) {
  // even half: idct4 on rows 0,2,4,6
  __m256i e0 = _mm256_slli_epi32(_mm256_add_epi32(r[0], r[4]), 6);
  __m256i e1 = _mm256_slli_epi32(_mm256_sub_epi32(r[0], r[4]), 6);
  __m256i eo0 = _mm256_add_epi32(
      _mm256_mullo_epi32(r[2], _mm256_set1_epi32(83)),
      _mm256_mullo_epi32(r[6], _mm256_set1_epi32(36)));
  __m256i eo1 = _mm256_sub_epi32(
      _mm256_mullo_epi32(r[2], _mm256_set1_epi32(36)),
      _mm256_mullo_epi32(r[6], _mm256_set1_epi32(83)));
  __m256i E[4] = {_mm256_add_epi32(e0, eo0), _mm256_add_epi32(e1, eo1),
                  _mm256_sub_epi32(e1, eo1), _mm256_sub_epi32(e0, eo0)};
  // odd half: rows 1,3,5,7 x the odd 8-point basis
  static const int kO[4][4] = {{89, 75, 50, 18},
                               {75, -18, -89, -50},
                               {50, -89, 18, 75},
                               {18, -50, 75, -89}};
  __m256i O[4];
  for (int i = 0; i < 4; i++) {
    __m256i sum = _mm256_mullo_epi32(r[1], _mm256_set1_epi32(kO[i][0]));
    sum = _mm256_add_epi32(sum, _mm256_mullo_epi32(
        r[3], _mm256_set1_epi32(kO[i][1])));
    sum = _mm256_add_epi32(sum, _mm256_mullo_epi32(
        r[5], _mm256_set1_epi32(kO[i][2])));
    sum = _mm256_add_epi32(sum, _mm256_mullo_epi32(
        r[7], _mm256_set1_epi32(kO[i][3])));
    O[i] = sum;
  }
  for (int i = 0; i < 4; i++) {
    out[i] = _mm256_add_epi32(E[i], O[i]);
    out[7 - i] = _mm256_sub_epi32(E[i], O[i]);
  }
}

static inline void idct8_avx2(i32* dst, const i16* coeffs, int bd_shift) {
  const __m256i rnd1 = _mm256_set1_epi32(64);
  const __m256i rnd2 = _mm256_set1_epi32(1 << (bd_shift - 1));
  const __m256i lo = _mm256_set1_epi32(-32768);
  const __m256i hi = _mm256_set1_epi32(32767);
  __m256i r[8];
  for (int j = 0; j < 8; j++)
    r[j] = _mm256_cvtepi16_epi32(
        _mm_loadu_si128((const __m128i*)(coeffs + 8 * j)));
  __m256i g[8];
  idct8_bf_avx2(r, g);
  for (int i = 0; i < 8; i++) {
    g[i] = _mm256_srai_epi32(_mm256_add_epi32(g[i], rnd1), 7);
    g[i] = _mm256_min_epi32(_mm256_max_epi32(g[i], lo), hi);
  }
  transpose8_avx2(g);
  __m256i o[8];
  idct8_bf_avx2(g, o);
  for (int i = 0; i < 8; i++)
    o[i] = _mm256_srai_epi32(_mm256_add_epi32(o[i], rnd2), bd_shift);
  transpose8_avx2(o);  // lanes are y; back to row-major
  for (int y = 0; y < 8; y++)
    _mm256_storeu_si256((__m256i*)(dst + 8 * y), o[y]);
}

// ---- 16x16 / 32x32: the partial butterfly runs on vectors of 8 adjacent
// columns (32-bit lanes).  Keeps the scalar path's transposed intermediate
// layout via one 8x8 in-register transpose per output block, and honors
// the same row_lim/col_lim high-frequency truncation. ----
template <int N>
static inline void idct_1d_cols8(__m256i* dst, const __m256i* src, int lim) {
  if constexpr (N == 4) {
    const __m256i c64 = _mm256_set1_epi32(64);
    const __m256i c83 = _mm256_set1_epi32(83);
    const __m256i c36 = _mm256_set1_epi32(36);
    __m256i e0 = _mm256_mullo_epi32(c64, _mm256_add_epi32(src[0], src[2]));
    __m256i e1 = _mm256_mullo_epi32(c64, _mm256_sub_epi32(src[0], src[2]));
    __m256i o0 = _mm256_add_epi32(_mm256_mullo_epi32(c83, src[1]),
                                  _mm256_mullo_epi32(c36, src[3]));
    __m256i o1 = _mm256_sub_epi32(_mm256_mullo_epi32(c36, src[1]),
                                  _mm256_mullo_epi32(c83, src[3]));
    dst[0] = _mm256_add_epi32(e0, o0);
    dst[1] = _mm256_add_epi32(e1, o1);
    dst[2] = _mm256_sub_epi32(e1, o1);
    dst[3] = _mm256_sub_epi32(e0, o0);
  } else {
    constexpr int H = N / 2;
    constexpr int fact = 32 / N;
    const int hl = min_i(H, (lim + 1) >> 1);
    __m256i ev[H], E[H];
    for (int k = 0; k < H; k++) ev[k] = src[2 * k];
    idct_1d_cols8<H>(E, ev, hl);
    for (int i = 0; i < H; i++) {
      __m256i sum = _mm256_setzero_si256();
      for (int k = 0; k < hl; k++)
        sum = _mm256_add_epi32(
            sum, _mm256_mullo_epi32(
                     _mm256_set1_epi32(kDctMatrix[fact * (2 * k + 1)][i]),
                     src[2 * k + 1]));
      dst[i] = _mm256_add_epi32(E[i], sum);
      dst[N - 1 - i] = _mm256_sub_epi32(E[i], sum);
    }
  }
}

template <int N>
static void idct_2d_cols8(i32* dst, const i16* coeffs, int bd_shift,
                          int row_lim, int col_lim) {
  const __m256i rnd1 = _mm256_set1_epi32(64);
  const __m256i rnd2 = _mm256_set1_epi32(1 << (bd_shift - 1));
  const __m256i lo = _mm256_set1_epi32(-32768);
  const __m256i hi = _mm256_set1_epi32(32767);
  const __m256i zero = _mm256_setzero_si256();
  alignas(32) i32 g[N * N];  // transposed intermediate, as in the scalar path

  for (int c0 = 0; c0 < N; c0 += 8) {
    __m256i src[N], raw[N];
    for (int j = 0; j < row_lim; j++)
      src[j] = _mm256_cvtepi16_epi32(
          _mm_loadu_si128((const __m128i*)(coeffs + (size_t)j * N + c0)));
    for (int j = row_lim; j < N; j++) src[j] = zero;
    idct_1d_cols8<N>(raw, src, row_lim);
    for (int i = 0; i < N; i++) {
      raw[i] = _mm256_srai_epi32(_mm256_add_epi32(raw[i], rnd1), 7);
      raw[i] = _mm256_min_epi32(_mm256_max_epi32(raw[i], lo), hi);
    }
    for (int ib = 0; ib < N; ib += 8) {
      __m256i blk[8];
      for (int r = 0; r < 8; r++) blk[r] = raw[ib + r];
      transpose8_avx2(blk);  // lane = output index; row = column c0+k
      for (int k = 0; k < 8; k++)
        _mm256_storeu_si256((__m256i*)(g + (size_t)(c0 + k) * N + ib),
                            blk[k]);
    }
  }
  for (int y0 = 0; y0 < N; y0 += 8) {
    __m256i src[N], raw[N];
    for (int j = 0; j < col_lim; j++)
      src[j] = _mm256_loadu_si256(
          (const __m256i*)(g + (size_t)j * N + y0));
    for (int j = col_lim; j < N; j++) src[j] = zero;
    idct_1d_cols8<N>(raw, src, col_lim);
    for (int i = 0; i < N; i++)
      raw[i] = _mm256_srai_epi32(_mm256_add_epi32(raw[i], rnd2), bd_shift);
    for (int ib = 0; ib < N; ib += 8) {
      __m256i blk[8];
      for (int r = 0; r < 8; r++) blk[r] = raw[ib + r];
      transpose8_avx2(blk);  // lane = output index; row = y0+k
      for (int k = 0; k < 8; k++)
        _mm256_storeu_si256((__m256i*)(dst + (size_t)(y0 + k) * N + ib),
                            blk[k]);
    }
  }
}
#endif  // __AVX2__

template <int N>
static void idct_2d_t(i32* dst, const i16* coeffs, int bd_shift, int row_lim,
                      int col_lim) {
  const int rnd1 = 1 << 6;
  const int rnd2 = 1 << (bd_shift - 1);
  i32 g[N * N];  // stage-1 output, transposed (row y = transformed column y)

  for (int c = 0; c < N; c++) {
    // all-zero coefficient columns (common beyond the last sig position)
    // transform to zero rows
    i32 src[N];
    i32 any = 0;
    for (int j = 0; j < row_lim; j++) any |= (src[j] = coeffs[c + j * N]);
    for (int j = row_lim; j < N; j++) src[j] = 0;
    i32* out = g + c * N;
    if (!any) {
      for (int i = 0; i < N; i++) out[i] = 0;
      continue;
    }
    i32 raw[N];
    idct_1d_raw<N>(raw, src, row_lim);
    for (int i = 0; i < N; i++)
      out[i] = clip3(-32768, 32767, (raw[i] + rnd1) >> 7);
  }
  for (int y = 0; y < N; y++) {
    i32 src[N];
    i32 any = 0;
    for (int j = 0; j < col_lim; j++) any |= (src[j] = g[j * N + y]);
    for (int j = col_lim; j < N; j++) src[j] = 0;
    i32* out = dst + y * N;
    if (!any) {
      for (int i = 0; i < N; i++) out[i] = 0;
      continue;
    }
    i32 raw[N];
    idct_1d_raw<N>(raw, src, col_lim);
    for (int i = 0; i < N; i++) out[i] = (raw[i] + rnd2) >> bd_shift;
  }
}

void idct_2d_ext(i32* dst, const i16* coeffs, int nT, int bd_shift,
                 int row_lim, int col_lim);

void idct_2d(i32* dst, const i16* coeffs, int nT, int bd_shift) {
  idct_2d_ext(dst, coeffs, nT, bd_shift, nT, nT);
}

// row_lim/col_lim bound the nonzero coefficient extent (rows >= row_lim and
// columns >= col_lim of the TU are known zero); callers that scatter sparse
// coefficients know these for free.
void idct_2d_ext(i32* dst, const i16* coeffs, int nT, int bd_shift,
                 int row_lim, int col_lim) {
  // DC-only fast path (very common at moderate/high QP): both stages reduce
  // to a flat value.
  {
    int last = nT * nT - 1;
    while (last > 0 && coeffs[last] == 0) last--;
    if (last == 0) {
      i32 v = 0;
      if (coeffs[0]) {
        i32 gdc = clip3(-32768, 32767, (64 * coeffs[0] + (1 << 6)) >> 7);
        v = (64 * gdc + (1 << (bd_shift - 1))) >> bd_shift;
      }
      for (int i = 0; i < nT * nT; i++) dst[i] = v;
      return;
    }
  }

  switch (nT) {
    case 4:
#if defined(__AVX2__)
      idct4_avx2(dst, coeffs, bd_shift);
      break;
#else
      idct_2d_t<4>(dst, coeffs, bd_shift, row_lim, col_lim);
      break;
#endif
    case 8:
#if defined(__AVX2__)
      idct8_avx2(dst, coeffs, bd_shift);
      break;
#else
      idct_2d_t<8>(dst, coeffs, bd_shift, row_lim, col_lim);
      break;
#endif
    case 16:
#if defined(__AVX2__)
      idct_2d_cols8<16>(dst, coeffs, bd_shift, row_lim, col_lim);
#else
      idct_2d_t<16>(dst, coeffs, bd_shift, row_lim, col_lim);
#endif
      break;
    default:
#if defined(__AVX2__)
      idct_2d_cols8<32>(dst, coeffs, bd_shift, row_lim, col_lim);
#else
      idct_2d_t<32>(dst, coeffs, bd_shift, row_lim, col_lim);
#endif
      break;
  }
}

void idst_4x4(i32* dst, const i16* coeffs, int bd_shift) {
  int rnd1 = 1 << 6;
  int rnd2 = 1 << (bd_shift - 1);
  i32 g[16];
  for (int c = 0; c < 4; c++) {
    for (int i = 0; i < 4; i++) {
      int sum = 0;
      for (int j = 0; j < 4; j++) sum += kDstMatrix[j][i] * coeffs[c + j * 4];
      g[c + i * 4] = clip3(-32768, 32767, (sum + rnd1) >> 7);
    }
  }
  for (int y = 0; y < 4; y++) {
    for (int i = 0; i < 4; i++) {
      int sum = 0;
      for (int j = 0; j < 4; j++) sum += kDstMatrix[j][i] * g[y * 4 + j];
      dst[y * 4 + i] = (sum + rnd2) >> bd_shift;
    }
  }
}

// Expand a coded (diagonal-scan) scaling list into a full-resolution matrix.
// size_id: 0->4x4, 1->8x8, 2->16x16, 3->32x32 (subsampled 8x8 + DC).
static void expand_scaling_list(const u8* coded, int size_id, u8 dc, u8* out) {
  if (size_id == 0) {
    const ScanPos* scan = scan_order(2, 0);
    for (int i = 0; i < 16; i++) out[scan[i].x + 4 * scan[i].y] = coded[i];
  } else {
    const ScanPos* scan = scan_order(3, 0);
    int sub = (size_id == 1) ? 1 : (size_id == 2) ? 2 : 4;
    int w = 8 * sub;
    for (int i = 0; i < 64; i++)
      for (int dy = 0; dy < sub; dy++)
        for (int dx = 0; dx < sub; dx++)
          out[(scan[i].x * sub + dx) + w * (scan[i].y * sub + dy)] = coded[i];
    if (size_id >= 2) out[0] = dc;
  }
}

// Full-resolution scaling factors for (size_id, matrix_id); cached per call
// site via ScalingFactorCache.
struct ScalingFactorCache {
  const ScalingLists* src = nullptr;
  u8 m4[6][16], m8[6][64], m16[6][256], m32[6][1024];

  void build(const ScalingLists& lists) {
    if (src == &lists) return;
    src = &lists;
    for (int m = 0; m < 6; m++) {
      expand_scaling_list(lists.list4x4[m], 0, 16, m4[m]);
      expand_scaling_list(lists.list8x8[m], 1, 16, m8[m]);
      expand_scaling_list(lists.list16x16[m], 2, lists.dc16x16[m], m16[m]);
      expand_scaling_list(lists.list32x32[m], 3, lists.dc32x32[m], m32[m]);
    }
  }
  const u8* get(int nT, int matrix_id) const {
    switch (nT) {
      case 4: return m4[matrix_id];
      case 8: return m8[matrix_id];
      case 16: return m16[matrix_id];
      default: return m32[matrix_id];
    }
  }
};

// One cache per thread: decoder contexts may run on concurrent threads
// (the de265.h thread-safety contract is one context per thread).
static thread_local ScalingFactorCache g_sf_cache;

// Expand all scaling lists to full resolution into one 8160-byte buffer
// (6x16 | 6x64 | 6x256 | 6x1024) for the FrameProgram snapshot export.
void expand_all_scaling_lists(const ScalingLists& lists, u8* out) {
  for (int m = 0; m < 6; m++, out += 16)
    expand_scaling_list(lists.list4x4[m], 0, 16, out);
  for (int m = 0; m < 6; m++, out += 64)
    expand_scaling_list(lists.list8x8[m], 1, 16, out);
  for (int m = 0; m < 6; m++, out += 256)
    expand_scaling_list(lists.list16x16[m], 2, lists.dc16x16[m], out);
  for (int m = 0; m < 6; m++, out += 1024)
    expand_scaling_list(lists.list32x32[m], 3, lists.dc32x32[m], out);
}

template <typename pixel_t>
static void add_residual_t(pixel_t* dst, int stride, const i32* residual,
                           int nT, int bd) {
  for (int y = 0; y < nT; y++)
    for (int x = 0; x < nT; x++)
      dst[y * stride + x] =
          (pixel_t)clip_bd(dst[y * stride + x] + residual[y * nT + x], bd);
}

#if defined(__AVX2__)
// 8-bit specialization: 8 pixels per step, widen u8->i32, add, and the
// packs/packus pair IS the clip to [0,255].  nT=4 folds two rows into one
// step (the residual rows are contiguous).
template <>
void add_residual_t<u8>(u8* dst, int stride, const i32* residual, int nT,
                        int bd) {
  if (bd != 8) {  // unusual: 8-bit frame buffer with bd<8 declared
    for (int y = 0; y < nT; y++)
      for (int x = 0; x < nT; x++)
        dst[y * stride + x] =
            (u8)clip_bd(dst[y * stride + x] + residual[y * nT + x], bd);
    return;
  }
  if (nT == 4) {
    for (int y = 0; y < 4; y += 2) {
      __m256i r = _mm256_loadu_si256((const __m256i*)(residual + y * 4));
      u32 p0, p1;
      memcpy(&p0, dst + y * stride, 4);
      memcpy(&p1, dst + (y + 1) * stride, 4);
      __m128i p8 = _mm_insert_epi32(_mm_cvtsi32_si128((int)p0), (int)p1, 1);
      __m256i s = _mm256_add_epi32(_mm256_cvtepu8_epi32(p8), r);
      __m128i w = _mm_packs_epi32(_mm256_castsi256_si128(s),
                                  _mm256_extracti128_si256(s, 1));
      __m128i b = _mm_packus_epi16(w, w);
      u32 q0 = (u32)_mm_cvtsi128_si32(b);
      u32 q1 = (u32)_mm_extract_epi32(b, 1);
      memcpy(dst + y * stride, &q0, 4);
      memcpy(dst + (y + 1) * stride, &q1, 4);
    }
    return;
  }
  for (int y = 0; y < nT; y++) {
    const i32* rr = residual + y * nT;
    u8* dd = dst + y * stride;
    for (int x = 0; x < nT; x += 8) {
      __m256i r = _mm256_loadu_si256((const __m256i*)(rr + x));
      __m128i p8 = _mm_loadl_epi64((const __m128i*)(dd + x));
      __m256i s = _mm256_add_epi32(_mm256_cvtepu8_epi32(p8), r);
      __m128i w = _mm_packs_epi32(_mm256_castsi256_si128(s),
                                  _mm256_extracti128_si256(s, 1));
      __m128i b = _mm_packus_epi16(w, w);
      _mm_storel_epi64((__m128i*)(dd + x), b);
    }
  }
}
#endif

void execute_tu_scalar(const FrameProgram& prog, const TuRec& tu,
                       i32* luma_residual_cache) {
  Frame& frame = *prog.frame;
  const Sps& sps = *frame.sps;
  const Pps& pps = *frame.pps;
  int nT = 1 << tu.log2_size;
  int cidx = tu.cidx;
  int bd = frame.bit_depth[cidx];

  // scatter sparse coefficients, tracking the nonzero extent for the IDCT
  i16 coeff[32 * 32];
  memset(coeff, 0, sizeof(i16) * nT * nT);
  int max_xc = 0, max_yc = 0;
  for (int i = 0; i < tu.ncoeff; i++) {
    u16 pos = prog.coeff_pos[tu.coeff_start + i];
    int xc = pos & 63, yc = pos >> 6;
    max_xc = max_i(max_xc, xc);
    max_yc = max_i(max_yc, yc);
    coeff[yc * nT + xc] = prog.coeff_val[tu.coeff_start + i];
  }

  bool intra = (tu.flags & TuRec::kIntra) != 0;
  bool rotate = sps.transform_skip_rotation_enabled && nT == 4 && intra;
  auto rotate_coeffs = [&]() {
    for (int i = 0; i < nT * nT / 2; i++)
      std::swap(coeff[i], coeff[nT * nT - 1 - i]);
  };

  i32 residual[32 * 32];

  if (tu.flags & TuRec::kTransquantBypass) {
    if (rotate) rotate_coeffs();
    if (tu.flags & TuRec::kRdpcm) {
      bool vertical = (tu.flags & TuRec::kRdpcmVertical) != 0;
      if (vertical) {
        for (int x = 0; x < nT; x++) {
          i32 sum = 0;
          for (int y = 0; y < nT; y++) {
            sum += coeff[y * nT + x];
            residual[y * nT + x] = sum;
          }
        }
      } else {
        for (int y = 0; y < nT; y++) {
          i32 sum = 0;
          for (int x = 0; x < nT; x++) {
            sum += coeff[y * nT + x];
            residual[y * nT + x] = sum;
          }
        }
      }
    } else {
      for (int i = 0; i < nT * nT; i++) residual[i] = coeff[i];
    }
  } else {
    // --- dequant (spec 8.6.3) ---
    int qp = clip3(0, 63 + 12, tu.qp);  // defensive: corrupt streams
    int bd_shift = bd + tu.log2_size - 5;
    if (!sps.scaling_list_enabled) {
      bd_shift -= 4;  // flat scaling factor 16 folded into the shift
      int offset = 1 << (bd_shift - 1);
      i64 fact = (i64)kLevelScale[qp % 6] << (qp / 6);
      for (int i = 0; i < tu.ncoeff; i++) {
        u16 pos = prog.coeff_pos[tu.coeff_start + i];
        int xc = pos & 63, yc = pos >> 6;
        i64 v = prog.coeff_val[tu.coeff_start + i];
        coeff[yc * nT + xc] = (i16)clip3(-32768, 32767,
                                         (int)((v * fact + offset) >> bd_shift));
      }
    } else {
      const ScalingLists& lists =
          pps.pps_scaling_list_data_present ? pps.scaling_lists : sps.scaling_lists;
      g_sf_cache.build(lists);
      int matrix_id = cidx;
      if (nT == 32) matrix_id = 0;
      if (!intra) matrix_id += (nT < 32) ? 3 : 1;
      const u8* sf = g_sf_cache.get(nT, matrix_id);
      int offset = 1 << (bd_shift - 1);
      for (int i = 0; i < tu.ncoeff; i++) {
        u16 pos = prog.coeff_pos[tu.coeff_start + i];
        int xc = pos & 63, yc = pos >> 6;
        i64 fact = (i64)sf[yc * nT + xc] * kLevelScale[qp % 6] << (qp / 6);
        i64 v = prog.coeff_val[tu.coeff_start + i];
        coeff[yc * nT + xc] = (i16)clip3(-32768, 32767,
                                         (int)((v * fact + offset) >> bd_shift));
      }
    }

    // --- inverse transform / skip ---
    if (tu.flags & TuRec::kTransformSkip) {
      int bd_shift2 = max_i(20 - bd, 0);
      int ts_shift = 5 + tu.log2_size;
      if (rotate) rotate_coeffs();
      int rnd = 1 << (bd_shift2 - 1);
      if (tu.flags & TuRec::kRdpcm) {
        bool vertical = (tu.flags & TuRec::kRdpcmVertical) != 0;
        if (vertical) {
          for (int x = 0; x < nT; x++) {
            i32 sum = 0;
            for (int y = 0; y < nT; y++) {
              i32 c = (i32)((u32)coeff[y * nT + x] << ts_shift);
              sum += (c + rnd) >> bd_shift2;
              residual[y * nT + x] = sum;
            }
          }
        } else {
          for (int y = 0; y < nT; y++) {
            i32 sum = 0;
            for (int x = 0; x < nT; x++) {
              i32 c = (i32)((u32)coeff[y * nT + x] << ts_shift);
              sum += (c + rnd) >> bd_shift2;
              residual[y * nT + x] = sum;
            }
          }
        }
      } else {
        for (int i = 0; i < nT * nT; i++) {
          i32 c = (i32)((u32)coeff[i] << ts_shift);
          residual[i] = (c + rnd) >> bd_shift2;
        }
      }
    } else if (tu.flags & TuRec::kUseDst) {
      idst_4x4(residual, coeff, 20 - bd);
    } else {
      idct_2d_ext(residual, coeff, nT, 20 - bd, min_i(max_yc, nT - 1) + 1,
                  min_i(max_xc, nT - 1) + 1);
    }
  }

  // RExt cross-component prediction (spec 8.6.6; reference
  // transform.cc:244-260): chroma residual += (ResScaleVal *
  // ((luma_residual << BitDepthC) >> BitDepthY)) >> 3.  The luma residual of
  // the enclosing TU is cached by the executor loop (4:4:4 only, so the luma
  // and chroma TBs have identical geometry).
  if (luma_residual_cache) {
    if (cidx == 0) {
      memcpy(luma_residual_cache, residual, sizeof(i32) * nT * nT);
    } else if (tu.cross_comp_scale != 0) {
      // r += (ResScaleVal * ((rY << BitDepthC) >> BitDepthY)) >> 3
      // (spec 8.6.6).  NOTE: we replicate the reference's exact integer
      // behavior (transform.cc:244-260 there): the luma term is computed
      // with uint32 LOGICAL shifts, so a negative rY yields rY mod 2^24
      // (equal bit depths) rather than rY — the product then wraps in
      // int32.  Spec-arithmetic shifts would preserve the sign; we match
      // the reference bit-for-bit since it is the conformance oracle.
      int bd_y = frame.bit_depth[0];
      for (int i = 0; i < nT * nT; i++) {
        i32 t = (i32)(((u32)luma_residual_cache[i] << bd) >> bd_y);
        residual[i] += (i32)((u32)tu.cross_comp_scale * (u32)t) >> 3;
      }
    }
  }

  if (frame.bytes_pp == 1) {
    add_residual_t(frame.px8(cidx, tu.x, tu.y), frame.stride[cidx], residual,
                   nT, bd);
  } else {
    add_residual_t(frame.px16(cidx, tu.x, tu.y), frame.stride[cidx], residual,
                   nT, bd);
  }
}

}  // namespace tde265
