// Scalar reconstruction backend: executes a FrameProgram op-by-op.
// Motion compensation follows spec 8.5.4.2.2 (8-tap qpel luma / 4-tap epel
// chroma) and 8.5.4.2.3 (default + explicit weighted sample prediction).
// Behavior counterpart of /root/reference/libde265/motion.cc:49-282 +
// fallback-motion.cc.
#include <cstring>

#include "tde265/decoder.h"
#include "tde265/perf.h"
#include "tde265/syntax.h"

namespace tde265 {

void execute_tu_scalar(const FrameProgram& prog, const TuRec& tu,
                       i32* luma_residual_cache = nullptr);  // transform.cc
void execute_intra_scalar(const FrameProgram& prog, const IntraRec& r);  // intra.cc

// ---------------------------------------------------------------------------
// interpolation filters (spec Tables 8-11 / 8-12)
// ---------------------------------------------------------------------------
static constexpr int kQpelFilter[4][8] = {
    {0, 0, 0, 64, 0, 0, 0, 0},
    {-1, 4, -10, 58, 17, -5, 1, 0},
    {-1, 4, -11, 40, 40, -11, 4, -1},
    {0, 1, -5, 17, 58, -10, 4, -1}};
static constexpr int kEpelFilter[8][4] = {
    {0, 64, 0, 0},   {-2, 58, 10, -2}, {-4, 54, 16, -2}, {-6, 46, 28, -4},
    {-4, 36, 36, -4}, {-4, 28, 46, -6}, {-2, 16, 54, -4}, {-2, 10, 58, -2}};

// Clamped picture fetch (edge replication).
template <typename pixel_t>
static inline int pic_at(const pixel_t* img, int stride, int w, int h, int x,
                         int y) {
  x = clip3(0, w - 1, x);
  y = clip3(0, h - 1, y);
  return img[(size_t)y * stride + x];
}

// Gather a (w+taps-1)x(h+taps-1) edge-clamped reference window; interior
// rows are straight memcpy, so the filter loops below run clamp-free.
template <typename pixel_t, int kTaps>
static inline void gather_window(const pixel_t* img, int stride, int pw,
                                 int ph, int x_int, int y_int, int w, int h,
                                 pixel_t* win, int win_stride) {
  const int center = kTaps / 2 - 1;
  const int ww = w + kTaps - 1, wh = h + kTaps - 1;
  const int x0 = x_int - center;
  // split each row into left-replicated / copied / right-replicated segments
  const int n_left = clip3(0, ww, -x0);
  const int n_mid = clip3(0, ww - n_left, pw - max_i(x0, 0));
  const int n_right = ww - n_left - n_mid;
  for (int y = 0; y < wh; y++) {
    int sy = clip3(0, ph - 1, y_int - center + y);
    const pixel_t* row = img + (size_t)sy * stride;
    pixel_t* wr = win + (size_t)y * win_stride;
    for (int x = 0; x < n_left; x++) wr[x] = row[0];
    memcpy(wr + n_left, row + max_i(x0, 0), n_mid * sizeof(pixel_t));
    for (int x = 0; x < n_right; x++)
      wr[n_left + n_mid + x] = row[pw - 1];
  }
}

// Luma qpel interpolation into an int16 buffer with the spec's intermediate
// scaling (shift1 = BitDepth-8; values scaled by 2^(14-BitDepth) overall).
// Core qpel filtering from a full-pel origin `c` with row stride `cs`.
// The fractional offsets are template parameters so the 8 filter taps are
// compile-time constants — the inner loops then autovectorize into
// constant-multiplier multiply-accumulate chains.
template <typename pixel_t, int FX, int FY>
static void mc_luma_core_t(const pixel_t* c, int cs, i16* out, int out_stride,
                           int w, int h, int shift1, int shift3) {
  if constexpr (FX == 0 && FY == 0) {
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++)
        out[y * out_stride + x] = (i16)(c[y * cs + x] << shift3);
  } else if constexpr (FY == 0) {
    constexpr const int* f = kQpelFilter[FX];
    for (int y = 0; y < h; y++) {
      const pixel_t* row = c + y * cs - 3;
      for (int x = 0; x < w; x++) {
        int sum = f[0] * row[x] + f[1] * row[x + 1] + f[2] * row[x + 2] +
                  f[3] * row[x + 3] + f[4] * row[x + 4] + f[5] * row[x + 5] +
                  f[6] * row[x + 6] + f[7] * row[x + 7];
        out[y * out_stride + x] = (i16)(sum >> shift1);
      }
    }
  } else if constexpr (FX == 0) {
    constexpr const int* f = kQpelFilter[FY];
    for (int y = 0; y < h; y++) {
      const pixel_t* col = c + (y - 3) * cs;
      for (int x = 0; x < w; x++) {
        int sum = f[0] * col[x] + f[1] * col[cs + x] + f[2] * col[2 * cs + x] +
                  f[3] * col[3 * cs + x] + f[4] * col[4 * cs + x] +
                  f[5] * col[5 * cs + x] + f[6] * col[6 * cs + x] +
                  f[7] * col[7 * cs + x];
        out[y * out_stride + x] = (i16)(sum >> shift1);
      }
    }
  } else {
    // separable: horizontal first (rows -3..h+3), then vertical
    i16 tmp[(64 + 7) * 64];
    constexpr const int* fx = kQpelFilter[FX];
    constexpr const int* fy = kQpelFilter[FY];
    for (int y = -3; y < h + 4; y++) {
      const pixel_t* row = c + y * cs - 3;
      i16* trow = tmp + (y + 3) * 64;
      for (int x = 0; x < w; x++) {
        int sum = fx[0] * row[x] + fx[1] * row[x + 1] + fx[2] * row[x + 2] +
                  fx[3] * row[x + 3] + fx[4] * row[x + 4] + fx[5] * row[x + 5] +
                  fx[6] * row[x + 6] + fx[7] * row[x + 7];
        trow[x] = (i16)(sum >> shift1);
      }
    }
    for (int y = 0; y < h; y++) {
      const i16* t = tmp + y * 64;
      for (int x = 0; x < w; x++) {
        int sum = fy[0] * t[x] + fy[1] * t[64 + x] + fy[2] * t[128 + x] +
                  fy[3] * t[192 + x] + fy[4] * t[256 + x] + fy[5] * t[320 + x] +
                  fy[6] * t[384 + x] + fy[7] * t[448 + x];
        out[y * out_stride + x] = (i16)(sum >> 6);
      }
    }
  }
}

#if defined(__AVX2__)
#include <immintrin.h>

// 16-bit SIMD qpel filters for the 8-bit path (counterpart of the
// reference's SSE tier, /root/reference/libde265/x86/sse-motion.cc).  All
// intermediate sums fit int16 for 8-bit sources (|sum| <= 20400), so the
// horizontal/vertical passes run at twice the lane width of the compiler's
// 32-bit autovectorization.  Requires w >= 16 (the last chunk overlaps).
static inline void mc_h8_avx2(const u8* src, int cs, i16* out, int os,
                              int w, int h, const int* f) {
  __m256i fk[8];
  for (int k = 0; k < 8; k++) fk[k] = _mm256_set1_epi16((short)f[k]);
  for (int y = 0; y < h; y++) {
    const u8* row = src + (size_t)y * cs - 3;
    i16* orow = out + (size_t)y * os;
    for (int x = 0; x < w; x += 16) {
      if (x + 16 > w) x = w - 16;
      __m256i acc = _mm256_setzero_si256();
      for (int k = 0; k < 8; k++) {
        if (!f[k]) continue;
        __m256i v = _mm256_cvtepu8_epi16(
            _mm_loadu_si128((const __m128i*)(row + x + k)));
        acc = _mm256_add_epi16(acc, _mm256_mullo_epi16(v, fk[k]));
      }
      _mm256_storeu_si256((__m256i*)(orow + x), acc);
    }
  }
}

static inline void mc_v8_avx2(const u8* src, int cs, i16* out, int os,
                              int w, int h, const int* f) {
  __m256i fk[8];
  for (int k = 0; k < 8; k++) fk[k] = _mm256_set1_epi16((short)f[k]);
  for (int y = 0; y < h; y++) {
    const u8* col = src + (size_t)(y - 3) * cs;
    i16* orow = out + (size_t)y * os;
    for (int x = 0; x < w; x += 16) {
      if (x + 16 > w) x = w - 16;
      __m256i acc = _mm256_setzero_si256();
      for (int k = 0; k < 8; k++) {
        if (!f[k]) continue;
        __m256i v = _mm256_cvtepu8_epi16(
            _mm_loadu_si128((const __m128i*)(col + (size_t)k * cs + x)));
        acc = _mm256_add_epi16(acc, _mm256_mullo_epi16(v, fk[k]));
      }
      _mm256_storeu_si256((__m256i*)(orow + x), acc);
    }
  }
}

// vertical pass over int16 horizontal intermediates: 32-bit accumulation
// via pairwise madd, then >> 6 back to int16
static inline void mc_v16_avx2(const i16* tmp, int ts, i16* out, int os,
                               int w, int h, const int* f) {
  __m256i fp[4];
  for (int k = 0; k < 4; k++) {
    u32 pair = (u16)(short)f[2 * k] | ((u32)(u16)(short)f[2 * k + 1] << 16);
    fp[k] = _mm256_set1_epi32((int)pair);
  }
  for (int y = 0; y < h; y++) {
    const i16* base = tmp + (size_t)y * ts;
    i16* orow = out + (size_t)y * os;
    for (int x = 0; x < w; x += 16) {
      if (x + 16 > w) x = w - 16;
      __m256i lo = _mm256_setzero_si256(), hi = _mm256_setzero_si256();
      for (int k = 0; k < 4; k++) {
        __m256i a = _mm256_loadu_si256(
            (const __m256i*)(base + (size_t)(2 * k) * ts + x));
        __m256i b = _mm256_loadu_si256(
            (const __m256i*)(base + (size_t)(2 * k + 1) * ts + x));
        __m256i l = _mm256_unpacklo_epi16(a, b);
        __m256i hh = _mm256_unpackhi_epi16(a, b);
        lo = _mm256_add_epi32(lo, _mm256_madd_epi16(l, fp[k]));
        hi = _mm256_add_epi32(hi, _mm256_madd_epi16(hh, fp[k]));
      }
      lo = _mm256_srai_epi32(lo, 6);
      hi = _mm256_srai_epi32(hi, 6);
      _mm256_storeu_si256((__m256i*)(orow + x),
                          _mm256_packs_epi32(lo, hi));
    }
  }
}
#endif  // __AVX2__

template <typename pixel_t>
static inline void mc_luma_core(const pixel_t* c, int cs, int frac_x,
                                int frac_y, i16* out, int out_stride, int w,
                                int h, int shift1, int shift3) {
#if defined(__AVX2__)
  if constexpr (sizeof(pixel_t) == 1) {
    if (shift1 == 0 && w >= 16 && ((frac_x | frac_y) != 0)) {
      const u8* src = reinterpret_cast<const u8*>(c);
      if (frac_y == 0) {
        mc_h8_avx2(src, cs, out, out_stride, w, h, kQpelFilter[frac_x]);
        return;
      }
      if (frac_x == 0) {
        mc_v8_avx2(src, cs, out, out_stride, w, h, kQpelFilter[frac_y]);
        return;
      }
      i16 tmp[(64 + 7) * 64];
      mc_h8_avx2(src - 3 * cs, cs, tmp, 64, w, h + 7, kQpelFilter[frac_x]);
      mc_v16_avx2(tmp, 64, out, out_stride, w, h, kQpelFilter[frac_y]);
      return;
    }
  }
#endif
  using Fn = void (*)(const pixel_t*, int, i16*, int, int, int, int, int);
  static constexpr Fn kDispatch[16] = {
      &mc_luma_core_t<pixel_t, 0, 0>, &mc_luma_core_t<pixel_t, 0, 1>,
      &mc_luma_core_t<pixel_t, 0, 2>, &mc_luma_core_t<pixel_t, 0, 3>,
      &mc_luma_core_t<pixel_t, 1, 0>, &mc_luma_core_t<pixel_t, 1, 1>,
      &mc_luma_core_t<pixel_t, 1, 2>, &mc_luma_core_t<pixel_t, 1, 3>,
      &mc_luma_core_t<pixel_t, 2, 0>, &mc_luma_core_t<pixel_t, 2, 1>,
      &mc_luma_core_t<pixel_t, 2, 2>, &mc_luma_core_t<pixel_t, 2, 3>,
      &mc_luma_core_t<pixel_t, 3, 0>, &mc_luma_core_t<pixel_t, 3, 1>,
      &mc_luma_core_t<pixel_t, 3, 2>, &mc_luma_core_t<pixel_t, 3, 3>};
  kDispatch[(frac_x << 2) | frac_y](c, cs, out, out_stride, w, h, shift1,
                                    shift3);
}

template <typename pixel_t>
static void mc_luma(const Frame& ref, int x_int, int y_int, int frac_x,
                    int frac_y, i16* out, int out_stride, int w, int h,
                    int bd) {
  const pixel_t* img = reinterpret_cast<const pixel_t*>(ref.plane[0].data());
  int stride = ref.stride[0];
  int pw = ref.width, ph = ref.height;
  int shift1 = bd - 8;
  int shift3 = 14 - bd;

  // interior fast path: filter straight from the reference plane
  if (x_int >= 3 && y_int >= 3 && x_int + w + 4 <= pw && y_int + h + 4 <= ph) {
    mc_luma_core(img + (size_t)y_int * stride + x_int, stride, frac_x, frac_y,
                 out, out_stride, w, h, shift1, shift3);
    return;
  }

  constexpr int kWS = 64 + 7;
  pixel_t win[kWS * kWS];
  gather_window<pixel_t, 8>(img, stride, pw, ph, x_int, y_int, w, h, win, kWS);
  mc_luma_core(win + 3 * kWS + 3, kWS, frac_x, frac_y, out, out_stride, w, h,
               shift1, shift3);
}

// Chroma epel core, fractional offsets as template parameters (constant
// taps -> autovectorized constant-multiplier MACs), like mc_luma_core_t.
#if defined(__AVX2__)
// 8-lane AVX2 epel (4-tap) chroma filters for the 8-bit path; int16 sums
// (|sum| <= 18k) at 16 lanes when w >= 16, 8 lanes otherwise.
static inline void epel_h8_avx2(const u8* src, int cs, i16* out, int os,
                                int w, int h, const int* f) {
  __m128i fk4[4];
  __m256i fk8[4];
  for (int k = 0; k < 4; k++) {
    fk4[k] = _mm_set1_epi16((short)f[k]);
    fk8[k] = _mm256_set1_epi16((short)f[k]);
  }
  for (int y = 0; y < h; y++) {
    const u8* row = src + (size_t)y * cs - 1;
    i16* orow = out + (size_t)y * os;
    int x = 0;
    for (; x + 16 <= w; x += 16) {
      __m256i acc = _mm256_setzero_si256();
      for (int k = 0; k < 4; k++) {
        if (!f[k]) continue;
        __m256i v = _mm256_cvtepu8_epi16(
            _mm_loadu_si128((const __m128i*)(row + x + k)));
        acc = _mm256_add_epi16(acc, _mm256_mullo_epi16(v, fk8[k]));
      }
      _mm256_storeu_si256((__m256i*)(orow + x), acc);
    }
    for (; x < w; x += 8) {
      if (x + 8 > w) x = w - 8;
      __m128i acc = _mm_setzero_si128();
      for (int k = 0; k < 4; k++) {
        if (!f[k]) continue;
        __m128i v = _mm_cvtepu8_epi16(
            _mm_loadl_epi64((const __m128i*)(row + x + k)));
        acc = _mm_add_epi16(acc, _mm_mullo_epi16(v, fk4[k]));
      }
      _mm_storeu_si128((__m128i*)(orow + x), acc);
    }
  }
}

static inline void epel_v8_avx2(const u8* src, int cs, i16* out, int os,
                                int w, int h, const int* f) {
  __m128i fk4[4];
  __m256i fk8[4];
  for (int k = 0; k < 4; k++) {
    fk4[k] = _mm_set1_epi16((short)f[k]);
    fk8[k] = _mm256_set1_epi16((short)f[k]);
  }
  for (int y = 0; y < h; y++) {
    const u8* col = src + (size_t)(y - 1) * cs;
    i16* orow = out + (size_t)y * os;
    int x = 0;
    for (; x + 16 <= w; x += 16) {
      __m256i acc = _mm256_setzero_si256();
      for (int k = 0; k < 4; k++) {
        if (!f[k]) continue;
        __m256i v = _mm256_cvtepu8_epi16(
            _mm_loadu_si128((const __m128i*)(col + (size_t)k * cs + x)));
        acc = _mm256_add_epi16(acc, _mm256_mullo_epi16(v, fk8[k]));
      }
      _mm256_storeu_si256((__m256i*)(orow + x), acc);
    }
    for (; x < w; x += 8) {
      if (x + 8 > w) x = w - 8;
      __m128i acc = _mm_setzero_si128();
      for (int k = 0; k < 4; k++) {
        if (!f[k]) continue;
        __m128i v = _mm_cvtepu8_epi16(
            _mm_loadl_epi64((const __m128i*)(col + (size_t)k * cs + x)));
        acc = _mm_add_epi16(acc, _mm_mullo_epi16(v, fk4[k]));
      }
      _mm_storeu_si128((__m128i*)(orow + x), acc);
    }
  }
}

static inline void epel_v16_avx2(const i16* tmp, int ts, i16* out, int os,
                                 int w, int h, const int* f) {
  __m256i fp[2];
  for (int k = 0; k < 2; k++) {
    u32 pair = (u16)(short)f[2 * k] | ((u32)(u16)(short)f[2 * k + 1] << 16);
    fp[k] = _mm256_set1_epi32((int)pair);
  }
  for (int y = 0; y < h; y++) {
    const i16* base = tmp + (size_t)y * ts;
    i16* orow = out + (size_t)y * os;
    for (int x = 0; x < w; x += 16) {
      if (x + 16 > w) x = max_i(0, w - 16);
      __m256i lo = _mm256_setzero_si256(), hi = _mm256_setzero_si256();
      for (int k = 0; k < 2; k++) {
        __m256i a = _mm256_loadu_si256(
            (const __m256i*)(base + (size_t)(2 * k) * ts + x));
        __m256i b = _mm256_loadu_si256(
            (const __m256i*)(base + (size_t)(2 * k + 1) * ts + x));
        lo = _mm256_add_epi32(lo, _mm256_madd_epi16(
            _mm256_unpacklo_epi16(a, b), fp[k]));
        hi = _mm256_add_epi32(hi, _mm256_madd_epi16(
            _mm256_unpackhi_epi16(a, b), fp[k]));
      }
      lo = _mm256_srai_epi32(lo, 6);
      hi = _mm256_srai_epi32(hi, 6);
      _mm256_storeu_si256((__m256i*)(orow + x),
                          _mm256_packs_epi32(lo, hi));
    }
  }
}
#endif  // __AVX2__

template <typename pixel_t, int FX, int FY>
static void mc_chroma_core_t(const pixel_t* cc, int cs, i16* out,
                             int out_stride, int w, int h, int shift1,
                             int shift3) {
  if constexpr (FX == 0 && FY == 0) {
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++)
        out[y * out_stride + x] = (i16)(cc[y * cs + x] << shift3);
  } else if constexpr (FY == 0) {
    constexpr const int* f = kEpelFilter[FX];
    for (int y = 0; y < h; y++) {
      const pixel_t* row = cc + y * cs - 1;
      for (int x = 0; x < w; x++) {
        int sum = f[0] * row[x] + f[1] * row[x + 1] + f[2] * row[x + 2] +
                  f[3] * row[x + 3];
        out[y * out_stride + x] = (i16)(sum >> shift1);
      }
    }
  } else if constexpr (FX == 0) {
    constexpr const int* f = kEpelFilter[FY];
    for (int y = 0; y < h; y++) {
      const pixel_t* col = cc + (y - 1) * cs;
      for (int x = 0; x < w; x++) {
        int sum = f[0] * col[x] + f[1] * col[cs + x] + f[2] * col[2 * cs + x] +
                  f[3] * col[3 * cs + x];
        out[y * out_stride + x] = (i16)(sum >> shift1);
      }
    }
  } else {
    // chroma blocks reach 64 wide for 4:4:4 (and 64 tall for 4:2:2)
    i16 tmp[(64 + 3) * 64];
    constexpr const int* fx = kEpelFilter[FX];
    constexpr const int* fy = kEpelFilter[FY];
    for (int y = -1; y < h + 2; y++) {
      const pixel_t* row = cc + y * cs - 1;
      i16* trow = tmp + (y + 1) * 64;
      for (int x = 0; x < w; x++) {
        int sum = fx[0] * row[x] + fx[1] * row[x + 1] + fx[2] * row[x + 2] +
                  fx[3] * row[x + 3];
        trow[x] = (i16)(sum >> shift1);
      }
    }
    for (int y = 0; y < h; y++) {
      const i16* t = tmp + y * 64;
      for (int x = 0; x < w; x++) {
        int sum = fy[0] * t[x] + fy[1] * t[64 + x] + fy[2] * t[128 + x] +
                  fy[3] * t[192 + x];
        out[y * out_stride + x] = (i16)(sum >> 6);
      }
    }
  }
}

template <typename pixel_t, int FX>
struct EpelRow {
  using Fn = void (*)(const pixel_t*, int, i16*, int, int, int, int, int);
  static constexpr Fn fns[8] = {
      &mc_chroma_core_t<pixel_t, FX, 0>, &mc_chroma_core_t<pixel_t, FX, 1>,
      &mc_chroma_core_t<pixel_t, FX, 2>, &mc_chroma_core_t<pixel_t, FX, 3>,
      &mc_chroma_core_t<pixel_t, FX, 4>, &mc_chroma_core_t<pixel_t, FX, 5>,
      &mc_chroma_core_t<pixel_t, FX, 6>, &mc_chroma_core_t<pixel_t, FX, 7>};
};

template <typename pixel_t>
static inline void mc_chroma_core(const pixel_t* cc, int cs, int frac_x,
                                  int frac_y, i16* out, int out_stride, int w,
                                  int h, int shift1, int shift3) {
#if defined(__AVX2__)
  if constexpr (sizeof(pixel_t) == 1) {
    if (shift1 == 0 && w >= 8 && ((frac_x | frac_y) != 0)) {
      const u8* src = reinterpret_cast<const u8*>(cc);
      if (frac_y == 0) {
        epel_h8_avx2(src, cs, out, out_stride, w, h, kEpelFilter[frac_x]);
        return;
      }
      if (frac_x == 0) {
        epel_v8_avx2(src, cs, out, out_stride, w, h, kEpelFilter[frac_y]);
        return;
      }
      if (w >= 16) {
        i16 tmp[(64 + 3) * 64];
        epel_h8_avx2(src - cs, cs, tmp, 64, w, h + 3, kEpelFilter[frac_x]);
        epel_v16_avx2(tmp, 64, out, out_stride, w, h, kEpelFilter[frac_y]);
        return;
      }
    }
  }
#endif
  using Fn = void (*)(const pixel_t*, int, i16*, int, int, int, int, int);
  static constexpr const Fn* kRows[8] = {
      EpelRow<pixel_t, 0>::fns, EpelRow<pixel_t, 1>::fns,
      EpelRow<pixel_t, 2>::fns, EpelRow<pixel_t, 3>::fns,
      EpelRow<pixel_t, 4>::fns, EpelRow<pixel_t, 5>::fns,
      EpelRow<pixel_t, 6>::fns, EpelRow<pixel_t, 7>::fns};
  kRows[frac_x][frac_y](cc, cs, out, out_stride, w, h, shift1, shift3);
}

template <typename pixel_t>
static void mc_chroma(const Frame& ref, int c, int x_int, int y_int, int frac_x,
                      int frac_y, i16* out, int out_stride, int w, int h,
                      int bd) {
  const pixel_t* img = reinterpret_cast<const pixel_t*>(ref.plane[c].data());
  int stride = ref.stride[c];
  int pw = ref.chroma_width, ph = ref.chroma_height;
  int shift1 = bd - 8;
  int shift3 = 14 - bd;

  if (x_int >= 1 && y_int >= 1 && x_int + w + 2 <= pw && y_int + h + 2 <= ph) {
    mc_chroma_core(img + (size_t)y_int * stride + x_int, stride, frac_x,
                   frac_y, out, out_stride, w, h, shift1, shift3);
    return;
  }

  constexpr int kWS = 64 + 3;  // 4:4:4 chroma PUs reach 64x64
  pixel_t win[kWS * kWS];
  gather_window<pixel_t, 4>(img, stride, pw, ph, x_int, y_int, w, h, win, kWS);
  mc_chroma_core(win + 1 * kWS + 1, kWS, frac_x, frac_y, out, out_stride, w, h,
                 shift1, shift3);
}

// ---------------------------------------------------------------------------
// weighted / default sample prediction merge (spec 8.5.4.2.3)
// ---------------------------------------------------------------------------
// unweighted uni-prediction, 8-bit: the hottest merge case — kept separate
// and forced inline so the constant shift vectorizes at the call site
template <typename pixel_t>
static inline void pred_copy_uni8(pixel_t* dst, int stride, const i16* p0,
                                  int buf_stride, int w, int h) {
  for (int y = 0; y < h; y++)
    for (int x = 0; x < w; x++)
      dst[y * stride + x] =
          (pixel_t)clip3(0, 255, (p0[y * buf_stride + x] + 32) >> 6);
}

template <typename pixel_t>
static void pred_merge(pixel_t* dst, int stride, const i16* p0, const i16* p1,
                       int buf_stride, int w, int h, int bd, bool bi,
                       bool weighted, int w0, int o0, int w1, int o1,
                       int log2_denom) {
  if (!weighted) {
    if (!bi) {
      if (bd == 8) {
        pred_copy_uni8(dst, stride, p0, buf_stride, w, h);
        return;
      }
      int shift = 14 - bd;
      int offset = (shift > 0) ? (1 << (shift - 1)) : 0;
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
          dst[y * stride + x] =
              (pixel_t)clip_bd((p0[y * buf_stride + x] + offset) >> shift, bd);
    } else {
      int shift = 15 - bd;
      int offset = 1 << (shift - 1);
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
          dst[y * stride + x] = (pixel_t)clip_bd(
              (p0[y * buf_stride + x] + p1[y * buf_stride + x] + offset) >> shift,
              bd);
    }
  } else {
    int log2_wd = log2_denom + 14 - bd;
    if (!bi) {
      if (log2_wd >= 1) {
        int rnd = 1 << (log2_wd - 1);
        for (int y = 0; y < h; y++)
          for (int x = 0; x < w; x++)
            dst[y * stride + x] = (pixel_t)clip_bd(
                ((p0[y * buf_stride + x] * w0 + rnd) >> log2_wd) + o0, bd);
      } else {
        for (int y = 0; y < h; y++)
          for (int x = 0; x < w; x++)
            dst[y * stride + x] =
                (pixel_t)clip_bd(p0[y * buf_stride + x] * w0 + o0, bd);
      }
    } else {
      int rnd = (o0 + o1 + 1) << log2_wd;
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
          dst[y * stride + x] = (pixel_t)clip_bd(
              (p0[y * buf_stride + x] * w0 + p1[y * buf_stride + x] * w1 + rnd) >>
                  (log2_wd + 1),
              bd);
    }
  }
}

// Edge-clamped full-pel block copy (the uni/unweighted/integer-MV fast
// path: prediction == reference samples, no filtering or merge needed).
template <typename pixel_t>
static inline void copy_block_clamped(const Frame& ref, int c, int x0,
                                      int y0, int w, int h, pixel_t* dst,
                                      int dstride) {
  const pixel_t* img = reinterpret_cast<const pixel_t*>(ref.plane[c].data());
  int stride = ref.stride[c];
  int pw = ref.plane_width(c), ph = ref.plane_height(c);
  if (x0 >= 0 && y0 >= 0 && x0 + w <= pw && y0 + h <= ph) {
    const pixel_t* srow = img + (size_t)y0 * stride + x0;
    for (int y = 0; y < h; y++)
      memcpy(dst + (size_t)y * dstride, srow + (size_t)y * stride,
             w * sizeof(pixel_t));
    return;
  }
  for (int y = 0; y < h; y++) {
    const pixel_t* srow = img + (size_t)clip3(0, ph - 1, y0 + y) * stride;
    pixel_t* drow = dst + (size_t)y * dstride;
    for (int x = 0; x < w; x++) drow[x] = srow[clip3(0, pw - 1, x0 + x)];
  }
}

template <typename pixel_t>
static void execute_pu_t(const FrameProgram& prog, const PuRec& pu) {
  Frame& frame = *prog.frame;
  const SliceHeader& sh = *prog.slices[pu.slice];
  const Sps& sps = *frame.sps;

  bool bi = (pu.pred_flags == 3);
  int bd_y = frame.bit_depth[0];
  int bd_c = frame.bit_depth[1];

  // full-pel uni unweighted fast path: straight copies from the reference
  {
    bool weighted_f = (sh.slice_type == SLICE_P) ? sh.pps->weighted_pred
                                                 : sh.pps->weighted_bipred;
    if (!bi && !weighted_f) {
      int l = (pu.pred_flags & 1) ? 0 : 1;
      int mvx = pu.mv[l].x, mvy = pu.mv[l].y;
      int sw = sps.chroma_array_type ? sps.sub_width_c : 1;
      int shc = sps.chroma_array_type ? sps.sub_height_c : 1;
      int cmask = ((sw == 2 ? 7 : 3) | (shc == 2 ? 7 : 3));
      if (((mvx | mvy) & 3) == 0 &&
          (sps.chroma_array_type == 0 || ((mvx | mvy) & cmask) == 0)) {
        const Frame* ref = prog.ref_frames[pu.ref_dpb[l]];
        pixel_t* dst = reinterpret_cast<pixel_t*>(frame.plane[0].data()) +
                       (size_t)pu.y * frame.stride[0] + pu.x;
        copy_block_clamped<pixel_t>(*ref, 0, pu.x + (mvx >> 2),
                                    pu.y + (mvy >> 2), pu.w, pu.h, dst,
                                    frame.stride[0]);
        if (sps.chroma_array_type != 0) {
          int cx = (pu.x / sw) + (mvx >> (sw == 2 ? 3 : 2));
          int cy = (pu.y / shc) + (mvy >> (shc == 2 ? 3 : 2));
          for (int c = 1; c <= 2; c++) {
            pixel_t* dc = reinterpret_cast<pixel_t*>(frame.plane[c].data()) +
                          (size_t)(pu.y / shc) * frame.stride[c] + pu.x / sw;
            copy_block_clamped<pixel_t>(*ref, c, cx, cy, pu.w / sw,
                                        pu.h / shc, dc, frame.stride[c]);
          }
        }
        return;
      }
    }
  }

  i16 buf[2][3][64 * 64];  // [list][channel]

  for (int l = 0; l < 2; l++) {
    if (!((pu.pred_flags >> l) & 1)) continue;
    const Frame* ref = prog.ref_frames[pu.ref_dpb[l]];
    int mvx = pu.mv[l].x, mvy = pu.mv[l].y;

    // luma
    if (frame.bytes_pp == 1)
      mc_luma<u8>(*ref, pu.x + (mvx >> 2), pu.y + (mvy >> 2), mvx & 3, mvy & 3,
                  buf[l][0], 64, pu.w, pu.h, bd_y);
    else
      mc_luma<u16>(*ref, pu.x + (mvx >> 2), pu.y + (mvy >> 2), mvx & 3, mvy & 3,
                   buf[l][0], 64, pu.w, pu.h, bd_y);

    // chroma (4:2:0 / 4:2:2 / 4:4:4)
    if (sps.chroma_array_type != 0) {
      int sw = sps.sub_width_c, shc = sps.sub_height_c;
      // chroma MV precision: 1/8 for 4:2:0 dimensions, 1/4 for non-subsampled
      int mvx_c = mvx, mvy_c = mvy;
      int cx = (pu.x / sw) + (mvx_c >> (sw == 2 ? 3 : 2));
      int cy = (pu.y / shc) + (mvy_c >> (shc == 2 ? 3 : 2));
      int fx = (sw == 2) ? (mvx_c & 7) : ((mvx_c & 3) << 1);
      int fy = (shc == 2) ? (mvy_c & 7) : ((mvy_c & 3) << 1);
      int cw = pu.w / sw, ch = pu.h / shc;
      for (int c = 1; c <= 2; c++) {
        if (frame.bytes_pp == 1)
          mc_chroma<u8>(*ref, c, cx, cy, fx, fy, buf[l][c], 64, cw, ch, bd_c);
        else
          mc_chroma<u16>(*ref, c, cx, cy, fx, fy, buf[l][c], 64, cw, ch, bd_c);
      }
    }
  }

  int first_list = (pu.pred_flags & 1) ? 0 : 1;
  bool weighted = (sh.slice_type == SLICE_P) ? sh.pps->weighted_pred
                                             : sh.pps->weighted_bipred;

  const WeightedPredParams& wp = sh.wp;
  int l0 = first_list;
  int r0 = pu.ref_idx[l0];
  int l1 = 1;
  int r1 = (pu.pred_flags & 2) ? pu.ref_idx[1] : 0;

  // luma merge
  {
    pixel_t* dst = reinterpret_cast<pixel_t*>(frame.plane[0].data()) +
                   (size_t)pu.y * frame.stride[0] + pu.x;
    pred_merge(dst, frame.stride[0], buf[l0][0], buf[l1][0], 64, pu.w, pu.h,
               bd_y, bi, weighted, wp.luma_weight[l0][r0], wp.luma_offset[l0][r0],
               wp.luma_weight[l1][r1], wp.luma_offset[l1][r1],
               wp.luma_log2_weight_denom);
  }
  if (sps.chroma_array_type != 0) {
    int sw = sps.sub_width_c, shc = sps.sub_height_c;
    int cw = pu.w / sw, ch = pu.h / shc;
    for (int c = 1; c <= 2; c++) {
      pixel_t* dst = reinterpret_cast<pixel_t*>(frame.plane[c].data()) +
                     (size_t)(pu.y / shc) * frame.stride[c] + pu.x / sw;
      pred_merge(dst, frame.stride[c], buf[l0][c], buf[l1][c], 64, cw, ch, bd_c,
                 bi, weighted, wp.chroma_weight[l0][r0][c - 1],
                 wp.chroma_offset[l0][r0][c - 1], wp.chroma_weight[l1][r1][c - 1],
                 wp.chroma_offset[l1][r1][c - 1], wp.chroma_log2_weight_denom);
    }
  }
}

static void execute_pcm(const FrameProgram& prog, const PcmRec& rec) {
  Frame& frame = *prog.frame;
  const Sps& sps = *frame.sps;
  int size = 1 << rec.log2_size;
  u32 p = rec.data_start;
  int shift_y = frame.bit_depth[0] - sps.pcm_bit_depth_luma;
  if (frame.bytes_pp == 1) {
    for (int y = 0; y < size; y++)
      for (int x = 0; x < size; x++)
        *frame.px8(0, rec.x + x, rec.y + y) =
            (u8)(prog.pcm_data[p++] << max_i(shift_y, 0));
  } else {
    for (int y = 0; y < size; y++)
      for (int x = 0; x < size; x++)
        *frame.px16(0, rec.x + x, rec.y + y) =
            (u16)(prog.pcm_data[p++] << max_i(shift_y, 0));
  }
  if (sps.chroma_array_type != 0) {
    int cw = size / sps.sub_width_c, chh = size / sps.sub_height_c;
    int shift_c = frame.bit_depth[1] - sps.pcm_bit_depth_chroma;
    int cx = rec.x / sps.sub_width_c, cy = rec.y / sps.sub_height_c;
    for (int c = 1; c <= 2; c++) {
      if (frame.bytes_pp == 1) {
        for (int y = 0; y < chh; y++)
          for (int x = 0; x < cw; x++)
            *frame.px8(c, cx + x, cy + y) =
                (u8)(prog.pcm_data[p++] << max_i(shift_c, 0));
      } else {
        for (int y = 0; y < chh; y++)
          for (int x = 0; x < cw; x++)
            *frame.px16(c, cx + x, cy + y) =
                (u16)(prog.pcm_data[p++] << max_i(shift_c, 0));
      }
    }
  }
}

// single-PU scalar MC (encoder prediction path)
void execute_pu_scalar(const FrameProgram& prog, const PuRec& pu) {
  if (prog.frame->bytes_pp == 1)
    execute_pu_t<u8>(prog, pu);
  else
    execute_pu_t<u16>(prog, pu);
}

Err execute_program_scalar(FrameProgram& prog, bool run_deblock, bool run_sao) {
  if (!prog.frame) return Err::InternalError;

  // Cross-component prediction needs the enclosing TU's luma residual when
  // reconstructing chroma; ops run in parse order, so a single cache works.
  i32 luma_residual[32 * 32];
  i32* ccp_cache = (prog.frame->pps &&
                    prog.frame->pps->cross_component_prediction_enabled)
                       ? luma_residual
                       : nullptr;

  for (const Op& op : prog.ops) {
    switch (op.kind) {
      case Op::kIntraPred: {
        perf::Scope ps(perf::kIntra);
        execute_intra_scalar(prog, prog.intras[op.idx]);
        break;
      }
      case Op::kAddResidual: {
        perf::Scope ps(perf::kTransform);
        execute_tu_scalar(prog, prog.tus[op.idx], ccp_cache);
        break;
      }
      case Op::kInterPred: {
        perf::Scope ps(perf::kInter);
        if (prog.frame->bytes_pp == 1)
          execute_pu_t<u8>(prog, prog.pus[op.idx]);
        else
          execute_pu_t<u16>(prog, prog.pus[op.idx]);
        break;
      }
      case Op::kPcm:
        execute_pcm(prog, prog.pcms[op.idx]);
        break;
    }
  }

  if (run_deblock) {
    perf::Scope ps(perf::kDeblock);
    apply_deblocking(prog);
  }
  if (run_sao) {
    perf::Scope ps(perf::kSao);
    apply_sao(prog);
  }
  return Err::OK;
}

}  // namespace tde265
