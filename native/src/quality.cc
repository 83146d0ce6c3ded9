// Image quality metrics: SSD / SAD / MSE / PSNR / per-block SSIM-style maps.
// Capability counterpart of /root/reference/libde265/quality.{h,cc} and the
// dec265 -m measurement path (dec265.cc:388+).
#include <cmath>
#include <cstdint>
#include <cstddef>

#include "tde265/common.h"

namespace tde265 {

u64 compute_ssd(const u8* a, int stride_a, const u8* b, int stride_b, int w,
                int h) {
  u64 sum = 0;
  for (int y = 0; y < h; y++) {
    const u8* pa = a + (size_t)y * stride_a;
    const u8* pb = b + (size_t)y * stride_b;
    for (int x = 0; x < w; x++) {
      int d = pa[x] - pb[x];
      sum += (u64)(d * d);
    }
  }
  return sum;
}

u64 compute_sad(const u8* a, int stride_a, const u8* b, int stride_b, int w,
                int h) {
  u64 sum = 0;
  for (int y = 0; y < h; y++) {
    const u8* pa = a + (size_t)y * stride_a;
    const u8* pb = b + (size_t)y * stride_b;
    for (int x = 0; x < w; x++) sum += (u64)abs_i(pa[x] - pb[x]);
  }
  return sum;
}

double compute_mse(const u8* a, int stride_a, const u8* b, int stride_b, int w,
                   int h) {
  return (double)compute_ssd(a, stride_a, b, stride_b, w, h) / ((double)w * h);
}

double compute_psnr(const u8* a, int stride_a, const u8* b, int stride_b,
                    int w, int h) {
  double mse = compute_mse(a, stride_a, b, stride_b, w, h);
  if (mse == 0) return 99.0;
  return 10.0 * std::log10(255.0 * 255.0 / mse);
}

// Simplified per-block structural similarity (mean/variance/covariance based,
// 8x8 blocks), as used by dec265's -m SSIM map output.
double compute_ssim(const u8* a, int stride_a, const u8* b, int stride_b,
                    int w, int h) {
  const double c1 = (0.01 * 255) * (0.01 * 255);
  const double c2 = (0.03 * 255) * (0.03 * 255);
  double total = 0;
  int blocks = 0;
  for (int by = 0; by + 8 <= h; by += 8) {
    for (int bx = 0; bx + 8 <= w; bx += 8) {
      double ma = 0, mb = 0;
      for (int y = 0; y < 8; y++)
        for (int x = 0; x < 8; x++) {
          ma += a[(size_t)(by + y) * stride_a + bx + x];
          mb += b[(size_t)(by + y) * stride_b + bx + x];
        }
      ma /= 64;
      mb /= 64;
      double va = 0, vb = 0, cov = 0;
      for (int y = 0; y < 8; y++)
        for (int x = 0; x < 8; x++) {
          double da = a[(size_t)(by + y) * stride_a + bx + x] - ma;
          double db = b[(size_t)(by + y) * stride_b + bx + x] - mb;
          va += da * da;
          vb += db * db;
          cov += da * db;
        }
      va /= 63;
      vb /= 63;
      cov /= 63;
      double ssim = ((2 * ma * mb + c1) * (2 * cov + c2)) /
                    ((ma * ma + mb * mb + c1) * (va + vb + c2));
      total += ssim;
      blocks++;
    }
  }
  return blocks ? total / blocks : 1.0;
}

}  // namespace tde265

// C exports (quality.h parity surface)
extern "C" {
__attribute__((visibility("default"))) uint64_t tde265_SSD(
    const uint8_t* a, int stride_a, const uint8_t* b, int stride_b, int w, int h) {
  return tde265::compute_ssd(a, stride_a, b, stride_b, w, h);
}
__attribute__((visibility("default"))) uint64_t tde265_SAD(
    const uint8_t* a, int stride_a, const uint8_t* b, int stride_b, int w, int h) {
  return tde265::compute_sad(a, stride_a, b, stride_b, w, h);
}
__attribute__((visibility("default"))) double tde265_MSE(
    const uint8_t* a, int stride_a, const uint8_t* b, int stride_b, int w, int h) {
  return tde265::compute_mse(a, stride_a, b, stride_b, w, h);
}
__attribute__((visibility("default"))) double tde265_PSNR(
    const uint8_t* a, int stride_a, const uint8_t* b, int stride_b, int w, int h) {
  return tde265::compute_psnr(a, stride_a, b, stride_b, w, h);
}
__attribute__((visibility("default"))) double tde265_SSIM(
    const uint8_t* a, int stride_a, const uint8_t* b, int stride_b, int w, int h) {
  return tde265::compute_ssim(a, stride_a, b, stride_b, w, h);
}
}
