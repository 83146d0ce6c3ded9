/* Compat shim: reference-signature quality metrics (reference
   libde265/quality.h:29-41) implemented over tde265's exported
   tde265_* metrics, so the reference dec265.cc compiles unmodified. */
#ifndef TDE265_COMPAT_QUALITY_H
#define TDE265_COMPAT_QUALITY_H

#include <stdint.h>
#include <math.h>

extern "C" {
uint64_t tde265_SSD(const uint8_t* a, int astride, const uint8_t* b,
                    int bstride, int width, int height);
double tde265_MSE(const uint8_t* a, int astride, const uint8_t* b, int bstride,
                  int width, int height);
double tde265_PSNR(double mse);
}

inline uint32_t SSD(const uint8_t* img, int imgStride, const uint8_t* ref,
                    int refStride, int width, int height) {
  return (uint32_t)tde265_SSD(img, imgStride, ref, refStride, width, height);
}

inline double MSE(const uint8_t* img, int imgStride, const uint8_t* ref,
                  int refStride, int width, int height) {
  return tde265_MSE(img, imgStride, ref, refStride, width, height);
}

inline double PSNR(double mse) { return tde265_PSNR(mse); }

#endif
