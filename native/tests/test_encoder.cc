// Encoder round-trip tests: encode synthetic frames, decode with our own
// decoder, require bit-identical reconstruction (the encoder reuses the
// decoder's kernels, so any mismatch is a syntax-writer bug) and sane PSNR.
#include <cmath>
#include <vector>

#include "tde265/decoder.h"
#include "tde265/encoder.h"
#include "test_harness.h"

using namespace tde265;

namespace {

void fill_test_pattern(std::vector<u8>& y, std::vector<u8>& cb,
                       std::vector<u8>& cr, int W, int H, int seed) {
  y.resize(W * H);
  cb.resize(W * H / 4);
  cr.resize(W * H / 4);
  u32 s = (u32)seed * 2654435761u + 1;
  for (int yy = 0; yy < H; yy++)
    for (int xx = 0; xx < W; xx++) {
      s = s * 1103515245 + 12345;
      y[yy * W + xx] =
          (u8)(xx * 2 + yy + ((xx / 8 + yy / 8) & 1) * 30 + ((s >> 20) & 15));
    }
  for (int yy = 0; yy < H / 2; yy++)
    for (int xx = 0; xx < W / 2; xx++) {
      cb[yy * W / 2 + xx] = (u8)(120 + xx / 2);
      cr[yy * W / 2 + xx] = (u8)(130 - yy / 2);
    }
}

}  // namespace

TDE_TEST(encoder_decoder_roundtrip) {
  for (int qp : {22, 27, 32, 40}) {
    int W = 96, H = 64;  // non-square, multiple of 8 only (tests forced splits)
    std::vector<u8> y, cb, cr;
    fill_test_pattern(y, cb, cr, W, H, qp);

    EncoderConfig cfg;
    cfg.width = W;
    cfg.height = H;
    cfg.qp = qp;
    Encoder enc(cfg);
    auto bits = enc.encode_frame(y.data(), W, cb.data(), cr.data(), W / 2);
    TDE_CHECK(bits.size() > 100);

    Decoder dec;
    dec.disable_deblocking = true;
    dec.push_data(bits.data(), bits.size());
    dec.flush_data();
    int more = 1;
    Frame* df = nullptr;
    while (more) {
      more = 0;
      dec.decode(&more);
      if ((df = dec.peek_next_picture()) != nullptr) break;
    }
    TDE_CHECK(df != nullptr);
    if (!df) continue;

    const Frame& er = enc.recon();
    int diffs = 0;
    for (int c = 0; c < 3; c++) {
      int w = df->plane_width(c), h = df->plane_height(c);
      for (int yy = 0; yy < h; yy++)
        for (int xx = 0; xx < w; xx++)
          if (*df->px8(c, xx, yy) != *er.px8(c, xx, yy)) diffs++;
    }
    TDE_CHECK_EQ(diffs, 0);

    double mse = 0;
    for (int yy = 0; yy < H; yy++)
      for (int xx = 0; xx < W; xx++) {
        int d = y[yy * W + xx] - *df->px8(0, xx, yy);
        mse += d * d;
      }
    mse /= W * H;
    double psnr = 10 * std::log10(255.0 * 255.0 / mse);
    TDE_CHECK(psnr > (qp <= 27 ? 30.0 : 22.0));
  }
}

TDE_TEST(encoder_multiframe) {
  int W = 64, H = 64;
  std::vector<u8> y, cb, cr;
  fill_test_pattern(y, cb, cr, W, H, 3);
  EncoderConfig cfg;
  cfg.width = W;
  cfg.height = H;
  cfg.qp = 30;
  Encoder enc(cfg);
  std::vector<u8> stream;
  for (int f = 0; f < 3; f++) {
    auto bits = enc.encode_frame(y.data(), W, cb.data(), cr.data(), W / 2);
    stream.insert(stream.end(), bits.begin(), bits.end());
  }
  Decoder dec;
  dec.push_data(stream.data(), stream.size());
  dec.flush_data();
  int more = 1, n = 0;
  while (more) {
    more = 0;
    dec.decode(&more);
    while (dec.peek_next_picture()) {
      n++;
      dec.release_next_picture();
    }
  }
  TDE_CHECK_EQ(n, 3);
}
