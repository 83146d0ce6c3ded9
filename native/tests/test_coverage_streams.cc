// Decoder coverage via encoder-generated streams: different CTB geometries
// exercise distinct quadtree/boundary paths; de265_reset() exercises the
// seek/restart machinery.
#include <cmath>
#include <vector>

#include "tde265/decoder.h"
#include "tde265/encoder.h"
#include "test_harness.h"

using namespace tde265;

namespace {

std::vector<u8> test_frame(int W, int H, std::vector<u8>& cb,
                           std::vector<u8>& cr) {
  std::vector<u8> y(W * H);
  for (int yy = 0; yy < H; yy++)
    for (int xx = 0; xx < W; xx++)
      y[yy * W + xx] = (u8)(128 + 60 * std::sin(xx * 0.11) * std::cos(yy * 0.07));
  cb.assign(W * H / 4, 100);
  cr.assign(W * H / 4, 150);
  return y;
}

int decode_and_compare(const std::vector<u8>& bits, const Frame& expect) {
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
  if (!df) return -1;
  int diffs = 0;
  for (int c = 0; c < 3; c++)
    for (int yy = 0; yy < df->plane_height(c); yy++)
      for (int xx = 0; xx < df->plane_width(c); xx++)
        if (*df->px8(c, xx, yy) != *expect.px8(c, xx, yy)) diffs++;
  return diffs;
}

}  // namespace

TDE_TEST(ctb_size_coverage) {
  // 16/32/64 CTBs, including a non-CTB-aligned picture (forced splits)
  for (int ctb_log2 : {4, 5, 6}) {
    int W = 88, H = 72;  // multiples of 8 only
    std::vector<u8> cb, cr;
    auto y = test_frame(W, H, cb, cr);
    EncoderConfig cfg;
    cfg.width = W;
    cfg.height = H;
    cfg.qp = 30;
    cfg.ctb_log2 = ctb_log2;
    Encoder enc(cfg);
    auto bits = enc.encode_frame(y.data(), W, cb.data(), cr.data(), W / 2);
    TDE_CHECK(bits.size() > 50);
    int diffs = decode_and_compare(bits, enc.recon());
    TDE_CHECK_EQ(diffs, 0);
  }
}

TDE_TEST(decoder_reset_seek) {
  int W = 64, H = 64;
  std::vector<u8> cb, cr;
  auto y = test_frame(W, H, cb, cr);
  EncoderConfig cfg;
  cfg.width = W;
  cfg.height = H;
  cfg.qp = 32;
  Encoder enc(cfg);
  std::vector<u8> stream;
  for (int i = 0; i < 2; i++) {
    auto bits = enc.encode_frame(y.data(), W, cb.data(), cr.data(), W / 2);
    stream.insert(stream.end(), bits.begin(), bits.end());
  }

  Decoder dec;
  dec.push_data(stream.data(), stream.size() / 3);  // partial push
  int more = 1;
  for (int i = 0; i < 5 && more; i++) {
    more = 0;
    dec.decode(&more);
  }
  // seek: reset, then decode the whole stream from an IRAP
  dec.reset();
  dec.push_data(stream.data(), stream.size());
  dec.flush_data();
  int frames = 0;
  more = 1;
  while (more) {
    more = 0;
    dec.decode(&more);
    while (dec.peek_next_picture()) {
      frames++;
      dec.release_next_picture();
    }
  }
  TDE_CHECK_EQ(frames, 2);
}
