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

TDE_TEST(scaling_list_roundtrip) {
  // default scaling lists signalled in the SPS: the decoder's scaling-list
  // dequant path must reproduce the encoder recon exactly
  int W = 64, H = 64;
  std::vector<u8> cb, cr;
  auto y = test_frame(W, H, cb, cr);
  EncoderConfig cfg;
  cfg.width = W;
  cfg.height = H;
  cfg.qp = 30;
  cfg.scaling_lists = true;
  Encoder enc(cfg);
  auto bits = enc.encode_frame(y.data(), W, cb.data(), cr.data(), W / 2);
  TDE_CHECK(bits.size() > 50);
  int diffs = decode_and_compare(bits, enc.recon());
  TDE_CHECK_EQ(diffs, 0);
}

TDE_TEST(inter_gop_roundtrip) {
  // low-delay P GOP: IDR + P frames with merge/skip/AMVP CUs; the decoder
  // must reproduce every encoder reconstruction exactly
  int W = 96, H = 80;
  EncoderConfig cfg;
  cfg.width = W;
  cfg.height = H;
  cfg.qp = 30;
  cfg.intra_period = 8;
  Encoder enc(cfg);

  std::vector<u8> stream;
  std::vector<std::vector<u8>> recons[3];
  const int kFrames = 6;
  for (int fno = 0; fno < kFrames; fno++) {
    // translating + slowly changing pattern (exercises motion search)
    std::vector<u8> y(W * H), cb(W * H / 4), cr(W * H / 4);
    for (int yy = 0; yy < H; yy++)
      for (int xx = 0; xx < W; xx++)
        y[yy * W + xx] = (u8)(128 + 60 * std::sin((xx + 2 * fno) * 0.11) *
                                        std::cos((yy + fno) * 0.07));
    for (int i = 0; i < W * H / 4; i++) {
      cb[i] = (u8)(100 + fno);
      cr[i] = (u8)(150 - fno);
    }
    auto bits = enc.encode_frame(y.data(), W, cb.data(), cr.data(), W / 2);
    stream.insert(stream.end(), bits.begin(), bits.end());
    for (int c = 0; c < 3; c++) recons[c].push_back(enc.recon().plane[c]);
  }

  Decoder dec;
  dec.push_data(stream.data(), stream.size());
  dec.flush_data();
  int n_out = 0, diffs = 0, more = 1;
  while (more) {
    more = 0;
    dec.decode(&more);
    Frame* df;
    while ((df = dec.peek_next_picture()) != nullptr) {
      for (int c = 0; c < 3; c++)
        if (df->plane[c] != recons[c][n_out]) diffs++;
      n_out++;
      dec.release_next_picture();
    }
  }
  TDE_CHECK_EQ(n_out, kFrames);
  TDE_CHECK_EQ(diffs, 0);
}

TDE_TEST(wpp_roundtrip) {
  // WPP: one substream per CTB row, context inheritance from CTB 1 of the
  // row above, entry-point offsets
  int W = 128, H = 96;
  std::vector<u8> cb, cr;
  auto y = test_frame(W, H, cb, cr);
  EncoderConfig cfg;
  cfg.width = W;
  cfg.height = H;
  cfg.qp = 30;
  cfg.ctb_log2 = 5;
  cfg.wpp = true;
  Encoder enc(cfg);
  auto bits = enc.encode_frame(y.data(), W, cb.data(), cr.data(), W / 2);
  TDE_CHECK(bits.size() > 50);
  int diffs = decode_and_compare(bits, enc.recon());
  TDE_CHECK_EQ(diffs, 0);
}

TDE_TEST(tiles_roundtrip) {
  int W = 128, H = 96;
  std::vector<u8> cb, cr;
  auto y = test_frame(W, H, cb, cr);
  for (auto [tc, tr] : {std::pair{2, 2}, std::pair{3, 1}, std::pair{1, 3}}) {
    EncoderConfig cfg;
    cfg.width = W;
    cfg.height = H;
    cfg.qp = 30;
    cfg.ctb_log2 = 5;
    cfg.tile_cols = tc;
    cfg.tile_rows = tr;
    Encoder enc(cfg);
    auto bits = enc.encode_frame(y.data(), W, cb.data(), cr.data(), W / 2);
    TDE_CHECK(bits.size() > 50);
    int diffs = decode_and_compare(bits, enc.recon());
    TDE_CHECK_EQ(diffs, 0);
  }
}

TDE_TEST(multi_slice_roundtrip) {
  // several slices per picture: exercises slice_segment_address parsing,
  // per-slice CABAC restarts and in-picture availability boundaries
  int W = 96, H = 96;
  std::vector<u8> cb, cr;
  auto y = test_frame(W, H, cb, cr);
  for (int per_slice : {1, 3, 5}) {
    EncoderConfig cfg;
    cfg.width = W;
    cfg.height = H;
    cfg.qp = 30;
    cfg.ctbs_per_slice = per_slice;
    Encoder enc(cfg);
    auto bits = enc.encode_frame(y.data(), W, cb.data(), cr.data(), W / 2);
    TDE_CHECK(bits.size() > 50);
    int diffs = decode_and_compare(bits, enc.recon());
    TDE_CHECK_EQ(diffs, 0);
  }
}

TDE_TEST(main10_roundtrip) {
  // 10-bit encode -> our decoder's 16-bit path must match the encoder recon
  int W = 64, H = 48;
  std::vector<u16> y(W * H), cb(W * H / 4, 400), cr(W * H / 4, 600);
  for (int yy = 0; yy < H; yy++)
    for (int xx = 0; xx < W; xx++)
      y[yy * W + xx] =
          (u16)clip3(0, 1023,
                     512 + (int)(250 * std::sin(xx * 0.13) * std::cos(yy * 0.09)));
  EncoderConfig cfg;
  cfg.width = W;
  cfg.height = H;
  cfg.qp = 27;
  cfg.bit_depth = 10;
  Encoder enc(cfg);
  auto bits = enc.encode_frame16(y.data(), W, cb.data(), cr.data(), W / 2);
  TDE_CHECK(bits.size() > 50);

  Decoder dec;
  dec.disable_deblocking = true;  // recon() is the pre-deblock picture
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
  TDE_CHECK_EQ(df->bytes_pp, 2);
  TDE_CHECK_EQ(df->bit_depth[0], 10);
  const Frame& expect = enc.recon();
  int diffs = 0;
  for (int c = 0; c < 3; c++)
    for (int yy = 0; yy < df->plane_height(c); yy++)
      for (int xx = 0; xx < df->plane_width(c); xx++)
        if (*df->px16(c, xx, yy) != *expect.px16(c, xx, yy)) diffs++;
  TDE_CHECK_EQ(diffs, 0);
  // psnr sanity: recon should actually track the 10-bit source
  double ssd = 0;
  for (int i = 0; i < W * H; i++) {
    double d = (double)y[i] - *expect.px16(0, i % W, i / W);
    ssd += d * d;
  }
  double mse = ssd / (W * H);
  TDE_CHECK(mse < 100.0);  // ~38 dB at 10-bit scale
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

TDE_TEST(wpp_multislice_midrow_fallback) {
  // A conformant picture whose FIRST slice touches every CTB row but ends
  // mid-row: its entry-point count equals ctb_h, so the parallel-WPP gate
  // in SliceParser::decode() fires, the last row worker hits
  // end_of_slice_segment_flag before the picture's last CTB, and the
  // parser must fall back to the sequential loop (not report
  // InvalidSyntax).  Advisor finding r4 #1.  4x3 CTBs at CTB 16; slice 1 =
  // CTBs 0..8 (ends mid-row-2), slice 2 = CTBs 9..11.
  int W = 64, H = 48;
  std::vector<u8> cb, cr;
  auto y = test_frame(W, H, cb, cr);
  EncoderConfig cfg;
  cfg.width = W;
  cfg.height = H;
  cfg.qp = 30;
  cfg.ctb_log2 = 4;
  cfg.wpp = true;
  cfg.ctbs_per_slice = 9;
  Encoder enc(cfg);
  auto bits = enc.encode_frame(y.data(), W, cb.data(), cr.data(), W / 2);
  TDE_CHECK(bits.size() > 50);

  // multithreaded decode must take the parallel gate, fail, fall back, and
  // still produce the exact reconstruction
  for (int threads : {0, 4}) {
    Decoder dec;
    dec.disable_deblocking = true;
    if (threads) dec.start_worker_threads(threads);
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
    int diffs = 0;
    for (int c = 0; c < 3; c++)
      for (int yy = 0; yy < df->plane_height(c); yy++)
        for (int xx = 0; xx < df->plane_width(c); xx++)
          if (*df->px8(c, xx, yy) != *enc.recon().px8(c, xx, yy)) diffs++;
    TDE_CHECK_EQ(diffs, 0);
  }
}
