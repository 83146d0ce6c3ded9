// tenc265 — CLI encoder (counterpart of /root/reference/enc265/enc265.cc):
// raw YUV 4:2:0 in, Annex-B HEVC out, via the en265 C API.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "tde265/en265.h"

int main(int argc, char** argv) {
  const char* in_path = nullptr;
  const char* out_path = "out.h265";
  int width = 0, height = 0, qp = 27, max_frames = -1, bit_depth = 8;
  int intra_period = 0, tile_cols = 1, wpp = 0;

  for (int i = 1; i < argc; i++) {
    if (!strcmp(argv[i], "-o") && i + 1 < argc) out_path = argv[++i];
    else if (!strcmp(argv[i], "-w") && i + 1 < argc) width = atoi(argv[++i]);
    else if (!strcmp(argv[i], "-h") && i + 1 < argc) height = atoi(argv[++i]);
    else if (!strcmp(argv[i], "-q") && i + 1 < argc) qp = atoi(argv[++i]);
    else if (!strcmp(argv[i], "-f") && i + 1 < argc) max_frames = atoi(argv[++i]);
    else if (!strcmp(argv[i], "-b") && i + 1 < argc) bit_depth = atoi(argv[++i]);
    else if (!strcmp(argv[i], "-g") && i + 1 < argc) intra_period = atoi(argv[++i]);
    else if (!strcmp(argv[i], "-T") && i + 1 < argc) tile_cols = atoi(argv[++i]);
    else if (!strcmp(argv[i], "--wpp")) wpp = 1;
    else if (argv[i][0] == '-' && argv[i][1]) {
      // unknown options are fatal, not silently skipped — a typo'd flag
      // must not produce a differently-configured stream
      fprintf(stderr, "unknown option: %s\n", argv[i]);
      return 1;
    }
    else in_path = argv[i];
  }
  if (!in_path || !width || !height) {
    fprintf(stderr,
            "usage: tenc265 -w W -h H [-q qp] [-b 8|10] [-g gop] [-T tile-cols] [--wpp] [-f frames] [-o out.h265] in.yuv\n");
    return 1;
  }

  FILE* fin = fopen(in_path, "rb");
  if (!fin) { fprintf(stderr, "cannot open %s\n", in_path); return 1; }
  FILE* fout = fopen(out_path, "wb");

  en265_encoder_context* ctx = en265_new_encoder();
  en265_set_parameter_int(ctx, "qp", qp);
  en265_set_parameter_int(ctx, "bit-depth", bit_depth);
  if (intra_period > 0) en265_set_parameter_int(ctx, "intra-period", intra_period);
  if (tile_cols > 1) en265_set_parameter_int(ctx, "tile-cols", tile_cols);
  if (wpp) en265_set_parameter_bool(ctx, "wpp", 1);
  en265_start_encoder(ctx, 0);

  // 10-bit input is little-endian 16-bit samples (2 bytes per sample)
  size_t bpp = bit_depth > 8 ? 2 : 1;
  size_t frame_size = (size_t)width * height * 3 / 2 * bpp;
  std::vector<uint8_t> buf(frame_size);
  int n = 0;
  while (fread(buf.data(), 1, frame_size, fin) == frame_size) {
    en265_image* img = en265_allocate_image(ctx, width, height,
                                            de265_chroma_420, n, nullptr);
    int stride;
    uint8_t* y = en265_get_image_plane(img, 0, &stride);
    memcpy(y, buf.data(), (size_t)width * height * bpp);
    uint8_t* cb = en265_get_image_plane(img, 1, &stride);
    memcpy(cb, buf.data() + (size_t)width * height * bpp,
           (size_t)width * height / 4 * bpp);
    uint8_t* cr = en265_get_image_plane(img, 2, &stride);
    memcpy(cr, buf.data() + (size_t)width * height * 5 / 4 * bpp,
           (size_t)width * height / 4 * bpp);
    en265_push_image(ctx, img);
    en265_encode(ctx);
    const en265_packet* pkt;
    while ((pkt = en265_get_packet(ctx, 0)) != nullptr) {
      fwrite(pkt->data, 1, pkt->length, fout);
      en265_free_packet(ctx, pkt);
    }
    n++;
    if (max_frames > 0 && n >= max_frames) break;
  }
  en265_push_eof(ctx);
  fclose(fin);
  fclose(fout);
  fprintf(stderr, "encoded %d frames -> %s\n", n, out_path);
  en265_free_encoder(ctx);
  return 0;
}
