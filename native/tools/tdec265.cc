// tdec265 — reference CLI decoder (counterpart of /root/reference/dec265).
// Usage: tdec265 [-o out.yuv] [-c] [-q] [-t N] [-m ref.yuv] [-f N] input.h265
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "tde265/decoder.h"
#include "tde265/image_io.h"

namespace tde265 {
double compute_psnr(const u8* a, int stride_a, const u8* b, int stride_b,
                    int w, int h);
double compute_ssim(const u8* a, int stride_a, const u8* b, int stride_b,
                    int w, int h);
}

using namespace tde265;

int main(int argc, char** argv) {
  const char* out_path = nullptr;
  const char* in_path = nullptr;
  bool check_hash = false;
  bool quiet = false;
  int max_frames = -1;
  bool no_deblock = false, no_sao = false;
  bool dump_motion = false;
  bool nal_input = false;  // -n: 4-byte length-prefixed NAL units
  int n_threads = 0;
  const char* measure_path = nullptr;  // -m: PSNR/SSIM vs reference YUV

  for (int i = 1; i < argc; i++) {
    if (!strcmp(argv[i], "-o") && i + 1 < argc) {
      out_path = argv[++i];
    } else if (!strcmp(argv[i], "-c")) {
      check_hash = true;
    } else if (!strcmp(argv[i], "-q")) {
      quiet = true;
    } else if (!strcmp(argv[i], "-f") && i + 1 < argc) {
      max_frames = atoi(argv[++i]);
    } else if (!strcmp(argv[i], "-t") && i + 1 < argc) {
      n_threads = atoi(argv[++i]);
    } else if (!strcmp(argv[i], "--no-deblock")) {
      no_deblock = true;
    } else if (!strcmp(argv[i], "--no-sao")) {
      no_sao = true;
    } else if (!strcmp(argv[i], "-n")) {
      nal_input = true;
    } else if (!strcmp(argv[i], "--dump-motion")) {
      dump_motion = true;
    } else if (!strcmp(argv[i], "-m") && i + 1 < argc) {
      measure_path = argv[++i];
    } else {
      in_path = argv[i];
    }
  }
  if (!in_path) {
    fprintf(stderr,
            "usage: tdec265 [-o out.yuv] [-c] [-q] [-n] [-f N] input.h265\n");
    return 1;
  }

  FILE* fin = fopen(in_path, "rb");
  if (!fin) {
    fprintf(stderr, "cannot open %s\n", in_path);
    return 1;
  }
  FILE* fout = out_path ? fopen(out_path, "wb") : nullptr;
  ImageSourceYuv measure_src;
  bool measuring = false;
  double psnr_sum = 0, ssim_sum = 0;
  int measured = 0;

  Decoder dec;
  dec.check_sei_hash = check_hash;
  dec.disable_deblocking = no_deblock;
  dec.disable_sao = no_sao;
  if (n_threads > 0 && !dump_motion) dec.start_worker_threads(n_threads);

  auto t0 = std::chrono::steady_clock::now();

  if (nal_input) {
    // length-prefixed NAL units (counterpart of dec265 -n)
    u8 len_buf[4];
    std::vector<u8> nal_buf;
    while (fread(len_buf, 1, 4, fin) == 4) {
      u32 len = ((u32)len_buf[0] << 24) | ((u32)len_buf[1] << 16) |
                ((u32)len_buf[2] << 8) | len_buf[3];
      if (len == 0 || len > (64u << 20)) break;
      nal_buf.resize(len);
      if (fread(nal_buf.data(), 1, len, fin) != len) break;
      dec.push_nal(nal_buf.data(), len);
    }
  } else {
    u8 buf[65536];
    size_t n;
    while ((n = fread(buf, 1, sizeof(buf), fin)) > 0) {
      dec.push_data(buf, n);
    }
  }
  fclose(fin);
  dec.flush_data();

  int n_frames = 0;
  int more = 1;
  bool hash_fail = false;
  while (more) {
    more = 0;
    Err e = dec.decode(&more);
    if (e == Err::ChecksumMismatch) hash_fail = true;
    if (e != Err::OK && e != Err::WaitingForInput && e != Err::ChecksumMismatch) {
      if (!quiet) fprintf(stderr, "decode error %d\n", (int)e);
    }
    // keep a few pictures queued in pipelined mode so parsing runs ahead of
    // the pixel worker instead of blocking on each picture's completion
    if (n_threads > 0 && dec.pending_nal_units() > 0 &&
        dec.output_queue_length() < 4)
      continue;
    while (Frame* f = dec.peek_next_picture()) {
      if (dump_motion) {
        printf("PIC poc=%d\n", f->poc);
        for (int y = 0; y < f->height; y += 4)
          for (int x = 0; x < f->width; x += 4) {
            const PbMotion& m = f->pb_at(x, y);
            if (m.intra) {
              printf("%d,%d I\n", x, y);
              continue;
            }
            printf("%d,%d f%d", x, y, m.pred_flags);
            for (int l = 0; l < 2; l++)
              if ((m.pred_flags >> l) & 1)
                printf(" L%d r%d (%d,%d)", l, m.ref_idx[l], m.mv[l].x, m.mv[l].y);
            printf("\n");
          }
      }
      // conformance-window cropped output
      const Sps& sps = *f->sps;
      int sx = sps.sub_width_c, sy = sps.sub_height_c;
      int cl = sps.conf_win_left * sx, cr = sps.conf_win_right * sx;
      int ct = sps.conf_win_top * sy, cb = sps.conf_win_bottom * sy;
      int ow = f->width - cl - cr;
      int oh = f->height - ct - cb;
      if (fout) {
        for (int y = 0; y < oh; y++)
          fwrite(f->plane_ptr(0) + ((size_t)(y + ct) * f->stride[0] + cl) * f->bytes_pp,
                 f->bytes_pp, ow, fout);
        if (f->chroma_format != 0) {
          int cow = ow / sx, coh = oh / sy;
          int ccl = sps.conf_win_left, cct = sps.conf_win_top;
          for (int c = 1; c <= 2; c++)
            for (int y = 0; y < coh; y++)
              fwrite(f->plane_ptr(c) +
                         ((size_t)(y + cct) * f->stride[c] + ccl) * f->bytes_pp,
                     f->bytes_pp, cow, fout);
        }
      }
      if (measure_path) {
        if (!measuring) {
          measuring = measure_src.open(measure_path, ow, oh);
        }
        RawImage ref_img;
        if (measuring && measure_src.read(&ref_img)) {
          const u8* dy = f->plane_ptr(0) +
                         ((size_t)ct * f->stride[0] + cl) * f->bytes_pp;
          double p = compute_psnr(ref_img.y.data(), ow, dy, f->stride[0], ow, oh);
          double s = compute_ssim(ref_img.y.data(), ow, dy, f->stride[0], ow, oh);
          psnr_sum += p;
          ssim_sum += s;
          measured++;
          if (!quiet) fprintf(stderr, "frame %d: PSNR %.2f dB SSIM %.4f\n",
                              n_frames, p, s);
        }
      }
      n_frames++;
      dec.release_next_picture();
      if (max_frames > 0 && n_frames >= max_frames) { more = 0; break; }
    }
    if (max_frames > 0 && n_frames >= max_frames) break;
  }

  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();

  Warning w;
  while ((w = dec.get_warning()) != Warning::None) {
    if (!quiet) fprintf(stderr, "warning: %d\n", (int)w);
  }

  if (fout) fclose(fout);
  if (measured > 0)
    fprintf(stderr, "average: PSNR %.2f dB SSIM %.4f (%d frames)\n",
            psnr_sum / measured, ssim_sum / measured, measured);
  if (!quiet)
    fprintf(stderr, "nFrames decoded: %d (%.2f fps)\n", n_frames,
            n_frames / secs);
  if (hash_fail) {
    fprintf(stderr, "SEI picture hash MISMATCH\n");
    return 2;
  }
  return 0;
}
